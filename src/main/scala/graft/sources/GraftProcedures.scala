package graft.sources

import graft.ops.{Layout, Manifest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** SQL `CALL` surface for the engine's table-maintenance jobs — the
  * Iceberg/Delta "stored procedure" posture on this table format, so the
  * recurring layout work a 100 TB deployment schedules (compaction,
  * re-clustering, history expiry) is reachable from an engine-executed
  * statement, not only the Scala API (the same public-surface axis as the
  * DML statements — the reference drives ALL its maintenance through
  * executed statements, TableConnection.php:289-360):
  *
  * {{{
  * CALL graft.system.compact('/data/docs', 128)        -- ≈128 MB files
  * CALL graft.system.zorder('/data/docs', 'a,b', 16)
  * CALL graft.system.cluster_range('/data/docs', 'k', 16)
  * CALL graft.system.restore('/data/docs', 3)          -- roll back to snapshot 3
  * CALL graft.system.expire_snapshots('/data/docs', 3) -- keep newest 3
  * CALL graft.system.vacuum('/data/docs')              -- drop expired trash
  * }}}
  *
  * Each procedure is a thin binding onto the already-journaled engine job
  * (table lock, crash heal, manifest refresh, history retention all live
  * THERE — nothing is re-implemented on this surface), and returns its
  * outcome as a one-row result set ([[LocalScan]]). Argument validation
  * beyond typing (positive sizes, existing columns) is the engine's own.
  */
object GraftProcedures {

  /** One procedure: unbound == bound (the signatures here are static — no
    * overloads, nothing type-dependent to specialize at bind time).
    */
  private abstract class Proc(procName: String,
                              params: (String, DataType)*)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String =
      s"graft table-maintenance procedure `$procName`"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      params.map { case (n, t) => ProcedureParameter.in(n, t).build() }.toArray
    override def isDeterministic: Boolean = false // mutates the table dir

    def call(input: InternalRow): java.util.Iterator[Scan]

    /** The one-row outcome result set. */
    protected def outcome(col: String, value: Long): java.util.Iterator[Scan] = {
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(new GenericInternalRow(Array[Any](value)))
        override def readSchema(): StructType =
          StructType(Seq(StructField(col, LongType, nullable = false)))
      }
      java.util.Collections.singletonList(scan).iterator()
    }

    protected def spark: SparkSession = SparkSession.active

    /** Post-job ACTUAL data-file count — procedures report outcomes, not
      * their arguments echoed back.
      */
    protected def actualDataFiles(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      graft.ops.FsMaint.dataFileCount(
        p.getFileSystem(spark.sessionState.newHadoopConf()), p)
    }

    /** A whole-table rewrite of a hive-partitioned table FLATTENS its
      * layout (a documented Scala-API contract) — refused on the
      * statement surface: a `CALL` user must not lose partition pruning
      * two keystrokes from `compact`.
      */
    protected def refuseFlatten(path: String, proc: String): Unit =
      if (Layout.wouldFlatten(spark, path))
        throw new IllegalArgumentException(
          s"CALL graft.system.$proc('$path'): the table is hive-" +
            "partitioned and a whole-table rewrite would FLATTEN its " +
            "layout — use graft.system.compact_partition per partition, " +
            "or the Scala API if the flatten is deliberate")

    protected def stringArg(input: InternalRow, i: Int): String = {
      require(!input.isNullAt(i), s"$procName: argument ${params(i)._1} is NULL")
      input.getUTF8String(i).toString
    }
    protected def intArg(input: InternalRow, i: Int): Int = {
      require(!input.isNullAt(i), s"$procName: argument ${params(i)._1} is NULL")
      input.getInt(i)
    }
  }

  private val all: Map[String, Proc] = Seq[Proc](

    new Proc("compact", "path" -> StringType, "target_mb" -> IntegerType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val path = stringArg(input, 0)
        refuseFlatten(path, "compact")
        outcome("files_written", Layout.compactTable(spark,
          path, intArg(input, 1).toLong << 20).toLong)
      }
    },

    new Proc("zorder", "path" -> StringType, "cols" -> StringType,
             "n_files" -> IntegerType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val path = stringArg(input, 0)
        refuseFlatten(path, "zorder")
        val cols = stringArg(input, 1).split(',').map(_.trim).toSeq
        Layout.clusterByZOrderN(spark, path, cols, intArg(input, 2))
        outcome("files_written", actualDataFiles(path))
      }
    },

    new Proc("cluster_range", "path" -> StringType, "cluster_col" -> StringType,
             "n_files" -> IntegerType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val path = stringArg(input, 0)
        refuseFlatten(path, "cluster_range")
        Layout.clusterByRange(spark, path, stringArg(input, 1),
          intArg(input, 2))
        outcome("files_written", actualDataFiles(path))
      }
    },

    new Proc("compact_partition", "path" -> StringType,
             "part_col" -> StringType, "value" -> StringType,
             "target_mb" -> IntegerType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("files_written", Layout.compactPartition(spark,
          stringArg(input, 0), stringArg(input, 1), stringArg(input, 2),
          intArg(input, 3).toLong << 20).toLong)
    },

    new Proc("compact_deletes", "path" -> StringType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("files_folded",
          Layout.compactDeletes(spark, stringArg(input, 0)).toLong)
    },

    new Proc("restore", "path" -> StringType, "snapshot_id" -> IntegerType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("files_changed", {
          // Restore rolls back the tree you are on — complete any pending
          // metadata-only checkout first (restore itself must NOT, it is
          // the branch transitions' own subroutine).
          Layout.ensureMaterialized(spark, stringArg(input, 0))
          val r = Layout.restoreSnapshot(spark, stringArg(input, 0),
            intArg(input, 1))
          (r.revived + r.retired).toLong
        })
    },

    new Proc("expire_snapshots", "path" -> StringType, "keep" -> IntegerType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("snapshots_expired", Manifest.expireSnapshots(spark,
          stringArg(input, 0), intArg(input, 1)).toLong)
    },

    new Proc("vacuum", "path" -> StringType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("files_removed",
          Manifest.vacuum(spark, stringArg(input, 0)).toLong)
    },

    new Proc("tag", "path" -> StringType, "name" -> StringType,
             "snapshot_id" -> IntegerType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        Manifest.tag(spark, stringArg(input, 0), stringArg(input, 1),
          intArg(input, 2))
        outcome("tagged_snapshot", intArg(input, 2).toLong)
      }
    },

    new Proc("drop_tag", "path" -> StringType, "name" -> StringType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("existed",
          if (Manifest.dropTag(spark, stringArg(input, 0),
            stringArg(input, 1))) 1L else 0L)
    },

    // Branch lifecycle (N refs, one checked out — Manifest's branch
    // section): create_branch forks at the latest snapshot and checks the
    // branch out (the previous holder pins its head); checkout_branch
    // switches the served ref METADATA-ONLY (one ref-current pointer
    // write; the physical tree materializes lazily at the first write, or
    // explicitly via materialize_checkout);
    // fast_forward merges the checked-out branch into main metadata-only;
    // abandon_branch discards a branch (restoring main's head first when
    // the branch holds the tree).
    new Proc("create_branch", "path" -> StringType, "name" -> StringType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("forked_at", {
          // A fork point is the tree you are on: complete any pending
          // metadata-only checkout physically first.
          Layout.ensureMaterialized(spark, stringArg(input, 0))
          Manifest.createBranch(spark,
            stringArg(input, 0), stringArg(input, 1)).toLong
        })
    },

    new Proc("checkout_branch", "path" -> StringType, "name" -> StringType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("head_at", Layout.checkoutBranch(spark,
          stringArg(input, 0), stringArg(input, 1)).toLong)
    },

    // Complete a pending metadata-only checkout PHYSICALLY (COW restore) —
    // the explicit raw-parquet-compatibility escape hatch; writes trigger
    // the same transition lazily on their own.
    new Proc("materialize_checkout", "path" -> StringType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("head_at", {
          Layout.ensureMaterialized(spark, stringArg(input, 0))
          Manifest.latestSnapshotId(spark, stringArg(input, 0))
            .getOrElse(0).toLong
        })
    },

    // Stats evolution: add min/max/count stats for more columns to an
    // existing manifest (comma-separated list) — one narrow scan + one
    // metadata commit; range predicates on the new columns then prune
    // files and keyed mutations may target on them (Manifest.restat).
    new Proc("restat", "path" -> StringType, "columns" -> StringType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("snapshot", {
          Layout.ensureMaterialized(spark, stringArg(input, 0))
          Manifest.restat(spark, stringArg(input, 0),
          stringArg(input, 1).split(',').map(_.trim).filter(_.nonEmpty)
            .toIndexedSeq: _*).toLong
        })
    },

    // The bloom half of stats evolution: per-file point-lookup sketches
    // for more columns (existing stats keys, or string columns where the
    // sketch is the only skipping signal).
    new Proc("restat_bloom", "path" -> StringType, "columns" -> StringType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("snapshot", {
          Layout.ensureMaterialized(spark, stringArg(input, 0))
          Manifest.restatBloom(spark, stringArg(input, 0),
            stringArg(input, 1).split(',').map(_.trim).filter(_.nonEmpty)
              .toIndexedSeq).toLong
        })
    },

    new Proc("fast_forward", "path" -> StringType, "name" -> StringType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("main_at", {
          // ff merges the tree you are on — materialize a pending
          // metadata-only checkout so the branch is PHYSICALLY held.
          Layout.ensureMaterialized(spark, stringArg(input, 0))
          Manifest.fastForward(spark,
            stringArg(input, 0), stringArg(input, 1)).toLong
        })
    },

    new Proc("abandon_branch", "path" -> StringType, "name" -> StringType) {
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        outcome("files_changed", {
          val r = Layout.abandonBranch(spark, stringArg(input, 0),
            stringArg(input, 1))
          (r.revived + r.retired).toLong
        })
    }
  ).map(p => p.name() -> p).toMap

  private val Namespace = Array("system")

  def load(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Namespace),
      s"graft procedures live in the `system` namespace " +
        s"(CALL graft.system.<proc>), got `${ident.namespace.mkString(".")}`")
    all.getOrElse(ident.name.toLowerCase(java.util.Locale.ROOT),
      throw new NoSuchElementException(
        s"no such procedure graft.system.${ident.name} — available: " +
          all.keys.toSeq.sorted.mkString(", ")))
  }

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Namespace))
      all.keys.toArray.sorted.map(Identifier.of(Namespace, _))
    else Array.empty
}
