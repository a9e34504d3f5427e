package graft.sync

import graft.functions.Hashing
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.matching.Regex

/** Engine configuration (reference `settings.php.tmpl`). */
final case class SyncConfig(
    /** Table-name regexes to leave untouched (P4, `settings.php.tmpl:48-53`). */
    ignoreTables: Seq[Regex] = Nil,
    /** Copy keyless tables wholesale vs skip (`settings.php.tmpl:42-45`,
      * `Synchronizer.php:213-222`). */
    copyTablesWithNoPrimary: Boolean = true,
    /** table → logical partition column (`settings.php.tmpl:55-61`). */
    partitionedTables: Map[String, String] = Map.empty,
    /** Also row-diff partitions present on both sides (`settings.php.tmpl:64-67`). */
    syncSharedPartitions: Boolean = true,
    /** table → key columns; tables absent here fall back to no-PK handling. */
    primaryKeys: Map[String, Seq[String]] = Map.empty,
    /** Reproduce the reference's NULL-skipping row hash (SURVEY P1 note). */
    legacyNullSkip: Boolean = false,
    /** Key-aware diff (correct duplicate handling) vs reference hash-match. */
    keyAwareDiff: Boolean = false,
    /** Plan but do not execute writes (audit-log S15 dry-run analog). */
    dryRun: Boolean = false,
    /** Cross-table driver concurrency (C6; reference: process pool = #cores,
      * `Synchronizer.php:73-92`). Spark parallelizes *within* jobs; this only
      * overlaps small-table jobs to keep the scheduler busy. */
    tableParallelism: Int = 4,
    /** Append every recorded action as a JSON line to this file (S15 — the
      * reference appends each write query to `LOG_QUERY_FILE`,
      * `TableConnection.php:730-742`). None = in-memory audit only. */
    auditLogPath: Option[String] = None)

/** Planned/executed actions — the engine's audit log (reference S15 logs every
  * write query, `TableConnection.php:730-742`; here the *plan* is first-class).
  */
sealed trait SyncAction { def table: String }
object SyncAction {
  final case class DropTable(table: String) extends SyncAction
  final case class CopyTable(table: String) extends SyncAction
  final case class Skip(table: String, reason: String) extends SyncAction
  final case class ApplyDelta(table: String, deleted: Long, inserted: Long) extends SyncAction
  final case class DropPartition(table: String, partCol: String, value: Any) extends SyncAction
  final case class CopyPartition(table: String, partCol: String, value: Any) extends SyncAction
}

/** Whole-database / per-table sync orchestration (reference C1-C10,
  * `Synchronizer.php`).
  *
  * The reference's single most important performance idea is the hierarchical
  * short-circuit (SURVEY §4): structure differs → full recopy; fingerprints
  * equal → done; only then pay for the row-level diff. That cascade is driver
  * control flow here; each stage is one or two Spark jobs whose plans are
  * narrow projections/aggregates that scale with partition count, not driver
  * memory.
  */
final class SyncEngine(master: TableStore, slave: TableStore,
                       config: SyncConfig = SyncConfig()) {
  import SyncAction._

  private val audit = mutable.ArrayBuffer.empty[SyncAction]
  def auditLog: Seq[SyncAction] = audit.synchronized(audit.toSeq)
  private def record(a: SyncAction): SyncAction = {
    audit.synchronized {
      audit += a
      config.auditLogPath.foreach { p =>
        val json = a match {
          case DropTable(t) => s"""{"action":"DropTable","table":"$t"}"""
          case CopyTable(t) => s"""{"action":"CopyTable","table":"$t"}"""
          case Skip(t, r) => s"""{"action":"Skip","table":"$t","reason":"$r"}"""
          case ApplyDelta(t, d, i) => s"""{"action":"ApplyDelta","table":"$t","deleted":$d,"inserted":$i}"""
          case DropPartition(t, c, v) => s"""{"action":"DropPartition","table":"$t","part_col":"$c","value":"$v"}"""
          case CopyPartition(t, c, v) => s"""{"action":"CopyPartition","table":"$t","part_col":"$c","value":"$v"}"""
        }
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n",
          java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      }
    }
    a
  }

  private def ignored(name: String): Boolean =
    config.ignoreTables.exists(r => r.pattern.matcher(name).matches())

  /** C1: whole-database sync (`Synchronizer.php:34-102`). */
  def syncDatabase(): Seq[SyncAction] = {
    val masterTables = master.list().filterNot(ignored)
    val slaveTables = slave.list().filterNot(ignored)
    val excess = slaveTables.diff(masterTables)
    val missing = masterTables.diff(slaveTables)
    val shared = masterTables.intersect(slaveTables)

    excess.foreach { t =>
      if (!config.dryRun) slave.drop(t)
      record(DropTable(t))
    }
    missing.foreach { t => copyTable(t) }

    // C6: overlap independent per-table jobs from the driver. Each job's
    // tasks already fan out across executors; this hides scheduling gaps of
    // many small tables. Per-table failures are recorded and tolerated —
    // one bad table must not kill the database sync (the reference wraps
    // every child command in `|| true`, Synchronizer.php:77).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, config.tableParallelism))
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futures = shared.map(t => Future(
        try syncTable(t)
        catch { case e: Exception => record(Skip(t, s"failed: ${e.getMessage}")) }))
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()
    auditLog
  }

  /** C2: per-table cascade (`Synchronizer.php:189-233`). */
  def syncTable(table: String): SyncAction = {
    val mSchema = master.schemaOf(table)
    val sSchema = slave.schemaOf(table)
    if (!SchemaCompare.sameStructure(mSchema, sSchema)) return copyTable(table)

    config.partitionedTables.get(table) match {
      case Some(partCol) => syncPartitionedTable(table, partCol)
      case None => syncUnpartitionedTable(table)
    }
  }

  private def keyColsOf(table: String): Option[Seq[String]] = config.primaryKeys.get(table)

  private def syncUnpartitionedTable(table: String): SyncAction = {
    val m = master.read(table)
    val s = slave.read(table)
    val cols = m.columns.toSeq
    // A1 short-circuit: one cheap aggregate per side before any row work.
    if (Hashing.tableFingerprint(m, cols, config.legacyNullSkip) ==
        Hashing.tableFingerprint(s, cols, config.legacyNullSkip))
      return record(Skip(table, "already in sync"))

    keyColsOf(table) match {
      case None =>
        if (config.copyTablesWithNoPrimary) copyTable(table)
        else record(Skip(table, "no primary key"))
      case Some(keys) =>
        val delta =
          if (config.keyAwareDiff) Differ.keyDiff(m, s, keys)
          else Differ.hashDiff(m, s, keys, config.legacyNullSkip)
        applyDelta(table, delta)
    }
  }

  /** C3/C4: partitioned cascade (`Synchronizer.php:111-180, 242-291`) — but
    * ONE grouped-fingerprint job per side covers every partition value,
    * replacing the reference's query-per-value loop. Only changed partitions
    * pay for a row diff, and those are diffed together in one pass with the
    * partition column folded into the join keys.
    */
  private def syncPartitionedTable(table: String, partCol: String): SyncAction = {
    val m = master.read(table)
    val s = slave.read(table)
    val cols = m.columns.toSeq

    val mFp = Hashing.partitionFingerprints(m, partCol, cols, config.legacyNullSkip)
    val sFp = Hashing.partitionFingerprints(s, partCol, cols, config.legacyNullSkip)
      .withColumnRenamed("fp_count", "s_count").withColumnRenamed("fp_xor", "s_xor")
      .withColumnRenamed("fp_sum", "s_sum")
    val joined = mFp.join(sFp, Seq(partCol), "full_outer").cache()
    try {
      // Excess slave partitions → ONE batched partition delete (the reference
      // deletes per value, Synchronizer.php:166-175; a single keyed delete on
      // the partition column is one rewrite instead of N).
      val excessDf = joined.filter(col("fp_count").isNull).select(partCol)
      val nExcess = excessDf.count()
      if (nExcess > 0) {
        // Partition-value lists are low-cardinality by definition (a
        // declared logical partition column) → broadcast the delete keys.
        if (!config.dryRun) slave.deleteKeys(table, broadcast(excessDf), Seq(partCol))
        record(DropPartition(table, partCol, s"$nExcess partitions"))
      }
      // Changed or missing partitions → one combined row-level diff scoped to
      // them (needDiff stays distributed: partition cardinality may be huge)
      val needDiffLazy = joined.filter(col("fp_count").isNotNull &&
        (col("s_count").isNull || !(col("fp_xor") <=> col("s_xor")) ||
         !(col("fp_count") <=> col("s_count")) || !(col("fp_sum") <=> col("s_sum"))))
        .select(partCol)
      // If the slave was mutated above, cut the lineage back to pre-delete
      // files by spilling the partition list (cache eviction would otherwise
      // recompute sFp against rewritten files).
      val needDiff =
        if (nExcess > 0 && !config.dryRun) spill(needDiffLazy, s"needdiff_$table")
        else needDiffLazy
      val nNeed = needDiff.count()
      if (nNeed == 0) {
        return if (nExcess > 0) record(ApplyDelta(table, nExcess, 0))
               else record(Skip(table, "already in sync"))
      }

      val keys = keyColsOf(table).getOrElse(Seq.empty)
      if (keys.isEmpty) {
        return if (config.copyTablesWithNoPrimary) copyTable(table)
               else record(Skip(table, "no primary key"))
      }
      // Re-read AFTER the excess delete: the diff's lazy plans must see the
      // slave's current files, not the pre-delete listing. The changed-
      // partition list's size is KNOWN (just counted) — broadcast it when
      // small so the scoping semi-joins never shuffle the tables by key.
      val needDiffB =
        if (nNeed <= Differ.BroadcastKeyMax) broadcast(needDiff) else needDiff
      val mScope = master.read(table).join(needDiffB, Seq(partCol), "left_semi")
      val sScope = slave.read(table).join(needDiffB, Seq(partCol), "left_semi")
      // C7: a row may have moved partitions; keying the diff on the PK alone
      // (not PK+partition) plus delete-before-insert keeps convergence.
      val delta =
        if (config.keyAwareDiff) Differ.keyDiff(mScope, sScope, keys)
        else Differ.hashDiff(mScope, sScope, keys, config.legacyNullSkip)
      applyDelta(table, delta)
    } finally joined.unpersist()
  }

  /** Materialize a small/medium DataFrame to scratch parquet and re-read it,
    * severing lineage from files a following mutation will rewrite.
    */
  private def spill(df: org.apache.spark.sql.DataFrame, tag: String): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    df.write.mode("overwrite").parquet(dir)
    df.sparkSession.read.parquet(dir)
  }

  private def applyDelta(table: String, delta: Delta): SyncAction = {
    // Counts come from the spilled delta either way — one execution of each
    // diff leg with the hash-map exchanges reused; a dry run just skips the
    // final slave rewrite (scratch spill is not slave state).
    val (nDel, nIns) = Differ.applyDelta(slave, table, delta, dryRun = config.dryRun)
    if (nDel == 0 && nIns == 0 && !config.dryRun) {
      // Fingerprints differed (we only get here after the short-circuit) yet
      // the diff found nothing — possible only when content-identical rows
      // differ in multiplicity, the hash-match blind spot the reference
      // itself documents (SURVEY §2.3 J1). Full recopy guarantees
      // convergence instead of silently reporting an empty delta.
      copyTable(table)
    } else record(ApplyDelta(table, nDel, nIns))
  }

  /** C5: full copy — drop, recreate from master (`Synchronizer.php:330-354`). */
  def copyTable(table: String): SyncAction = {
    if (!config.dryRun) slave.overwrite(table, master.read(table))
    record(CopyTable(table))
  }
}
