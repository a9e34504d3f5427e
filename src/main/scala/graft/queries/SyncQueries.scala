package graft.queries

import graft.functions.Hashing
import graft.sync.{BucketedStore, DerbyDialect, JdbcStore, ParquetStore, PartitionedStore, SyncConfig, SyncEngine}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end sync-engine queries: run the full C2 cascade (schema compare →
  * fingerprint short-circuit → hash diff → delta apply) against a perturbed
  * copy and prove convergence by fingerprint. The oracle is the *master's*
  * fingerprint — converged slave ≡ master, so the engine's output must
  * hash-match SQL computed on the master alone.
  */
object SyncQueries {
  import Registry.{table => T, duckRowHash}

  private val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  /** Build a scratch slave dir holding a perturbed lineitem: rows of every
    * 7th order dropped, quantity bumped on every 13th, plus 3 fabricated
    * excess rows (deletes + inserts + updates all exercised).
    *
    * The perturbed table is STAGED once per source dir and then cheaply
    * file-copied for each caller (every convergence query mutates its own
    * slave; a fresh Spark write per query cost ~4 s each at sf0.1, the FS
    * copy ~0.1 s).
    */
  private val staged = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Build every shared fixture outside any timed query (Bench warmup): the
    * sync queries otherwise pay one-time fixture writes and their numbers
    * stop measuring the engine.
    */
  def prestage(s: SparkSession, dir: String): Unit = {
    makeSlaveDir(s, dir, "warm")
    makeOrdersSlaveDir(s, dir, "warm")
    ensureCatalogMasters(s, dir)
    ensureDbFixture(s, dir)
    restoreCatalogSlave(s, dir, bucketed = true)
    restoreCatalogSlave(s, dir, bucketed = false)
    incBases(s, dir)
    ()
  }

  private[queries] val ordersCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
  private val catalogStaged = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** Stage the immutable MASTER catalog tables (bucketed + partitioned) once
    * per (process, sfDir) — master content never changes, so its write is
    * fixture setup like the parquet slave base; the slaves are rebuilt inside
    * each query run because the sync mutates them.
    */
  private[queries] def ensureCatalogMasters(s: SparkSession, dir: String): Unit = {
    catalogStaged.getOrElseUpdate(dir, {
      val orders = T(s, dir, "orders").select(ordersCols.map(col): _*)
      new BucketedStore(s, "graft_bkm", Map("orders" -> Seq("o_orderkey")), numBuckets = 8)
        .overwrite("orders", orders)
      new PartitionedStore(s, "graft_ptm", Map("orders" -> "o_orderstatus"))
        .overwrite("orders", orders)
      true
    })
    ()
  }

  private[queries] def makeSlaveDir(s: SparkSession, dir: String, tag: String): String = {
    val base = staged.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft_slave_base").toString
      val li = T(s, dir, "lineitem")
      val perturbed = li.filter(col("l_orderkey") % 7 =!= 0)
        .withColumn("l_quantity",
          when(col("l_orderkey") % 13 === 0, col("l_quantity") + 1.0).otherwise(col("l_quantity")))
      val excess = li.orderBy(li.columns.map(col).toSeq: _*).limit(3)
        .withColumn("l_orderkey", col("l_orderkey") + 1000000L)
      perturbed.unionByName(excess)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")
      out
    })
    val out = java.nio.file.Files.createTempDirectory(s"graft_slave_$tag")
    copyDir(java.nio.file.Paths.get(base), out)
    out.toString
  }

  private def copyDir(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    Files.walk(from).forEach { (p: Path) =>
      val dest = to.resolve(from.relativize(p))
      if (Files.isDirectory(p)) { if (!Files.exists(dest)) { Files.createDirectories(dest); () } }
      else { Files.copy(p, dest); () }
    }
  }

  private def rmTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }

  /** Staged perturbed ORDERS slave (same stage-once / file-copy-per-run
    * contract as the lineitem base): missing (%5), stale totalprice (%7),
    * 2 fabricated excess rows. Used by the maintained-mode query — the
    * maintained mechanics are table-size-independent, so the demo shouldn't
    * double-pay lineitem-sized COW rewrites (same reasoning as
    * stream_resync_audited).
    */
  private val ordersStaged = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Staged append-only-sync fixture: (batch-1 master parquet dir,
    * batch-2 append part-files dir), written once per (process, sfDir).
    */
  private val incStaged = scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  private[queries] def incBases(s: SparkSession, dir: String): (String, String) =
    incStaged.getOrElseUpdate(dir, {
      val orders = T(s, dir, "orders")
      val m = java.nio.file.Files.createTempDirectory("graft_inc_base_m").toString + "/orders.parquet"
      orders.filter(col("o_orderkey") % 3 =!= 0).repartition(4).write.parquet(m)
      val b2 = java.nio.file.Files.createTempDirectory("graft_inc_base_b2").toString + "/batch2"
      orders.filter(col("o_orderkey") % 3 === 0).repartition(2).write.parquet(b2)
      (m, b2)
    })

  /** Staged change-feed-sync fixture: orders (narrow projection)
    * range-clustered by key WITH its manifest snapshot already committed —
    * master and slave copies both start from this dir, mutated per run.
    * Written once per (process, sfDir).
    */
  private val cfStaged = scala.collection.concurrent.TrieMap.empty[String, String]

  private[queries] def cfBase(s: SparkSession, dir: String): String =
    cfStaged.getOrElseUpdate(dir, {
      val base = java.nio.file.Files.createTempDirectory("graft_cf_base").toString + "/orders.parquet"
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
        .repartitionByRange(8, col("o_orderkey")).write.parquet(base)
      graft.ops.Manifest.create(s, base, "o_orderkey"): Unit
      base
    })

  /** HIVE-PARTITIONED flavor of [[cfBase]]: partitioned by o_orderstatus,
    * key-ranged files within each partition — the master layout the
    * partitioned COW + feed cycle exercises (staged once per sf dir).
    */
  private val cfPartStaged = scala.collection.concurrent.TrieMap.empty[String, String]
  private[queries] def cfBasePart(s: SparkSession, dir: String): String =
    cfPartStaged.getOrElseUpdate(dir, {
      val base = java.nio.file.Files.createTempDirectory("graft_cfp_base").toString + "/orders.parquet"
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
        .repartitionByRange(6, col("o_orderkey"))
        .write.partitionBy("o_orderstatus").parquet(base)
      graft.ops.Manifest.create(s, base, "o_orderkey"): Unit
      base
    })

  private def makeOrdersSlaveDir(s: SparkSession, dir: String, tag: String): String = {
    val base = ordersStaged.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft_orders_base").toString
      val o = T(s, dir, "orders")
      val perturbed = o.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice", when(col("o_orderkey") % 7 === 0,
          col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
      val excess = o.orderBy("o_orderkey").limit(2)
        .withColumn("o_orderkey", col("o_orderkey") + 900000L)
      perturbed.unionByName(excess)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")
      out
    })
    val out = java.nio.file.Files.createTempDirectory(s"graft_orders_$tag")
    copyDir(java.nio.file.Paths.get(base), out)
    out.toString
  }

  /** The whole-database fixture: an immutable MASTER parquet dir (staged
    * once per source dir) and a pristine SLAVE base dir holding every
    * orchestration branch's starting state — file-copied per run, so the
    * timed body measures syncing, not the nine fixture writes it used to
    * include.
    */
  private val dbStaged = scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  private[queries] val dbNatCols = Seq("n_nationkey", "n_name", "n_regionkey")
  private[queries] val dbRegCols = Seq("r_regionkey", "r_name")
  private[queries] val dbSupCols = Seq("s_suppkey", "s_name", "s_nationkey")
  private[queries] val dbCusCols = Seq("c_custkey", "c_name", "c_nationkey")

  private[queries] def ensureDbFixture(s: SparkSession, dir: String): (String, String) =
    dbStaged.getOrElseUpdate(dir, {
      val nation = T(s, dir, "nation").select(dbNatCols.map(col): _*)
      val region = T(s, dir, "region").select(dbRegCols.map(col): _*)
      val supplier = T(s, dir, "supplier").select(dbSupCols.map(col): _*)
      val customer = T(s, dir, "customer").select(dbCusCols.map(col): _*)
      val mDir = java.nio.file.Files.createTempDirectory("graft_db_m").toString
      val bDir = java.nio.file.Files.createTempDirectory("graft_db_base").toString
      val master = new ParquetStore(s, mDir)
      val slaveBase = new ParquetStore(s, bDir)
      master.overwrite("nation", nation)
      master.overwrite("region", region)
      master.overwrite("supplier", supplier)
      master.overwrite("customer", customer)
      // clean shared → fingerprint Skip
      slaveBase.overwrite("region", region)
      // dirty shared → keyed delta (deletes + updates + excess rows)
      slaveBase.overwrite("nation", nation
        .filter(col("n_nationkey") % 7 =!= 3)
        .withColumn("n_name", when(col("n_nationkey") % 5 === 1,
          concat(col("n_name"), lit("_x"))).otherwise(col("n_name")))
        .unionByName(nation.orderBy("n_nationkey").limit(2)
          .withColumn("n_nationkey", col("n_nationkey") + 1000L)))
      // schema change (dropped column) → full recopy
      slaveBase.overwrite("customer", customer.drop("c_nationkey"))
      // supplier missing entirely → copy; scratch_tmp excess → drop
      slaveBase.overwrite("scratch_tmp", region)
      // regex-ignored → must stay EXACTLY as planted
      slaveBase.overwrite("audit_keep", nation.filter(col("n_nationkey") % 2 === 0))
      (mDir, bDir)
    })

  /** Restore the perturbed CATALOG slave (bucketed or partitioned) to its
    * pristine pre-sync state: first call creates the table and snapshots its
    * warehouse directory; later calls swap the files back and re-register
    * partitions — a ~0.1 s file copy instead of a full `saveAsTable`
    * (the in-body slave staging was the dominant cost of the pruned/bucketed
    * sync timings, drowning the engine work they exist to measure).
    */
  private val catalogSlaveStaged = scala.collection.concurrent.TrieMap.empty[String, String]

  private[queries] def restoreCatalogSlave(s: SparkSession, dir: String,
                                           bucketed: Boolean): Unit = {
    val table = if (bucketed) "graft_bks_orders" else "graft_pts_orders"
    val warehouse = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table).toUri.getPath
    val key = s"$dir/$table"
    catalogSlaveStaged.get(key) match {
      case Some(pristine) if s.catalog.tableExists(table) =>
        rmTree(java.nio.file.Paths.get(warehouse))
        copyDir(java.nio.file.Paths.get(pristine), java.nio.file.Paths.get(warehouse))
        // The previous sync dropped/rewrote partitions — re-register from
        // the restored layout (4 partitions: a cheap directory walk).
        if (!bucketed) s.sql(s"MSCK REPAIR TABLE $table")
        s.sql(s"REFRESH TABLE $table")
        ()
      case _ =>
        val orders = T(s, dir, "orders").select(ordersCols.map(col): _*)
        val perturbed =
          if (bucketed) orders
            .filter(col("o_orderkey") % 5 =!= 0)
            .withColumn("o_totalprice", when(col("o_orderkey") % 7 === 0,
              col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
            .unionByName(orders.orderBy("o_orderkey").limit(2)
              .withColumn("o_orderkey", col("o_orderkey") + 900000L))
          else orders
            .filter(!(col("o_orderstatus") === "O" && col("o_orderkey") % 5 === 0))
            .withColumn("o_totalprice", when(
              col("o_orderstatus") === "O" && col("o_orderkey") % 7 === 0,
              col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
            .unionByName(orders.orderBy("o_orderkey").limit(2)
              .withColumn("o_orderstatus", lit("X"))
              .withColumn("o_orderkey", col("o_orderkey") + 900000L))
        if (bucketed)
          new BucketedStore(s, "graft_bks", Map("orders" -> Seq("o_orderkey")),
            numBuckets = 8).overwrite("orders", perturbed)
        else
          new PartitionedStore(s, "graft_pts", Map("orders" -> "o_orderstatus"))
            .overwrite("orders", perturbed)
        val snap = java.nio.file.Files.createTempDirectory(s"graft_snap_$table")
        copyDir(java.nio.file.Paths.get(warehouse), snap)
        catalogSlaveStaged.put(key, snap.toString)
        ()
    }
  }

  def all: Seq[Q] = Seq(

    // Full sync convergence: returns the slave's post-sync exact fingerprint
    // + row count; oracle computes the same on the master (they must agree).
    Q("sync_converge",
      (s, dir) => {
        val slaveDir = makeSlaveDir(s, dir, "conv")
        val master = new ParquetStore(s, dir)
        val slave = new ParquetStore(s, slaveDir)
        val engine = new SyncEngine(master, slave, SyncConfig(
          primaryKeys = Map("lineitem" -> Seq("l_orderkey", "l_linenumber"))))
        engine.syncTable("lineitem")
        val synced = slave.read("lineitem")
        Hashing.multisetFingerprintAgg(synced, liCols)
      },
      Some(Registry.duckMultisetFingerprint(liCols, "lineitem"))),

    // Key-aware diff variant (SURVEY §2.3 J1 note): same convergence proof
    // through Differ.keyDiff (full-outer on the key struct).
    Q("sync_converge_keydiff",
      (s, dir) => {
        val slaveDir = makeSlaveDir(s, dir, "keyd")
        val master = new ParquetStore(s, dir)
        val slave = new ParquetStore(s, slaveDir)
        val engine = new SyncEngine(master, slave, SyncConfig(
          primaryKeys = Map("lineitem" -> Seq("l_orderkey", "l_linenumber")),
          keyAwareDiff = true))
        engine.syncTable("lineitem")
        val synced = slave.read("lineitem")
        Hashing.multisetFingerprintAgg(synced, liCols)
      },
      Some(Registry.duckMultisetFingerprint(liCols, "lineitem"))),

    // Partitioned-table cascade (C3/C4): lineitem logically partitioned by
    // l_orderkey, same convergence proof through the grouped-fingerprint path.
    Q("sync_converge_partitioned",
      (s, dir) => {
        val slaveDir = makeSlaveDir(s, dir, "part")
        val master = new ParquetStore(s, dir)
        val slave = new ParquetStore(s, slaveDir)
        val engine = new SyncEngine(master, slave, SyncConfig(
          primaryKeys = Map("lineitem" -> Seq("l_orderkey", "l_linenumber")),
          partitionedTables = Map("lineitem" -> "l_orderkey")))
        engine.syncTable("lineitem")
        val synced = slave.read("lineitem")
        Hashing.multisetFingerprintAgg(synced, liCols)
      },
      Some(Registry.duckMultisetFingerprint(liCols, "lineitem"))),

    // Co-located layout (the recurring-sync trade): master and slave are
    // bucketed catalog tables sharing the bucket spec, so the key-aware
    // diff's full-outer join reads both sides pre-partitioned — zero
    // table-sized exchanges per sync cycle (plan asserted in
    // BucketedStoreSpec; convergence proven here against the oracle).
    Q("sync_converge_bucketed",
      (s, dir) => {
        val cols = ordersCols
        val keys = Map("orders" -> Seq("o_orderkey"))
        ensureCatalogMasters(s, dir)
        restoreCatalogSlave(s, dir, bucketed = true)
        val master = new BucketedStore(s, "graft_bkm", keys, numBuckets = 8)
        val slave = new BucketedStore(s, "graft_bks", keys, numBuckets = 8)
        val engine = new SyncEngine(master, slave,
          SyncConfig(primaryKeys = keys, keyAwareDiff = true))
        engine.syncTable("orders")
        Hashing.multisetFingerprintAgg(slave.read("orders"), cols)
      },
      Some(Registry.duckMultisetFingerprint(
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"), "orders"))),

    // C1: whole-DATABASE sync end to end (`Synchronizer.php:34-102`) — one
    // fixture exercising every orchestration branch at once: an excess
    // slave table (dropped), a missing table (copied), a schema-changed
    // table (recopied), a dirty shared table (row delta), a clean shared
    // table (fingerprint Skip), and a regex-ignored table (left divergent).
    // Result = per-table post-sync SLAVE fingerprints; the oracle recomputes
    // each from the MASTER parquet (and, for the ignored table, from the
    // same deterministic perturbation SQL) — convergence and the
    // leave-alone guarantee are both hash-gated.
    Q("sync_database",
      (s, dir) => {
        val natCols = dbNatCols
        val regCols = dbRegCols
        val supCols = dbSupCols
        val cusCols = dbCusCols
        // Fixture staging (4 master + 5 slave writes) happens ONCE outside
        // the timed body; each run file-copies the pristine slave base
        // (~0.1 s) so this number measures the sync, not fixture writes.
        val (mDir, slaveBase) = ensureDbFixture(s, dir)
        val sDir = java.nio.file.Files.createTempDirectory("graft_db_s")
        copyDir(java.nio.file.Paths.get(slaveBase), sDir)
        val master = new ParquetStore(s, mDir)
        val slave = new ParquetStore(s, sDir.toString)

        val engine = new SyncEngine(master, slave, SyncConfig(
          primaryKeys = Map("nation" -> Seq("n_nationkey")),
          ignoreTables = Seq("audit_.*".r)))
        engine.syncDatabase()

        val perTable = Seq(
          "region" -> regCols, "nation" -> natCols,
          "supplier" -> supCols, "customer" -> cusCols,
          "audit_keep" -> natCols)
        val fps = perTable.map { case (t, cols) =>
          Hashing.multisetFingerprintAgg(slave.read(t), cols)
            .withColumn("tbl", lit(t))
        }.reduce(_ unionByName _)
        val dropped = s.createDataFrame(Seq(("absent", -1L, "scratch_tmp")))
          .toDF("fingerprint", "n_rows", "tbl")
        val present = slave.list().contains("scratch_tmp")
        fps.unionByName(if (present) dropped.withColumn("fingerprint", lit("STILL_PRESENT"))
                        else dropped)
          .select("tbl", "fingerprint", "n_rows")
      },
      Some {
        def one(t: String, cols: Seq[String], from: String) =
          s"SELECT '$t' AS tbl, * FROM (${Registry.duckMultisetFingerprint(cols, from)})"
        Seq(
          one("region", Seq("r_regionkey", "r_name"), "region"),
          one("nation", Seq("n_nationkey", "n_name", "n_regionkey"), "nation"),
          one("supplier", Seq("s_suppkey", "s_name", "s_nationkey"), "supplier"),
          one("customer", Seq("c_custkey", "c_name", "c_nationkey"), "customer"),
          one("audit_keep", Seq("n_nationkey", "n_name", "n_regionkey"),
            "(SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey % 2 = 0) aud"),
          "SELECT 'scratch_tmp' AS tbl, 'absent' AS fingerprint, -1::bigint AS n_rows"
        ).mkString("\nUNION ALL\n")
      }),

    // Partition-pruned copy-on-write (the C3/C4 cascade over a physical
    // Hive layout): only partitions the delta touches are rewritten —
    // untouched partitions keep their exact files (asserted by mtime in
    // PartitionedStoreSpec); excess partitions drop as metadata. Here the
    // perturbation touches one of three status partitions plus a bogus
    // excess partition.
    Q("sync_converge_pruned",
      (s, dir) => {
        val cols = ordersCols
        val pcs = Map("orders" -> "o_orderstatus")
        ensureCatalogMasters(s, dir)
        restoreCatalogSlave(s, dir, bucketed = false)
        val master = new PartitionedStore(s, "graft_ptm", pcs)
        val slave = new PartitionedStore(s, "graft_pts", pcs)
        val engine = new SyncEngine(master, slave, SyncConfig(
          primaryKeys = Map("orders" -> Seq("o_orderkey")),
          partitionedTables = pcs, keyAwareDiff = true))
        engine.syncTable("orders")
        Hashing.multisetFingerprintAgg(slave.read("orders"), cols)
      },
      Some(Registry.duckMultisetFingerprint(
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"), "orders"))),

    // Maintained mode over the PARTITIONED cascade: cycle 1 converges the
    // perturbed slave and spills the per-partition fingerprint snapshot;
    // the master is then MUTATED (own staged copy — bump totalprice on
    // every 9th order, which touches several status partitions); cycle 2
    // must detect via the changed token, read the SLAVE side of the gate
    // from the snapshot (no slave fingerprint scan — behavior proven in
    // SyncEngineSpec's ghost-row test), scope the diff to the changed
    // partitions, and converge. The oracle replays the mutated master in
    // SQL against the slave's final recomputed fingerprint.
    Q("sync_converge_partitioned_maintained",
      (s, dir) => {
        val oCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        // Fresh MUTABLE master copy per run (the query mutates it).
        val mDir = java.nio.file.Files.createTempDirectory("graft_pm_master")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/orders.parquet"),
          mDir.resolve("orders.parquet"))
        val slaveDir = makeOrdersSlaveDir(s, dir, "pmaint")
        val master = new ParquetStore(s, mDir.toString)
        val slave = new ParquetStore(s, slaveDir)
        val engine = new SyncEngine(master, slave, SyncConfig(
          primaryKeys = Map("orders" -> Seq("o_orderkey")),
          partitionedTables = Map("orders" -> "o_orderstatus"),
          maintainFingerprints = true))
        engine.syncTable("orders") // cycle 1: prime + converge + snapshot
        master.overwrite("orders", master.read("orders").withColumn("o_totalprice",
          when(col("o_orderkey") % 9 === 2, col("o_totalprice") + 5.0)
            .otherwise(col("o_totalprice"))))
        val second = engine.syncTable("orders") // cycle 2: snapshot-gated re-sync
        val secondApplied = second.isInstanceOf[graft.sync.SyncAction.ApplyDelta]
        Hashing.multisetFingerprintAgg(slave.read("orders"), oCols)
          .select(col("fingerprint"), col("n_rows"),
            lit(secondApplied).as("second_cycle_applied"))
      },
      Some {
        val oCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        val mutated = """(SELECT * REPLACE (
          |   CASE WHEN o_orderkey % 9 = 2 THEN o_totalprice + 5.0 ELSE o_totalprice END
          |   AS o_totalprice) FROM orders) p""".stripMargin
        s"""SELECT fingerprint, n_rows, true AS second_cycle_applied
           |FROM (${Registry.duckMultisetFingerprint(oCols, mutated)})""".stripMargin
      }),

    // Maintained (CDC) fingerprint: the MultisetFp group algebra that turns
    // the per-cycle convergence gate from two table scans into O(delta) —
    // `fpAfter = fpBefore.remove(fp(deleted)).merge(fp(inserted))`. Here a
    // delta (quantity bump on every 7th order's rows, expressed as CDC
    // delete+insert) is folded into the maintained value, which must equal
    // the fingerprint RECOMPUTED from the post-delta table; the oracle
    // replays the same delta and fingerprint in SQL, so both the maintained
    // value and the recompute are hash-gated.
    Q("sync_incremental_fp",
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        // Maintained side: ONE scan computes fp(before), fp(deleted) and
        // fp(inserted) together (the delta rows' pre- and post-images hash
        // in the same pass — exactly what a CDC feed delivers), then the
        // group algebra folds them driver-side: three Longs, no shuffle of
        // table data beyond the single partial-agg exchange.
        val inDelta = (col("l_orderkey") % 7 === 0).as("__d")
        val bumped = li.withColumn("__bq", col("l_quantity") + 1.0)
        val insCols = liCols.map(c => if (c == "l_quantity") "__bq" else c)
        val maintained = Hashing.multisetFpDelta(
          bumped.select(inDelta +:
            Hashing.rowHash(bumped, liCols).as("__hb") +:
            Hashing.rowHash(bumped, insCols).as("__hi") +: Nil: _*),
          deltaCol = "__d", beforeHash = "__hb", afterHash = "__hi")
        // Independent recompute from the post-delta table (separate code
        // path: filter + union + one-shot aggregate) — must agree.
        val inserted = li.filter(col("l_orderkey") % 7 === 0)
          .withColumn("l_quantity", col("l_quantity") + 1.0)
        val after = li.filter(col("l_orderkey") % 7 =!= 0).unionByName(inserted)
        Hashing.multisetFingerprintAgg(after, liCols)
          .select(col("fingerprint"), col("n_rows"),
            (col("fingerprint") === lit(maintained.render)).as("maintained_matches"))
      },
      Some {
        val perturbed = """(SELECT * REPLACE (
          |   CASE WHEN l_orderkey % 7 = 0 THEN l_quantity + 1.0 ELSE l_quantity END
          |   AS l_quantity) FROM lineitem) p""".stripMargin
        s"""SELECT fingerprint, n_rows, true AS maintained_matches
           |FROM (${Registry.duckMultisetFingerprint(liCols, perturbed)})""".stripMargin
      }),

    // Maintained-fingerprint sync mode END TO END (the reference's
    // "run frequently" loop, O(delta) per cycle): cycle 1 primes + converges
    // the perturbed slave; cycle 2 must short-circuit on the master's
    // metadata change token — ZERO Spark jobs (asserted by job-group in
    // SyncEngineSpec; surfaced here as the oracle-pinned
    // `second_cycle_zero_scan`); cycle 3 applies a CDC batch (delete +
    // reinsert with a quantity bump for every 11th order) through
    // SyncEngine.applyCdc, folding the MultisetFp group algebra instead of
    // rescanning. The emitted fingerprint is RECOMPUTED from the slave's
    // files and must equal both the maintained value (`maintained_matches`)
    // and the oracle's SQL replay of the same perturbation.
    Q("sync_converge_maintained",
      (s, dir) => {
        val oCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        val slaveDir = makeOrdersSlaveDir(s, dir, "maint")
        val master = new ParquetStore(s, dir)
        val slave = new ParquetStore(s, slaveDir)
        val engine = new SyncEngine(master, slave, SyncConfig(
          primaryKeys = Map("orders" -> Seq("o_orderkey")),
          maintainFingerprints = true))
        engine.syncTable("orders") // cycle 1: prime + converge
        engine.syncTable("orders") // cycle 2: token short-circuit
        val secondSkip = engine.auditLog.lastOption.exists {
          case graft.sync.SyncAction.Skip(_, r) => r.contains("change token")
          case _ => false
        }
        val touched = T(s, dir, "orders").filter(col("o_orderkey") % 11 === 5)
        val changes = touched.withColumn("op", lit("D")).unionByName(
          touched.withColumn("o_totalprice", col("o_totalprice") + 2.0)
            .withColumn("op", lit("I")))
        engine.applyCdc("orders", changes) // cycle 3: O(delta) CDC fold
        val maintained = engine.maintainedFingerprint("orders").get
        Hashing.multisetFingerprintAgg(slave.read("orders"), oCols)
          .select(col("fingerprint"), col("n_rows"),
            (col("fingerprint") === lit(maintained.render)).as("maintained_matches"),
            lit(secondSkip).as("second_cycle_zero_scan"))
      },
      Some {
        val oCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        val perturbed = """(SELECT * REPLACE (
          |   CASE WHEN o_orderkey % 11 = 5 THEN o_totalprice + 2.0 ELSE o_totalprice END
          |   AS o_totalprice) FROM orders) p""".stripMargin
        s"""SELECT fingerprint, n_rows, true AS maintained_matches,
           | true AS second_cycle_zero_scan
           |FROM (${Registry.duckMultisetFingerprint(oCols, perturbed)})""".stripMargin
      }),

    // Manifest-driven incremental sync (the file-granularity completion of
    // the reference's "iterative = quick" loop): the append-only master dir
    // carries Manifest snapshots; after the priming cycle, each cycle
    // commits an INCREMENTAL snapshot (only new files scanned for stats),
    // reads ONLY the files added since its checkpoint id, and folds them
    // into the slave as a pure append + a delta-sized fingerprint merge —
    // the old master data is never planned (executed-scan contract in
    // PlanAuditSpec). Gates: the incremental cycle reported an append-only
    // delta, a no-op cycle skips on "no new files", and the recomputed
    // slave fingerprint equals both the maintained value and the oracle's
    // full-orders fingerprint.
    Q("sync_converge_incremental_manifest",
      (s, dir) => {
        val oCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        // Fixture staged ONCE per (process, sfDir) and FS-copied per run —
        // the master is mutated (appended) each run, so it needs a fresh
        // copy, but the Spark writes shouldn't be re-paid (same contract as
        // the other converge slaves).
        val (mBase, b2Base) = incBases(s, dir)
        val mDir = java.nio.file.Files.createTempDirectory("graft_inc_m").toString
        val sDir = java.nio.file.Files.createTempDirectory("graft_inc_s").toString
        val mPath = s"$mDir/orders.parquet"
        copyDir(java.nio.file.Paths.get(mBase), java.nio.file.Paths.get(mPath))
        // Slave starts as an exact copy of batch 1 (the steady-state shape:
        // primed and converged before increments arrive).
        copyDir(java.nio.file.Paths.get(mBase),
          java.nio.file.Paths.get(s"$sDir/orders.parquet"))
        val engine = new SyncEngine(new ParquetStore(s, mDir), new ParquetStore(s, sDir),
          SyncConfig(primaryKeys = Map("orders" -> Seq("o_orderkey")),
            maintainFingerprints = true,
            // This engine owns the fixture master outright, the intended
            // setting for opting into master-side retention maintenance.
            masterRetentionMaintenance = true))
        engine.syncAppendOnlyIncremental("orders") // prime + checkpoint (store-derived path)
        // The append: batch 2's part files land in the master dir (byte-copy
        // of a staged Spark append — identical layout, no per-run write).
        val b2 = new java.io.File(b2Base).listFiles()
          .filter(f => f.getName.startsWith("part-") && f.length > 0)
        b2.foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(mPath, f.getName)): Unit
        }
        val act = engine.syncAppendOnlyIncremental("orders") // O(new files)
        val incrementalOk = act match {
          case graft.sync.SyncAction.ApplyDelta(_, d, i) => d == 0 && i > 0
          case _ => false
        }
        val noopOk = engine.syncAppendOnlyIncremental("orders") match {
          case graft.sync.SyncAction.Skip(_, r) => r.contains("no new files")
          case _ => false
        }
        val maintained = engine.maintainedFingerprint("orders").get
        Hashing.multisetFingerprintAgg(s.read.parquet(s"$sDir/orders.parquet"), oCols)
          .select(col("fingerprint"), col("n_rows"),
            (col("fingerprint") === lit(maintained.render)).as("maintained_matches"),
            lit(incrementalOk).as("incremental_cycle_ok"),
            lit(noopOk).as("noop_cycle_ok"))
      },
      Some {
        val oCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        s"""SELECT fingerprint, n_rows, true AS maintained_matches,
           | true AS incremental_cycle_ok, true AS noop_cycle_ok
           |FROM (${Registry.duckMultisetFingerprint(oCols, "orders")})""".stripMargin
      }),

    // Change-feed-driven sync over a DML-MUTATED master — the
    // general-mutation completion of the append-only incremental cycle:
    // the master is mutated in place by the COW DML jobs (deleteRange +
    // mergeKeyed), and one syncViaChangeFeed cycle converges the slave by
    // applying the manifest's row-level change feed as a CDC batch —
    // deletes carry their retained pre-images, updates arrive as D+I
    // pairs, IO ∝ the files the mutations touched, the slave and master
    // are never rescanned, and the maintained fingerprint advances by the
    // feed's own aggregate. Gates: the feed cycle reported exactly the
    // mutation's delete/insert counts, an unchanged cycle skips on the
    // snapshot id, and the recomputed slave fingerprint equals both the
    // maintained value and DuckDB's replay of the delete+merge.
    Q("sync_converge_change_feed",
      (s, dir) => {
        val oCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        val base = cfBase(s, dir)
        val mDir = java.nio.file.Files.createTempDirectory("graft_cf_m").toString
        val sDir = java.nio.file.Files.createTempDirectory("graft_cf_s").toString
        copyDir(java.nio.file.Paths.get(base),
          java.nio.file.Paths.get(s"$mDir/orders.parquet"))
        copyDir(java.nio.file.Paths.get(base),
          java.nio.file.Paths.get(s"$sDir/orders.parquet"))
        val mPath = s"$mDir/orders.parquet"
        val engine = new SyncEngine(new ParquetStore(s, mDir), new ParquetStore(s, sDir),
          SyncConfig(primaryKeys = Map("orders" -> Seq("o_orderkey")),
            maintainFingerprints = true,
            // Fixture master is owned by this engine — retention opt-in keeps
            // the vacuum/expire loop exercised under the feed cycle.
            masterRetentionMaintenance = true))
        engine.syncViaChangeFeed("orders") // prime + checkpoint
        val orders = Registry.table(s, dir, "orders").select(oCols.map(col): _*)
        val maxId = orders.agg(max(col("o_orderkey"))).head().getLong(0)
        graft.ops.Layout.deleteRange(s, mPath, "o_orderkey", maxId / 4, maxId / 2)
        val nDel = orders
          .filter(col("o_orderkey").between(maxId / 4, maxId / 2)).count()
        val updates = orders.filter(col("o_orderkey") < maxId / 8)
          .withColumn("o_orderpriority", concat(lit("U-"), col("o_orderpriority")))
        val inserts = orders.filter(col("o_orderkey") < 20)
          .withColumn("o_orderkey", col("o_orderkey") + maxId + 1)
        graft.ops.Layout.mergeKeyed(s, mPath, "o_orderkey",
          updates.unionByName(inserts))
        val nUpd = updates.count(); val nIns = inserts.count()
        val feedOk = engine.syncViaChangeFeed("orders") match {
          case graft.sync.SyncAction.ApplyDelta(_, d, i) =>
            d == nDel + nUpd && i == nUpd + nIns
          case _ => false
        }
        val noopOk = engine.syncViaChangeFeed("orders") match {
          case graft.sync.SyncAction.Skip(_, r) => r.contains("no snapshot change")
          case _ => false
        }
        val maintained = engine.maintainedFingerprint("orders").get
        Hashing.multisetFingerprintAgg(
          s.read.parquet(s"$sDir/orders.parquet"), oCols)
          .select(col("fingerprint"), col("n_rows"),
            (col("fingerprint") === lit(maintained.render)).as("maintained_matches"),
            lit(feedOk).as("feed_cycle_ok"),
            lit(noopOk).as("noop_cycle_ok"))
      },
      Some {
        val oCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        s"""WITH b AS (SELECT max(o_orderkey) AS mx FROM orders),
           | final AS (
           |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |         o_orderdate, o_orderpriority
           |   FROM orders, b
           |   WHERE o_orderkey NOT BETWEEN b.mx // 4 AND b.mx // 2
           |     AND o_orderkey >= b.mx // 8
           |  UNION ALL
           |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |         o_orderdate, 'U-' || o_orderpriority
           |   FROM orders, b WHERE o_orderkey < b.mx // 8
           |  UNION ALL
           |  SELECT o_orderkey + b.mx + 1, o_custkey, o_orderstatus,
           |         o_totalprice, o_orderdate, o_orderpriority
           |   FROM orders, b WHERE o_orderkey < 20)
           |SELECT fingerprint, n_rows, true AS maintained_matches,
           | true AS feed_cycle_ok, true AS noop_cycle_ok
           |FROM (${Registry.duckMultisetFingerprint(oCols, "final")})""".stripMargin
      }),

    // Change-feed sync over a HIVE-PARTITIONED, DML-mutated master — the
    // partitioned completion of sync_converge_change_feed: the master
    // lives in k=v layout, its COW delete/merge commit per partition
    // (untouched partitions never planned or renamed), the feed resolves
    // replaced originals through the structure-preserving trash, and the
    // flat slave converges from the same row-level CDC batch. Gates
    // identical to the flat variant (exact feed counts, snapshot-id skip,
    // maintained fingerprint ≡ recomputed ≡ DuckDB's replay).
    Q("sync_converge_change_feed_partitioned",
      (s, dir) => {
        val oCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        val mDir = java.nio.file.Files.createTempDirectory("graft_cfp_m").toString
        val sDir = java.nio.file.Files.createTempDirectory("graft_cfp_s").toString
        // Both sides from the PARTITIONED base: a flat slave would differ
        // in column ORDER (partition col last) and force a priming recopy.
        copyDir(java.nio.file.Paths.get(cfBasePart(s, dir)),
          java.nio.file.Paths.get(s"$mDir/orders.parquet"))
        copyDir(java.nio.file.Paths.get(cfBasePart(s, dir)),
          java.nio.file.Paths.get(s"$sDir/orders.parquet"))
        val mPath = s"$mDir/orders.parquet"
        val engine = new SyncEngine(new ParquetStore(s, mDir), new ParquetStore(s, sDir),
          SyncConfig(primaryKeys = Map("orders" -> Seq("o_orderkey")),
            maintainFingerprints = true,
            masterRetentionMaintenance = true))
        engine.syncViaChangeFeed("orders") // prime + checkpoint
        val orders = Registry.table(s, dir, "orders").select(oCols.map(col): _*)
        val maxId = orders.agg(max(col("o_orderkey"))).head().getLong(0)
        graft.ops.Layout.deleteRange(s, mPath, "o_orderkey", maxId / 4, maxId / 2)
        val nDel = orders
          .filter(col("o_orderkey").between(maxId / 4, maxId / 2)).count()
        val updates = orders.filter(col("o_orderkey") < maxId / 8)
          .withColumn("o_orderpriority", concat(lit("U-"), col("o_orderpriority")))
        val inserts = orders.filter(col("o_orderkey") < 20)
          .withColumn("o_orderkey", col("o_orderkey") + maxId + 1)
        graft.ops.Layout.mergeKeyed(s, mPath, "o_orderkey",
          updates.unionByName(inserts))
        val nUpd = updates.count(); val nIns = inserts.count()
        val feedOk = engine.syncViaChangeFeed("orders") match {
          case graft.sync.SyncAction.ApplyDelta(_, d, i) =>
            d == nDel + nUpd && i == nUpd + nIns
          case _ => false
        }
        val noopOk = engine.syncViaChangeFeed("orders") match {
          case graft.sync.SyncAction.Skip(_, r) => r.contains("no snapshot change")
          case _ => false
        }
        val maintained = engine.maintainedFingerprint("orders").get
        // The maintained fingerprint lives in the MASTER's column order
        // (hive layout surfaces the partition column last); recompute the
        // slave in that order for the equality gate, and surface the
        // oracle-facing fingerprint in the canonical oCols order.
        val mCols = s.read.parquet(mPath).columns.toSeq
        val recomputed = Hashing.multisetFingerprintAgg(
          s.read.parquet(s"$sDir/orders.parquet").select(mCols.map(col): _*),
          mCols).head().getString(0)
        Hashing.multisetFingerprintAgg(
          s.read.parquet(s"$sDir/orders.parquet").select(oCols.map(col): _*),
          oCols)
          .select(col("fingerprint"), col("n_rows"),
            lit(recomputed == maintained.render).as("maintained_matches"),
            lit(feedOk).as("feed_cycle_ok"),
            lit(noopOk).as("noop_cycle_ok"))
      },
      Some {
        val oCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        s"""WITH b AS (SELECT max(o_orderkey) AS mx FROM orders),
           | final AS (
           |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |         o_orderdate, o_orderpriority
           |   FROM orders, b
           |   WHERE o_orderkey NOT BETWEEN b.mx // 4 AND b.mx // 2
           |     AND o_orderkey >= b.mx // 8
           |  UNION ALL
           |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |         o_orderdate, 'U-' || o_orderpriority
           |   FROM orders, b WHERE o_orderkey < b.mx // 8
           |  UNION ALL
           |  SELECT o_orderkey + b.mx + 1, o_custkey, o_orderstatus,
           |         o_totalprice, o_orderdate, o_orderpriority
           |   FROM orders, b WHERE o_orderkey < 20)
           |SELECT fingerprint, n_rows, true AS maintained_matches,
           | true AS feed_cycle_ok, true AS noop_cycle_ok
           |FROM (${Registry.duckMultisetFingerprint(oCols, "final")})""".stripMargin
      }),

    // JDBC hash pushdown (SURVEY §4 compute pushdown; reference
    // `TableConnection.php:46-51`): the per-row MD5 is computed INSIDE the
    // source database — only (key, 32-byte hash) crosses the wire. nation is
    // loaded into an embedded Derby DB (with [[graft.sync.DerbyDialect]]'s
    // registered MD5 — the adapter a real deployment registers for engines
    // lacking a hash builtin) and the pushed projection is returned verbatim;
    // the oracle recomputes the same md5 in DuckDB, proving the SERVER-side
    // canonicalization matches [[Hashing.rowHash]] byte-for-byte.
    Q("sync_jdbc_pushdown",
      (s, dir) => {
        val nation = T(s, dir, "nation")
        val cols = Seq("n_nationkey", "n_name", "n_regionkey")
        val url = "jdbc:derby:" + java.nio.file.Files
          .createTempDirectory("graft_push").toString + "/db;create=true"
        def sqlType(dt: org.apache.spark.sql.types.DataType) = dt match {
          case org.apache.spark.sql.types.LongType => "BIGINT"
          case org.apache.spark.sql.types.IntegerType => "INT"
          case org.apache.spark.sql.types.StringType => "VARCHAR(254)"
          case t => throw new IllegalArgumentException(s"unmapped JDBC type for $t")
        }
        // Pre-create with VARCHAR columns: Spark's Derby dialect would map
        // strings to CLOB, which Derby refuses to CAST/concatenate.
        val ddl = nation.schema.fields
          .map(f => s""""${f.name}" ${sqlType(f.dataType)}""")
          .mkString("""CREATE TABLE "nation" (""", ", ", ")")
        val c = java.sql.DriverManager.getConnection(url)
        try { val st = c.createStatement(); try st.execute(ddl) finally st.close() }
        finally c.close()
        DerbyDialect.installMd5(url)
        val store = new JdbcStore(s, url, hashPushdown = true,
          hashExprBuilder = Some(DerbyDialect.rowHashExpr))
        store.append("nation", nation)
        store.pushedHashMap("nation", Seq("n_nationkey"), cols).get
      },
      Some("SELECT n_nationkey, " +
        Registry.duckRowHash(Seq("n_nationkey", "n_name", "n_regionkey")) +
        " AS row_hash FROM nation"))
  )
}
