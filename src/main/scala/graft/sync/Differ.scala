package graft.sync

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The delta needed to converge slave → master.
  * `deletes`: key tuples to remove from slave (reference J2,
  * `Synchronizer.php:531-583`); `inserts`: full master rows to add (J1+J3,
  * `Synchronizer.php:446-524`). Application order is delete-then-insert —
  * an invariant, because an updated row appears in both sets (C7 guard,
  * `Synchronizer.php:495-501`).
  */
final case class Delta(deletes: DataFrame, inserts: DataFrame, keyCols: Seq[String]) {
  lazy val isEmpty: Boolean = deletes.isEmpty && inserts.isEmpty
}

/** Hash-based diff core (SURVEY §7.2 M2).
  *
  * Scale notes: each side is reduced to (key, row_hash) — a narrow projection
  * that parquet/JDBC scans prune to — then two anti-joins on `row_hash`.
  * Catalyst plans these as broadcast-hash when one side is small, else
  * sort-merge with AQE skew handling; nothing is collected to the driver.
  * The insert side re-reads only matching master rows via a semi-join whose
  * key list is usually tiny relative to the table (broadcast).
  */
object Differ {

  /** Reference-faithful diff: rows match if their *content hash* matches,
    * regardless of key (J1 note in SURVEY §2.3: an updated row shows up as
    * delete+insert; duplicate-content rows with distinct keys are NOT
    * distinguished — `NOT IN` set semantics). `legacyNullSkip` reproduces the
    * reference row-hash NULL bug when true.
    */
  def hashDiff(master: DataFrame, slave: DataFrame, keyCols: Seq[String],
               legacyNullSkip: Boolean = false): Delta = {
    val dataCols = master.columns.toSeq
    // Internal diff currency: the fast 128-bit raw-value hash pair (no
    // string canonicalization — ~3× cheaper per scan). The md5-canonical
    // path is kept for legacy reference semantics, where the NULL-skip
    // behavior itself is the point.
    val (mh, sh, hashCols) =
      if (legacyNullSkip)
        (Hashing.hashMap(master, keyCols, dataCols, legacyNullSkip = true),
         Hashing.hashMap(slave, keyCols, dataCols, legacyNullSkip = true),
         Seq("row_hash"))
      else
        (Hashing.fastHashMap(master, keyCols, dataCols),
         Hashing.fastHashMap(slave, keyCols, dataCols),
         Hashing.FastHashCols)
    // J2: slave rows whose content is absent from master → delete keys.
    // No distinct() on the right side: anti-join has existence semantics
    // already, and keeping both anti-joins' inputs as the SAME two plans
    // lets ReuseExchange compute each side's shuffle once when both legs
    // run in one action (see applyDelta's single tagged spill).
    val deletes = sh.join(mh.select(hashCols.map(col): _*), hashCols, "left_anti")
      .select(keyCols.map(col): _*)
    // J1: master rows whose content is absent from slave → keys to copy
    val missingKeys = mh.join(sh.select(hashCols.map(col): _*), hashCols, "left_anti")
      .select(keyCols.map(col): _*)
    // J3: keyed fetch of full rows. No broadcast hint on purpose: the key
    // list is usually tiny (AQE converts to broadcast at runtime), but on a
    // near-full resync it is table-sized and a forced broadcast would OOM
    // the driver.
    val inserts = master.join(missingKeys, keyCols, "left_semi")
    Delta(deletes, inserts, keyCols)
  }

  /** Key-aware diff — the correct-by-construction variant (SURVEY §2.3 J1
    * note): full-outer join on the key struct; a key present on both sides
    * with differing content hash is an update (delete+insert), master-only
    * keys are inserts, slave-only keys are deletes. Handles duplicate-content
    * rows the reference mishandles. One shuffle per side on the key columns.
    */
  def keyDiff(master: DataFrame, slave: DataFrame, keyCols: Seq[String]): Delta = {
    val dataCols = master.columns.toSeq
    def pair(df: DataFrame, p: String) =
      Hashing.fastHashMap(df, keyCols, dataCols)
        .withColumnRenamed("h1", s"${p}_h1").withColumnRenamed("h2", s"${p}_h2")
    val joined = pair(master, "m").join(pair(slave, "s"), keyCols, "full_outer").cache()
    val same = col("m_h1") <=> col("s_h1") && col("m_h2") <=> col("s_h2")
    val deletes = joined
      .filter(col("s_h1").isNotNull && !same)
      .select(keyCols.map(col): _*)
    val missingKeys = joined
      .filter(col("m_h1").isNotNull && !same)
      .select(keyCols.map(col): _*)
    val inserts = master.join(missingKeys, keyCols, "left_semi")
    Delta(deletes, inserts, keyCols)
  }

  /** Apply a delta to `table` in `store`: deletes first, then inserts (C7/C8).
    *
    * The delta is SPILLED to scratch parquet before any mutation — both its
    * legs are lazy plans over the slave's *current* files, which the delete
    * rewrite invalidates. This mirrors the reference's out-of-core hash side
    * tables (`main.php:27-59`): the materialized delta is the engine's
    * restart point, never driver memory.
    */
  /** @return (rows deleted, rows inserted) — counted from the spilled delta,
    *         so the diff plans execute exactly once.
    */
  def applyDelta(store: TableStore, table: String, delta: Delta): (Long, Long) = {
    // Delete-before-insert is mandatory: an update's key is in both sets, and
    // under partition sync a row may have moved partitions (Synchronizer.php:495-501).
    val delKeys = delta.deletes.union(delta.inserts.select(delta.keyCols.map(col): _*)).distinct()
    val scratch = java.nio.file.Files.createTempDirectory("graft_delta").toString
    val spark = delta.inserts.sparkSession
    try {
      // ONE tagged write job for both legs: the two anti-joins share their
      // hash-map children, so ReuseExchange computes each side's shuffle
      // once — two separate writes would scan and hash both tables twice.
      val tagged = delKeys.withColumn("__leg", lit("d"))
        .unionByName(delta.inserts.withColumn("__leg", lit("i")), allowMissingColumns = true)
      tagged.write.parquet(s"$scratch/delta")
      val spilled = spark.read.parquet(s"$scratch/delta")
      val spilledDeletes = spilled.filter(col("__leg") === "d")
        .select(delta.keyCols.map(col): _*)
      val spilledInserts = spilled.filter(col("__leg") === "i")
        .select(delta.inserts.columns.map(col).toSeq: _*)
      val (nDel, nIns) = (spilledDeletes.count(), spilledInserts.count())
      if (nDel > 0) store.deleteKeys(table, spilledDeletes, delta.keyCols)
      if (nIns > 0) store.append(table, spilledInserts)
      (nDel, nIns)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(scratch))
    }
  }
}
