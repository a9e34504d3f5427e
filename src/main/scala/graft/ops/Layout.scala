package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table-layout maintenance jobs — the storage-side half of running a
  * pipeline for years: recurring ingests and deltas accumulate small files
  * (every append is ≥1 file per writer task) and destroy clustering, and at
  * 100 TB the resulting file-count explosion throttles the DRIVER (listing,
  * split planning, footer reads), not the executors. Both jobs rewrite a
  * parquet dir and atomically swap the rewrite in via [[FsMaint]]'s
  * two-rename contract, so concurrent readers never observe a half-written
  * store and a crash at any point is healed on the next run.
  *
  * Content invariance is the correctness contract: both rewrites are pure
  * re-layouts, so the table's multiset fingerprint before ≡ after — gated
  * against the DuckDB oracle by the `layout_*` queries.
  */
object Layout {

  /** Rewrite the parquet dir at `path` into ≈`targetBytes`-sized files
    * (small-file compaction). Returns the file count written. The rewrite
    * is one distributed pass: a round-robin repartition to
    * ceil(totalBytes / targetBytes) tasks — no keys, no sort, shuffle
    * carries each row once.
    *
    * Sizing note: the estimate uses the CURRENT (compressed, encoded)
    * on-disk bytes, the right proxy for the rewrite since the same codec
    * re-encodes it; real deployments also bound files-per-task memory via
    * `maxRecordsPerFile` when rows are huge.
    */
  def compactTable(spark: SparkSession, path: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    FsMaint.recoverSwap(fs, path)
    val total = FsMaint.totalDataBytes(fs, new Path(path))
    val nFiles = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val tmp = path + "__compacting"
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp)
    FsMaint.swapIn(fs, path, tmp)
    nFiles
  }

  /** Rewrite the parquet dir at `path` range-clustered by `clusterCol` into
    * `nFiles` files (each file owns a contiguous, pairwise-disjoint key
    * range, rows sorted within the file) — the single-dimension form of the
    * OPTIMIZE/Z-ORDER layout job. What it buys at scale: row-group min/max
    * statistics on `clusterCol` become DISJOINT across files, so a pushed
    * point/range predicate lets the parquet reader skip every row group
    * outside the overlapping range — decode work proportional to
    * selectivity. (Vanilla Spark still PLANS all files; file-level skipping
    * from these same stats is the extra step a manifest-based table format
    * — Delta/Iceberg-style — adds on top of exactly this layout.)
    *
    * One range-partitioning shuffle (sampled boundaries) + an in-task sort;
    * no driver-sized state.
    */
  def clusterByRange(spark: SparkSession, path: String, clusterCol: String,
                     nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive: $nFiles")
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    FsMaint.recoverSwap(fs, path)
    val tmp = path + "__compacting"
    spark.read.parquet(path)
      .repartitionByRange(nFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(tmp)
    FsMaint.swapIn(fs, path, tmp)
  }

  /** Per-file [min, max] spans of `keyCol` for the parquet dir at `path`,
    * sorted by min — the clustering-quality probe ([[clusterByRange]]'s
    * post-condition: spans pairwise disjoint). One scan of the key column.
    */
  def fileSpans(spark: SparkSession, path: String, keyCol: String): Seq[(Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

  /** Morton (Z-order) value of two long columns, each min-max normalized to
    * 16 bits and bit-interleaved (a on even positions, b on odd) — pure
    * integer arithmetic on built-in expressions, fully codegen'd, no UDF.
    * Degenerate ranges (lo == hi) normalize to 0.
    */
  def zValue(a: org.apache.spark.sql.Column, aLo: Long, aHi: Long,
             b: org.apache.spark.sql.Column, bLo: Long, bHi: Long): org.apache.spark.sql.Column = {
    // Normalize in double BEFORE scaling: (c - lo) * 65535 in long would
    // overflow for wide domains (e.g. epoch-micros keys) under ANSI mode;
    // double precision loss only perturbs rank granularity, not layout
    // correctness.
    def norm(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      if (hi > lo) (c - lit(lo)).cast("double") / lit((hi - lo).toDouble) * lit(65535.0)
      else lit(0.0)
    val au = norm(a, aLo, aHi).cast("long")
    val bu = norm(b, bLo, bHi).cast("long")
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(au, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bu, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Rewrite the parquet dir at `path` Z-ORDER clustered by two long
    * columns into `nFiles` files: rows are range-partitioned and sorted on
    * the Morton interleave of the two normalized keys, so each file covers
    * a compact REGION of the (a, b) plane — per-file min/max spans shrink
    * on BOTH dimensions simultaneously (≈ √(files)-way on each axis for
    * balanced data), where a 1-D sort collapses one dimension and leaves
    * the other spanning the whole range. The multi-predicate form of
    * [[clusterByRange]]'s skipping story; same row-group/table-format
    * caveat. The z column is transient — computed for the shuffle+sort,
    * dropped before the write, so content invariance holds by
    * construction.
    *
    * Cost: one narrow min/max pass (bounds for normalization) + one
    * range-partitioning shuffle + in-task sort.
    */
  def clusterByZOrder(spark: SparkSession, path: String, colA: String, colB: String,
                      nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive: $nFiles")
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    FsMaint.recoverSwap(fs, path)
    val df = spark.read.parquet(path)
    val bounds = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    val z = zValue(col(colA).cast("long"), bounds.getLong(0), bounds.getLong(1),
                   col(colB).cast("long"), bounds.getLong(2), bounds.getLong(3))
    val tmp = path + "__compacting"
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(tmp)
    FsMaint.swapIn(fs, path, tmp)
  }

  /** Rewrite the parquet dir at `path` hive-partitioned by `partCol`
    * (`…/partCol=value/` dirs) — the layout for CATEGORICAL predicates,
    * complementing the range/Z-order rewrites' numeric spans: an equality
    * filter on `partCol` prunes whole directories at PLANNING time
    * (`PartitionFilters` — the scan never lists, opens, or footer-reads
    * the other partitions' files, unlike row-group stats which every
    * planned file still pays). Same atomic swap contract.
    */
  def partitionByColumn(spark: SparkSession, path: String, partCol: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    FsMaint.recoverSwap(fs, path)
    val tmp = path + "__compacting"
    spark.read.parquet(path)
      .repartition(col(partCol)) // one file per partition value per write
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp)
    FsMaint.swapIn(fs, path, tmp)
  }

  /** Mean per-file normalized span of `keyCol` (span / global range, 0..1)
    * — the clustering-quality metric: ≈1 means every file spans the whole
    * domain (no skipping possible), small means predicates on `keyCol`
    * overlap few files' row groups. One scan of the key column.
    */
  def meanNormalizedSpan(spark: SparkSession, path: String, keyCol: String): Double = {
    val rows = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(keyCol).cast("long")).as("lo"), max(col(keyCol).cast("long")).as("hi"))
      .agg(avg(col("hi") - col("lo")).as("meanSpan"),
        (max(col("hi")) - min(col("lo"))).cast("double").as("range")).head()
    if (rows.getDouble(1) <= 0) 0.0 else rows.getDouble(0) / rows.getDouble(1)
  }
}
