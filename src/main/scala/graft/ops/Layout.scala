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
}
