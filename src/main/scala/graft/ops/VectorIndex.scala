package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF vector index — the index LIFECYCLE the in-query ANN ops
  * (`Similarity.ivfTopK` and friends) deliberately skip: at corpus scale an
  * index is built once, appended to incrementally as new embeddings arrive,
  * and queried many times, so the coarse quantizer must be durable state,
  * not a per-query recomputation.
  *
  * On-disk layout under `dir`:
  * {{{
  *   centroids/            one row per cell: (cell int, centroid array<double>)
  *   vectors/cell=<i>/     the corpus, hive-partitioned by nearest cell
  * }}}
  *
  * The partition-by-cell layout is the point: a search probing `nProbe` of
  * `nCells` cells reads ONLY those directories (planning-time partition
  * pruning — the same mechanism `Layout.partitionByColumn` demonstrates for
  * key filters), so query IO is `nProbe/nCells` of the corpus no matter how
  * large the table grows. [[append]] assigns new vectors against the SAVED
  * centroids (no re-clustering — FAISS's `add` vs `train` split): an
  * append-only embedding feed costs O(new vectors) per batch, and drifted
  * cells are rebalanced by re-running [[build]], not by every ingest.
  */
object VectorIndex {

  private def centroidsDir(dir: String) = s"$dir/centroids"
  private def vectorsDir(dir: String) = s"$dir/vectors"

  /** Train the coarse quantizer on `corpus` and materialize the index:
    * centroids + the corpus hive-partitioned by nearest cell. Overwrites any
    * existing index at `dir`.
    */
  def build(corpus: DataFrame, dir: String, nCells: Int = 16, iters: Int = 2,
            idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Similarity.ivfCentroids(corpus, nCells, iters, idCol, vecCol)
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1) // nCells rows — one driver-sized file
      .write.mode(SaveMode.Overwrite).parquet(centroidsDir(dir))
    Par.fanOut(corpus)
      .withColumn("cell", Similarity.nearestCell(col(vecCol), cents))
      .select(col("cell"), col(idCol), col(vecCol))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(vectorsDir(dir))
  }

  /** Saved coarse quantizer, cell-ordered — nCells × dim doubles, the
    * bounded driver/broadcast state of every IVF operation.
    */
  def centroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.read.parquet(centroidsDir(dir))
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)

  /** Assign `newVecs` to their nearest SAVED cells and append them to the
    * partitioned corpus — O(|newVecs|), no re-clustering, no rewrite of
    * existing partitions (each append adds files only under the cells it
    * touches).
    */
  def append(newVecs: DataFrame, dir: String,
             idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val cents = centroids(newVecs.sparkSession, dir)
    newVecs
      .withColumn("cell", Similarity.nearestCell(col(vecCol), cents))
      .select(col("cell"), col(idCol), col(vecCol))
      .write.mode(SaveMode.Append).partitionBy("cell").parquet(vectorsDir(dir))
  }

  /** Compact the appended corpus back to ≈`targetBytes` files while
    * PRESERVING the cell partitioning — the maintenance rung of the index
    * lifecycle (every [[append]] adds at least one file per touched cell,
    * so a long-running feed accretes exactly the small-file debt
    * [[Layout.compactTable]] exists for, but a flat rewrite would destroy
    * the partition pruning [[search]] depends on). One range-partitioning
    * shuffle on (cell, id): contiguous cells share a task, oversized cells
    * split across tasks by id — files ≈ ceil(bytes/target) regardless of
    * how skewed the cell sizes are. Committed with the same crash-safe
    * two-rename swap as the layout jobs. Returns the data-file count after.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
              idCol: String = "vec_id"): Long = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val vdir = vectorsDir(dir)
    val p = new org.apache.hadoop.fs.Path(vdir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    FsMaint.recoverSwap(fs, vdir)
    val total = FsMaint.totalDataBytes(fs, p)
    val nFiles = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val tmp = vdir + "__compacting"
    spark.read.parquet(vdir)
      .repartitionByRange(nFiles, col("cell"), col(idCol))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(tmp)
    FsMaint.swapIn(fs, vdir, tmp)
    FsMaint.dataFileCount(fs, p)
  }

  /** Policy-triggered [[compact]]: fire when the appended small-file count
    * passes `maxDataFiles` — a METADATA-only signal (one file listing, no
    * data read), so a recurring ingest loop can call this every batch and
    * self-maintain, the [[DedupIndex.compactIfNeeded]] pattern. Returns
    * whether a compaction ran.
    */
  def compactIfNeeded(spark: SparkSession, dir: String, maxDataFiles: Long,
                      targetBytes: Long = 128L << 20,
                      idCol: String = "vec_id"): Boolean = {
    val p = new org.apache.hadoop.fs.Path(vectorsDir(dir))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val n = FsMaint.dataFileCount(fs, p)
    if (n > maxDataFiles) { compact(spark, dir, targetBytes, idCol); true }
    else false
  }

  /** Count of data files currently backing the index's corpus — the same
    * metadata-only signal [[compactIfNeeded]] reads, exposed so callers can
    * set scale-robust policies (e.g. `built + k` after [[build]]).
    */
  def dataFiles(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(vectorsDir(dir))
    FsMaint.dataFileCount(p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** IVF top-k against the saved index: each query probes its `nProbe`
    * nearest saved cells and re-ranks exactly within them. The vectors scan
    * is filtered to the UNION of probed cells with a literal IN over the
    * partition column, so pruning happens at planning time — unprobed cell
    * directories are never listed into the scan. The probe set collected on
    * the driver is bounded by |queries| × nProbe cell ids (and |queries| is
    * the broadcast-small side by contract, as in every top-k op here).
    */
  def search(queries: DataFrame, dir: String, k: Int, nProbe: Int = 4,
             qIdCol: String = "q_id", qVecCol: String = "q_vec",
             cIdCol: String = "vec_id", cVecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val cents = centroids(spark, dir)
    val probes = queries.withColumn("cell",
      explode(graft.functions.VectorExpressions
        .top_cells(col(qVecCol), cents.map(l2normalize), nProbe)))
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted // ≤ |queries| × nProbe ids
    val vectors = spark.read.parquet(vectorsDir(dir))
      .filter(col("cell").isInCollection(probedCells.toIndexedSeq))
    val cands = vectors.join(broadcast(probes), Seq("cell"))
      .select(col(qIdCol), col(qVecCol), col(cIdCol), col(cVecCol))
      .dropDuplicates(qIdCol, cIdCol)
    Similarity.finishTopK(
      cands.select(col(qIdCol), col(cIdCol),
        Similarity.cosine(col(qVecCol), col(cVecCol)).as("sim")),
      k, qIdCol, cIdCol)
  }

  private def l2normalize(c: Array[Double]): Array[Double] = {
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0) c else c.map(_ / n)
  }
}
