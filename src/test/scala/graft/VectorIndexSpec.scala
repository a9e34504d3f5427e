package graft

import graft.ops.{Similarity, VectorIndex}
import org.apache.spark.sql.functions._

/** Persisted IVF index lifecycle: build → append (assign-only) → search,
  * with the partition-pruning property pinned on the executed plan.
  */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val clones = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 10000L).as("vec_id"),
        transform($"embedding", (x, i) => when(i === 0, x * 1.01f).otherwise(x)).as("embedding"))
    val base = emb.filter($"vec_id" >= 3).select("vec_id", "embedding")
    (q, base, clones)
  }

  test("build + search: clones appended after build are still found; recall holds") {
    val (q, base, clones) = fixture()
    val dir = tmpDir("vecindex")
    VectorIndex.build(base, dir, nCells = 8)
    VectorIndex.append(clones, dir) // the incremental path: saved centroids, no re-train
    val corpus = base.unionByName(clones)
    val exact = Similarity.bruteForceTopK(q, corpus, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorIndex.search(q, dir, k = 10, nProbe = 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (qid <- 0L to 2L)
      assert(approx.contains((qid, qid + 10000L)), s"appended clone of $qid not found")
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"persisted-IVF recall@10 too low: $recall")
  }

  test("append writes only the touched cells; build output is cell-partitioned") {
    val (_, base, clones) = fixture()
    val dir = tmpDir("vecindex_append")
    VectorIndex.build(base, dir, nCells = 8)
    def cellDirs() = new java.io.File(s"$dir/vectors").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName).toSet
    def filesIn(cell: String) = new java.io.File(s"$dir/vectors/$cell").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = cellDirs().map(c => c -> filesIn(c)).toMap
    assert(before.nonEmpty, "build must produce cell=<i> directories")
    VectorIndex.append(clones, dir)
    val after = cellDirs().map(c => c -> filesIn(c)).toMap
    // 3 near-identical-to-query clones land in <= 3 cells; every other cell's
    // files are untouched (append cost ∝ new data, not table size)
    val touched = after.filter { case (c, n) => n != before.getOrElse(c, 0) }.keySet
    assert(touched.nonEmpty && touched.size <= 3, s"touched cells: $touched")
  }

  test("compact: shrinks append debt, keeps cell partitioning and results") {
    val (q, base, clones) = fixture()
    val dir = tmpDir("vecindex_compact")
    VectorIndex.build(base, dir, nCells = 8)
    // accrete small-file debt the way a feed would: one append per clone
    clones.collect().zipWithIndex.foreach { case (_, i) =>
      VectorIndex.append(clones.filter($"vec_id" === 10000L + i), dir)
    }
    val fs = new org.apache.hadoop.fs.Path(s"$dir/vectors")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val before = graft.ops.FsMaint.dataFileCount(fs,
      new org.apache.hadoop.fs.Path(s"$dir/vectors"))
    val resBefore = VectorIndex.search(q, dir, k = 10, nProbe = 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // metadata-only policy: a generous cap is a no-op, a tight one fires
    assert(!VectorIndex.compactIfNeeded(spark, dir, maxDataFiles = before + 10))
    assert(VectorIndex.dataFiles(spark, dir) == before, "no-op must not rewrite")
    assert(VectorIndex.compactIfNeeded(spark, dir, maxDataFiles = before - 1,
      targetBytes = 64L << 20))
    val after = VectorIndex.dataFiles(spark, dir)
    assert(after < before, s"compaction must shrink files: $before -> $after")
    // hive layout preserved: still cell=<i> dirs, search results identical
    assert(new java.io.File(s"$dir/vectors").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("cell=")))
    val resAfter = VectorIndex.search(q, dir, k = 10, nProbe = 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(resAfter == resBefore, "compaction changed search results")
  }

  test("search plans only the probed cell partitions (PartitionFilters)") {
    val (q, base, clones) = fixture()
    val dir = tmpDir("vecindex_prune")
    VectorIndex.build(base, dir, nCells = 8)
    VectorIndex.append(clones, dir)
    val fs = new org.apache.hadoop.fs.Path(s"$dir/vectors")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val total = graft.ops.FsMaint.dataFileCount(fs, new org.apache.hadoop.fs.Path(s"$dir/vectors"))
    val res = VectorIndex.search(q, dir, k = 10, nProbe = 2)
    res.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // this plan has exchanges, so after execution the scans live inside AQE
    // query stages — leaf nodes whose subplan hangs off .plan, not .children
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case r: ReusedExchangeExec => scans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val vecScans = scans(res.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("vecindex_prune")))
    assert(vecScans.nonEmpty, "expected a scan over the index's vectors dir")
    val planned = vecScans.map(_.metrics("numFiles").value).sum
    // 3 queries × 2 probes bound the union at 6 of 8 cells; near-orthogonal
    // noise queries rarely share all probes — require strict pruning.
    assert(planned < total, s"planned $planned of $total files — no pruning")
    assert(vecScans.head.toString.contains("PartitionFilters"),
      vecScans.head.toString.linesIterator.take(6).mkString("\n"))
  }
}
