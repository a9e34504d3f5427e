package graft

import graft.functions.Hashing
import graft.ops.Manifest
import graft.sources.{GraftDescriptorFileIndex, GraftParquetTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.datasources.PartitionSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Descriptor plan handoff: the manifest records each file's exact byte
  * length (`n_bytes`, from `_metadata.file_size` — zero extra RPCs), so
  * the SQL catalog's scan builds its file index from snapshot DESCRIPTORS
  * alone. The driver materializes one FileStatus per file without any
  * filesystem listing — the 100×-scale planning posture (Iceberg-style):
  * the distributed pruning's output IS the scan's partition listing.
  */
class DescriptorPlanSpec extends SparkSpec {

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private def fp(df: org.apache.spark.sql.DataFrame): String =
    Hashing.multisetFingerprintAgg(df.select(docCols.map(col): _*), docCols)
      .head().getString(0)

  test("a 100k-file index plans from descriptors alone — the files need not even exist") {
    // None of these files exist; any filesystem access would throw or list
    // nothing. The index must still materialize every FileStatus with the
    // exact declared length (what the planner packs into partitions).
    val n = 100000
    val entries = (0 until n).map(i =>
      new Path(s"/nonexistent/graft_plan_spec/part-$i.parquet") -> (1000L + i))
    val t0 = System.nanoTime()
    val idx = new GraftDescriptorFileIndex(spark, entries, PartitionSpec.emptySpec)
    val files = idx.allFiles()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(files.length == n)
    assert(files.map(_.getLen).sum == entries.map(_._2).sum)
    // Planning 100k descriptors is driver-memory work, not IO: sub-seconds,
    // where 100k per-file existence probes would take minutes.
    assert(sec < 10.0, f"descriptor planning took $sec%.1fs")
    // The partition listing the planner consumes resolves too.
    val parts = idx.listFiles(Nil, Nil)
    assert(parts.map(_.files.length).sum == n)
  }

  test("the catalog's scan uses descriptor planning and stays exact (incl. after COW + appends)") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = tmpDir("descplan") + "/docs"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.repartitionByRange(6, col("doc_id")).write.parquet(dir)
    Manifest.create(spark, dir, "doc_id")
    // The snapshot records exact byte lengths for every file.
    val snap = Manifest.files(spark, dir)
    assert(snap.columns.contains("n_bytes"))
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val byName = snap.select("file", "n_bytes").collect()
      .map(r => Manifest.decodePath(r.getString(0)).getName -> r.getLong(1)).toMap
    fs.listStatus(new Path(dir)).filter(_.getPath.getName.startsWith("part-"))
      .foreach { st =>
        assert(byName(st.getPath.getName) == st.getLen,
          s"recorded n_bytes must be the exact file length: ${st.getPath}")
      }
    // A table built over those descriptors serves the IDENTICAL content
    // through the stock vectorized scan (footers located by the recorded
    // length — exactness is load-bearing).
    val files = Manifest.snapshotFiles(spark, dir,
      Manifest.latestSnapshotId(spark, dir).get)
    val t = new GraftParquetTable("descplan_t", spark,
      CaseInsensitiveStringMap.empty(), files, dir, None, Some(byName))
    assert(t.fileIndex.isInstanceOf[GraftDescriptorFileIndex],
      "full n_bytes coverage must select the descriptor index")
    // Catalog SELECT (same machinery end to end) matches the direct read.
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir`")) ==
      fp(spark.read.parquet(dir)))
    // Descriptors stay exact across a COW delete + append + incremental
    // refresh (carried rows keep their n_bytes, fresh files record theirs).
    spark.sql(s"DELETE FROM graft.`$dir` WHERE doc_id BETWEEN 100 AND 199")
    docs.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .write.mode("append").parquet(dir)
    Manifest.createIncremental(spark, dir, "doc_id")
    val expected = fp(spark.read.parquet(dir))
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir`")) == expected)
    val snap2 = Manifest.files(spark, dir).select("file", "n_bytes").collect()
    assert(snap2.forall(!_.isNullAt(1)),
      "every carried and fresh file must keep an exact n_bytes")
  }

  test("partitioned descriptors: colliding part names across k=v dirs keep their own lengths") {
    // One partitionBy write emits part-00000-<uuid>.parquet into EVERY
    // partition dir its task touched — file NAMES are not table-unique.
    // Round 17's name-keyed descriptor map handed one partition's byte
    // length to another's file, and a parquet scan bounded by a too-small
    // length silently reads ZERO row groups (row groups plan by
    // midpoint-in-[0, length)) — the catalog dropped whole files' rows
    // with requireComplete still green. Keyed by relative path, every
    // file keeps its own exact length and the catalog read is exact.
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = tmpDir("descr_partcollide") + "/documents"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    // coalesce(1): ONE task writes every partition dir → every dir holds a
    // part-00000-<uuid> of a DIFFERENT length — maximal name collision.
    docs.coalesce(1).write.partitionBy("lang").parquet(dir)
    Manifest.create(spark, dir, "doc_id")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val names = fs.listStatus(new Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("lang="))
      .flatMap(d => fs.listStatus(d.getPath)).filter(_.isFile)
      .map(_.getPath.getName).toSeq
    assert(names.distinct.size < names.size,
      s"fixture must produce colliding names, got ${names.mkString(", ")}")
    val served = spark.sql(s"SELECT * FROM graft.`$dir`")
    // Descriptor planning (not the listing fallback) must be in effect.
    def scanIndexes(p: org.apache.spark.sql.execution.SparkPlan): Seq[Any] = p match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f.relation.location)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case fs: org.apache.spark.sql.execution.datasources.v2.FileScan => Seq(fs.fileIndex)
          case _ => Nil
        }
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scanIndexes(a.executedPlan)
      case other => other.children.flatMap(scanIndexes)
    }
    val idxs = scanIndexes(served.queryExecution.executedPlan)
    assert(idxs.exists(_.isInstanceOf[GraftDescriptorFileIndex]),
      s"expected descriptor planning, saw: ${idxs.map(_.getClass.getSimpleName)}")
    assert(served.count() == docs.count())
    assert(fp(served) == fp(docs))
  }
}
