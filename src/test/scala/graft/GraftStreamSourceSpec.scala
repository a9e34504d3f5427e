package graft

import graft.functions.Hashing
import graft.ops.{Layout, Manifest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The NATIVE streaming source over the table format:
  * `spark.readStream.format("graft")` rides snapshot history with its own
  * checkpointed snapshot cursor — load-then-stream, exactly-once row
  * delivery across appends AND a mid-stream compaction (which rewrites
  * every file), nothing re-delivered on an idle restart.
  */
class GraftStreamSourceSpec extends SparkSpec {

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private def fp(df: org.apache.spark.sql.DataFrame): String =
    Hashing.multisetFingerprintAgg(df.select(docCols.map(col): _*), docCols)
      .head().getString(0)

  test("readStream(graft): snapshot-cursor stream is exactly-once across appends and compaction") {
    val dir = tmpDir("gstream") + "/documents"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.filter(col("doc_id") % 3 =!= 0).repartition(4).write.parquet(dir)
    Manifest.create(spark, dir, "doc_id")
    val ckpt = tmpDir("gstream_ckpt")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    var runs = 0
    def runOnce(): Unit = {
      runs += 1
      val q = spark.readStream.format("graft").load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(got.add(_): Unit)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // Run 1: the full latest snapshot (load-then-stream).
    runOnce()
    val nSubset = docs.filter(col("doc_id") % 3 =!= 0).count()
    assert(got.size.toLong == nSubset, s"initial load: got ${got.size}, want $nSubset")
    // Append the rest (incremental snapshot), then COMPACT — every file is
    // rewritten; a file-diff source would re-deliver the whole table here.
    docs.filter(col("doc_id") % 3 === 0).repartition(2)
      .write.mode("append").parquet(dir)
    Manifest.createIncremental(spark, dir, "doc_id")
    Layout.compactTable(spark, dir, targetBytes = 64L << 20)
    // Run 2 (fresh query, same checkpoint): ONLY the appended rows arrive.
    runOnce()
    assert(got.size.toLong == docs.count(),
      s"after append+compaction: got ${got.size}, want ${docs.count()} — " +
        "re-delivery across a content-invariant rewrite breaks exactly-once")
    // Run 3: nothing new — idle restart delivers zero rows.
    runOnce()
    assert(got.size.toLong == docs.count(), "idle restart must deliver nothing")
    // Value-exact: the accumulated stream IS the table, each row once.
    import scala.jdk.CollectionConverters._
    val accumulated = spark.createDataFrame(
      new java.util.ArrayList(got), spark.read.parquet(dir).schema)
    assert(fp(accumulated) == fp(docs), "accumulated stream must equal the table")
  }

  test("readStream(graft): an unmanifested table fails typed at stream start") {
    val dir = tmpDir("gstream_bad") + "/documents"
    spark.read.parquet(s"$sf001/documents.parquet").limit(10).write.parquet(dir)
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft").load(dir)
    }
  }
}
