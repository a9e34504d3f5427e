package graft

import graft.functions.Hashing
import graft.ops.{Layout, Manifest}
import org.apache.spark.sql.functions._

/** RESTORE: roll the live table back to a retained snapshot as a FORWARD
  * commit — trash-resident files revived by copy, extra live files retired,
  * history never rewritten, DML fully functional on the restored state.
  */
class RestoreSpec extends SparkSpec {

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private def fp(df: org.apache.spark.sql.DataFrame): String =
    Hashing.multisetFingerprintAgg(df.select(docCols.map(col): _*), docCols)
      .head().getString(0)

  test("restore rolls back across a COW delete + append; history intact; DML works after") {
    val dir = tmpDir("restore") + "/docs"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.repartitionByRange(6, col("doc_id")).write.parquet(dir)
    val id1 = Manifest.create(spark, dir, "doc_id")
    val fp1 = fp(spark.read.parquet(dir))
    Layout.deleteRange(spark, dir, "doc_id", 100L, 199L)          // snapshot 2
    docs.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .write.mode("append").parquet(dir)
    Manifest.createIncremental(spark, dir, "doc_id")              // snapshot 3
    val fp3 = fp(spark.read.parquet(dir))
    val r = Layout.restoreSnapshot(spark, dir, id1)               // snapshot 4
    assert(r.newSnapshotId == 4)
    assert(r.revived > 0, "the deleted range's files must come back from the trash")
    assert(r.retired > 0, "the appended files must be retired")
    assert(fp(spark.read.parquet(dir)) == fp1,
      "the live table must be exactly the target snapshot's content")
    // History is NEVER rewritten: the pre-restore state stays readable.
    assert(fp(Manifest.readAsOf(spark, dir, 3)) == fp3)
    assert(fp(Manifest.readAsOf(spark, dir, id1)) == fp1)
    assert(Manifest.isComplete(spark, dir))
    // Restore FORWARD to the pre-restore state — just another restore.
    val r2 = Layout.restoreSnapshot(spark, dir, 3)
    assert(fp(spark.read.parquet(dir)) == fp3 && r2.newSnapshotId == 5)
    // DML on a restored state: the revived files are ordinary live files.
    Layout.deleteRange(spark, dir, "doc_id", 0L, 4L)
    assert(spark.read.parquet(dir).count() ==
      docs.count() - 100L + 10L - 5L)
    // No-op restore (target == latest state): nothing moves.
    val id = Manifest.latestSnapshotId(spark, dir).get
    val r3 = Layout.restoreSnapshot(spark, dir, id)
    assert(r3.revived == 0 && r3.retired == 0 && r3.newSnapshotId == id)
  }

  test("partitioned restore: only changed partitions move; partition identity survives") {
    val dir = tmpDir("restore_part") + "/docs"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.write.partitionBy("lang").parquet(dir)
    val id1 = Manifest.create(spark, dir, "doc_id")
    val fp1 = fp(spark.read.parquet(dir))
    val lang = docs.select("lang").head().getString(0)
    Layout.dropPartition(spark, dir, "lang", lang)                // snapshot 2
    assert(fp(spark.read.parquet(dir)) != fp1)
    val r = Layout.restoreSnapshot(spark, dir, id1)               // snapshot 3
    assert(r.revived > 0 && r.retired == 0)
    assert(fp(spark.read.parquet(dir)) == fp1,
      "the dropped partition must be back, with its k=v identity")
    assert(spark.read.parquet(dir).filter(col("lang") === lang).count() ==
      docs.filter(col("lang") === lang).count())
    assert(Manifest.isComplete(spark, dir))
  }

  test("restore refusals: schema change, expired target, vacuumed files — all typed") {
    val dir = tmpDir("restore_bad") + "/docs"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.repartition(3).write.parquet(dir)
    val id1 = Manifest.create(spark, dir, "doc_id")
    Layout.deleteRange(spark, dir, "doc_id", 0L, 49L)             // snapshot 2
    // Schema change after the target: refused (restored files would decode
    // under the wrong read schema).
    Manifest.dropColumn(spark, dir, "source")                     // snapshot 3
    intercept[IllegalArgumentException] {
      Layout.restoreSnapshot(spark, dir, id1)
    }
    // Expired target: typed.
    intercept[Exception] { Layout.restoreSnapshot(spark, dir, 99) }
    // Vacuumed target files: typed StaleManifestException.
    Manifest.expireSnapshots(spark, dir, keep = 1)
    Manifest.vacuum(spark, dir)
    intercept[Exception] {
      Layout.restoreSnapshot(spark, dir, id1)
    }
  }

  test("compactPartition: one partition's small files compact; untouched partitions never move; flatten guarded") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = tmpDir("cpart") + "/docs"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    // Several files per partition (append debt inside each lang dir).
    docs.repartition(4).write.partitionBy("lang").parquet(dir)
    docs.withColumn("doc_id", col("doc_id") + 1000000L)
      .repartition(3).write.mode("append").partitionBy("lang").parquet(dir)
    Manifest.create(spark, dir, "doc_id")
    val preId = Manifest.latestSnapshotId(spark, dir).get
    val fpBefore = fp(spark.read.parquet(dir))
    val lang = docs.select("lang").head().getString(0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def filesIn(seg: String): Set[String] =
      graft.ops.FsMaint.listRelative(fs, new org.apache.hadoop.fs.Path(dir))(
        st => st.getPath.getName.startsWith("part-") && st.getLen > 0)
        .map(_._1).filter(r => !r.startsWith("_")).toSet
        .filter(r => (r.contains(s"lang=$lang/")) == (seg == "target"))
    val targetBefore = filesIn("target")
    val othersBefore = filesIn("others")
    assert(targetBefore.size > 1, "fixture needs append debt in the target")
    val written = spark.sql(
      s"CALL graft.system.compact_partition('$dir', 'lang', '$lang', 64)")
      .head().getLong(0)
    assert(written >= 1L && written < targetBefore.size)
    assert(filesIn("target").size == written.toInt)
    assert(filesIn("others") == othersBefore,
      "untouched partitions' files must not move")
    assert(fp(spark.read.parquet(dir)) == fpBefore, "content invariant")
    assert(Manifest.isComplete(spark, dir))
    // History survives: the pre-compaction snapshot reads the replaced
    // originals through the trash.
    assert(fp(Manifest.readAsOf(spark, dir, preId)) == fpBefore)
    // The STATEMENT surface refuses whole-table rewrites on a partitioned
    // table (they would flatten the layout — the Scala API's documented
    // deliberate-flatten contract stays available, see ManifestSpec).
    Seq(s"CALL graft.system.compact('$dir', 64)",
        s"CALL graft.system.zorder('$dir', 'doc_id,n_chars', 4)",
        s"CALL graft.system.cluster_range('$dir', 'doc_id', 4)")
      .foreach { stmt =>
        val e = intercept[Exception] { spark.sql(stmt).collect() }
        assert(e.getMessage.contains("FLATTEN"), s"$stmt -> ${e.getMessage}")
      }
    assert(fp(spark.read.parquet(dir)) == fpBefore)
  }

  test("tags: named refs resolve in VERSION AS OF and pin snapshots against expiry") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = tmpDir("tags") + "/docs"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.repartitionByRange(4, col("doc_id")).write.parquet(dir)
    val id1 = Manifest.create(spark, dir, "doc_id")
    val fp1 = fp(spark.read.parquet(dir))
    Layout.deleteRange(spark, dir, "doc_id", 0L, 99L)            // snapshot 2
    docs.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .write.mode("append").parquet(dir)
    Manifest.createIncremental(spark, dir, "doc_id")             // snapshot 3
    spark.sql(s"CALL graft.system.tag('$dir', 'baseline', $id1)")
    assert(Manifest.tags(spark, dir) == Map("baseline" -> id1))
    // Introspection: the $tags metadata table lists the ref.
    val tagRows = spark.sql(s"SELECT tag, snapshot FROM graft.`$dir$$tags`").collect()
    assert(tagRows.map(r => r.getString(0) -> r.getInt(1)).toSeq ==
      Seq("baseline" -> id1))
    // VERSION AS OF by NAME.
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'baseline'")) == fp1)
    // Retention pins the tagged snapshot: keep=1 drops only the untagged
    // middle snapshot.
    val expired = Manifest.expireSnapshots(spark, dir, keep = 1)
    assert(expired == 1, s"only the untagged snapshot-2 expires, got $expired")
    assert(Manifest.hasSnapshot(spark, dir, id1) && Manifest.hasSnapshot(spark, dir, 3))
    // Vacuum keeps the tagged snapshot's files reachable — it still reads.
    Manifest.vacuum(spark, dir)
    assert(fp(Manifest.readAsOf(spark, dir, id1)) == fp1)
    // Unknown tag / bad names: typed.
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'nope'").collect()
    }
    intercept[Exception] { Manifest.tag(spark, dir, "has space", id1) }
    intercept[Exception] { Manifest.tag(spark, dir, "7", id1) } // shadows an id
    // `__tmp` would alias another tag's staging file (tag "x" stages at
    // tag-x__tmp) — reserved suffix, refused on every tag entry point.
    intercept[Exception] { Manifest.tag(spark, dir, "baseline__tmp", id1) }
    intercept[Exception] { Manifest.dropTag(spark, dir, "baseline__tmp") }
    // Drop the tag: the next retention pass expires the snapshot.
    assert(spark.sql(s"CALL graft.system.drop_tag('$dir', 'baseline')")
      .head().getLong(0) == 1L)
    assert(Manifest.expireSnapshots(spark, dir, keep = 1) == 1)
    assert(!Manifest.hasSnapshot(spark, dir, id1))
  }

  test("restore on a scheme-qualified table root still revives trash files") {
    // Regression: trash membership was decided by a string-prefix compare of
    // Path.toString (scheme-preserving) against toUri.getPath
    // (scheme-stripping) — on any `file:/`- or `s3a://`-rooted table nothing
    // matched and restore silently revived zero files. The resolver now
    // carries an explicit in-trash flag instead.
    val dir = "file:" + tmpDir("restore_scheme") + "/docs"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.repartitionByRange(6, col("doc_id")).write.parquet(dir)
    val id1 = Manifest.create(spark, dir, "doc_id")
    val fp1 = fp(spark.read.parquet(dir))
    Layout.deleteRange(spark, dir, "doc_id", 100L, 199L)          // snapshot 2
    val r = Layout.restoreSnapshot(spark, dir, id1)
    assert(r.revived > 0,
      "scheme-qualified root: trash-resident files must be classified revivable")
    assert(fp(spark.read.parquet(dir)) == fp1)
    assert(Manifest.isComplete(spark, dir))
  }

  test("CALL graft.system.restore: the SQL surface of the rollback") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = tmpDir("restore_sql") + "/docs"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.repartitionByRange(4, col("doc_id")).write.parquet(dir)
    val id1 = Manifest.create(spark, dir, "doc_id")
    val fp1 = fp(spark.read.parquet(dir))
    spark.sql(s"DELETE FROM graft.`$dir` WHERE doc_id BETWEEN 50 AND 149")
    val changed = spark.sql(
      s"CALL graft.system.restore('$dir', $id1)").head().getLong(0)
    assert(changed > 0L)
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir`")) == fp1)
  }
}
