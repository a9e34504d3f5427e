package graft

import graft.functions.Hashing
import graft.ops.{Layout, Manifest}
import org.apache.spark.sql.functions._

/** The public `spark.read.format("graft")` surface: latest-snapshot reads,
  * time travel (`snapshotId`), the change feed (`changesFrom`/`changesTo`),
  * typed failures passing through, and pushed range filters becoming
  * FILE-level skipping via the manifest box scan.
  */
class GraftSourceSpec extends SparkSpec {

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private def fp(df: org.apache.spark.sql.DataFrame): String =
    Hashing.multisetFingerprintAgg(df.select(docCols.map(col): _*), docCols)
      .head().getString(0)

  private def stage(tag: String): String = {
    val dir = tmpDir(tag) + "/documents"
    spark.read.parquet(s"$sf001/documents.parquet")
      .repartition(16).write.parquet(dir)
    Layout.clusterByRange(spark, dir, "doc_id", 8)
    dir
  }

  test("latest / snapshotId / changes reads match the Scala API exactly") {
    val dir = stage("gsrc_basic")
    val id1 = Manifest.create(spark, dir, "doc_id")
    Layout.deleteRange(spark, dir, "doc_id", 0L, 49L)
    val id2 = Manifest.latestSnapshotId(spark, dir).get
    // latest == no option
    assert(fp(spark.read.format("graft").load(dir)) ==
      fp(Manifest.readAsOf(spark, dir, id2)))
    // time travel
    assert(fp(spark.read.format("graft").option("snapshotId", id1).load(dir)) ==
      fp(Manifest.readAsOf(spark, dir, id1)))
    // change feed (schema carries the change tag)
    val feed = spark.read.format("graft")
      .option("changesFrom", id1).option("changesTo", id2).load(dir)
    assert(feed.columns.contains("change"))
    assert(feed.filter(col("change") === "delete").count() == 50L)
    assert(feed.filter(col("change") === "insert").count() == 0L)
  }

  test("typed failures pass through the source surface") {
    val dir = stage("gsrc_typed")
    val id1 = Manifest.create(spark, dir, "doc_id")
    intercept[IllegalArgumentException] { // expired/unknown snapshot
      spark.read.format("graft").option("snapshotId", 99).load(dir)
    }
    intercept[IllegalArgumentException] { // reversed feed endpoints
      spark.read.format("graft")
        .option("changesFrom", id1 + 1).option("changesTo", id1).load(dir)
    }
    intercept[IllegalArgumentException] { // half a feed spec
      spark.read.format("graft").option("changesFrom", id1).load(dir)
    }
    intercept[IllegalArgumentException] { // unmanifested dir, latest mode
      spark.read.format("graft").load(tmpDir("gsrc_none"))
    }
  }

  test("pushed range filters become FILE-level skipping (manifest box scan), results exact") {
    val dir = stage("gsrc_push")
    Manifest.create(spark, dir, "doc_id")
    val q = spark.read.format("graft").load(dir)
      .filter(col("doc_id").between(100L, 150L))
    // Exactness first.
    graft.sources.GraftRelation.lastScanEvidence = None
    assert(q.count() == 51L)
    assert(fp(q) == fp(spark.read.parquet(dir)
      .filter(col("doc_id").between(100L, 150L))))
    // Skipping evidence: the scan routed through the manifest box scan and
    // planned a strict subset of the 8 range-clustered files.
    graft.sources.GraftRelation.lastScanEvidence match {
      case Some((nRead, nTotal)) =>
        assert(nRead >= 1 && nRead < nTotal && nTotal == 8,
          s"expected a strict-subset box scan, got $nRead of $nTotal")
      case None => fail("pushed range filter never reached the box scan")
    }
    // A filter on a NON-stats column must fall through (no box routing),
    // still exact.
    graft.sources.GraftRelation.lastScanEvidence = None
    val q2 = spark.read.format("graft").load(dir)
      .filter(col("lang") === "en")
    assert(q2.count() ==
      spark.read.parquet(dir).filter(col("lang") === "en").count())
    assert(graft.sources.GraftRelation.lastScanEvidence.isEmpty)
  }

  test("SQL catalog: VERSION AS OF reads snapshots through plain SQL") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = stage("gsql_tt")
    val id1 = Manifest.create(spark, dir, "doc_id")
    Layout.deleteRange(spark, dir, "doc_id", 0L, 49L)
    val id2 = Manifest.latestSnapshotId(spark, dir).get
    // latest
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir`")) ==
      fp(Manifest.readAsOf(spark, dir, id2)))
    // time travel via SQL
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF $id1")) ==
      fp(Manifest.readAsOf(spark, dir, id1)))
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft.`$dir` VERSION AS OF $id1 " +
        "WHERE doc_id < 50").head().getLong(0) == 50L)
    // unsupported DDL is refused loudly (DROP/CREATE/DML are wired; RENAME
    // and ALTER are layout/profile concerns, not SQL DDL)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` RENAME TO graft.`${dir}2`")
    }
    // a timestamp before any retained commit fails typed
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir` TIMESTAMP AS OF '2000-01-01'").collect()
    }
  }

  test("SQL catalog: TIMESTAMP AS OF resolves by commit time (snapshot dir mtime)") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = stage("gsql_ts")
    Manifest.create(spark, dir, "doc_id")
    val n1 = spark.read.parquet(dir).count()
    Thread.sleep(1200) // FS mtime granularity margin around the midpoint
    val mid = java.time.Instant.ofEpochMilli(System.currentTimeMillis())
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    Thread.sleep(1200)
    Layout.deleteRange(spark, dir, "doc_id", 0L, 49L)
    Thread.sleep(50) // commit mtime strictly before the "after" literal
    val after = java.time.Instant.ofEpochMilli(System.currentTimeMillis())
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    // midpoint → the PRE-delete snapshot; post-delete literal → current.
    // (Timestamps as LITERALS: Spark's analyzer falls through to
    // SQL-on-file resolution for expression-valued TIMESTAMP AS OF on
    // path-identifier catalogs.)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft.`$dir` TIMESTAMP AS OF '$mid'")
      .head().getLong(0) == n1)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft.`$dir` TIMESTAMP AS OF '$after'")
      .head().getLong(0) == n1 - 50L)
  }

  test("SQL catalog: partitioned table time travel recovers partition values from the trash") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = tmpDir("gsql_part") + "/docs"
    spark.range(0L, 2000L).selectExpr(
      "concat('l', CAST(id DIV 500 AS INT)) AS lang",
      "(id DIV 500) * 1000 + (id % 500) AS doc_id",
      "concat('payload_', id) AS payload")
      .repartitionByRange(8, col("doc_id"))
      .write.partitionBy("lang").parquet(dir)
    val id1 = Manifest.create(spark, dir, "doc_id")
    Layout.deleteRange(spark, dir, "doc_id", 1000L, 1099L)
    // Current SQL read sees the delete, with the partition column live.
    val cur = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(cur.count() == 1900L)
    assert(cur.filter(col("lang") === "l1").count() == 400L)
    // Historical SQL read resolves the replaced file through the trash's
    // k=v structure — full pre-delete content, lang never NULL.
    val old = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF $id1")
    assert(old.count() == 2000L)
    assert(old.filter(col("lang").isNull).count() == 0L)
    assert(old.filter(col("lang") === "l1").count() == 500L)
    // Plan posture: a partition-column equality becomes a PartitionFilter
    // (planning-time pruning) and a data-column predicate is PUSHED into
    // the parquet scan — the native v2 read, not a post-filtered dump.
    val q = spark.sql(
      s"SELECT doc_id FROM graft.`$dir` WHERE lang = 'l2' AND doc_id < 2100")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l2"),
      s"partition filter not planned:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      s"data filter not pushed:\n$plan")
    assert(q.count() == 100L) // l2 owns [2000, 2499]; < 2100 → 2000..2099
  }

  test("timestampAsOf option resolves by commit instant, mirrors SQL TIMESTAMP AS OF") {
    val dir = stage("gsrc_tsopt")
    Manifest.create(spark, dir, "doc_id")
    val fp1 = fp(spark.read.parquet(dir))
    Thread.sleep(1100) // commit instants are millis; separate the snapshots
    val t1 = System.currentTimeMillis()
    spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .limit(20).write.mode("append").parquet(dir)
    Manifest.createIncremental(spark, dir, "doc_id")
    // Epoch-millis form: resolves to the snapshot live at t1.
    assert(fp(spark.read.format("graft")
      .option("timestampAsOf", t1.toString).load(dir)) == fp1)
    // ISO-8601 form: the same instant.
    assert(fp(spark.read.format("graft")
      .option("timestampAsOf", java.time.Instant.ofEpochMilli(t1).toString)
      .load(dir)) == fp1)
    // Latest read sees the append.
    assert(spark.read.format("graft").load(dir).count() == 520L)
    // Before history: typed.
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("timestampAsOf", "100").load(dir).count()
    }
    // Ambiguous pin: typed.
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("timestampAsOf", t1.toString)
        .option("snapshotId", 1).load(dir).count()
    }
  }

  test("column pruning reaches the inner parquet scan") {
    val dir = stage("gsrc_prune")
    Manifest.create(spark, dir, "doc_id")
    val two = spark.read.format("graft").load(dir).select("doc_id", "lang")
    assert(two.columns.toSeq == Seq("doc_id", "lang"))
    assert(two.count() == 500L)
  }
}
