package graft

import graft.ops.{Layout, Manifest}
import org.apache.spark.sql.functions._

/** RENAME COLUMN as metadata-only evolution: data files keep the original
  * PHYSICAL column name forever (one physical schema per table); each
  * snapshot's recorded schema carries its own LOGICAL names with a
  * logical→physical map; reads translate at the scan, writes at the file
  * boundary. Time travel returns each snapshot's own column names.
  */
class RenameSpec extends SparkSpec {

  private def fixture(tag: String): String = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = tmpDir(tag) + "/docs"
    import spark.implicits._
    Seq((1L, "alpha", 10L), (2L, "beta", 20L), (3L, "gamma", 30L))
      .toDF("doc_id", "body", "n")
      .repartition(2).write.parquet(dir)
    Manifest.create(spark, dir, "doc_id")
    dir
  }

  test("rename is metadata-only; catalog reads serve values under the new name; time travel keeps old names") {
    val dir = fixture("rename_basic")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val id1 = Manifest.latestSnapshotId(spark, dir).get
    val filesBefore = graft.ops.FsMaint.dataFileCount(fs,
      new org.apache.hadoop.fs.Path(dir))
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN body TO text")
    assert(graft.ops.FsMaint.dataFileCount(fs,
      new org.apache.hadoop.fs.Path(dir)) == filesBefore,
      "rename must touch zero data files")
    // The renamed column serves the ORIGINAL VALUES (not NULLs — the
    // whole point of the physical-name indirection).
    val rows = spark.sql(
      s"SELECT doc_id, text FROM graft.`$dir` ORDER BY doc_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // Filter pushdown on the renamed column still yields exact results.
    assert(spark.sql(s"SELECT doc_id FROM graft.`$dir` WHERE text = 'beta'")
      .head().getLong(0) == 2L)
    // Time travel: the pre-rename snapshot answers under its OWN names.
    val old = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF $id1")
    assert(old.columns.contains("body") && !old.columns.contains("text"))
    assert(old.filter(col("body") === "gamma").count() == 1L)
    // Scala surface agrees.
    assert(Manifest.readAsOf(spark, dir, id1).columns.contains("body"))
    val latest = Manifest.latestSnapshotId(spark, dir).get
    assert(Manifest.readAsOf(spark, dir, latest).columns.contains("text"))
  }

  test("writes after a rename: INSERT, MERGE, COW delete all preserve the logical view") {
    val dir = fixture("rename_writes")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN body TO text")
    import spark.implicits._
    // INSERT lands under the rename (new file written with the PHYSICAL
    // name so the one-physical-schema invariant holds).
    Seq((4L, "delta", 40L)).toDF("doc_id", "text", "n")
      .createOrReplaceTempView("ren_ins")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM ren_ins")
    assert(spark.sql(s"SELECT text FROM graft.`$dir` WHERE doc_id = 4")
      .head().getString(0) == "delta")
    // Raw files carry ONE physical schema: the original name everywhere.
    val raw = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(raw.columns.contains("body") && !raw.columns.contains("text"),
      s"files must keep the physical name; got ${raw.columns.mkString(",")}")
    // Keyed COW merge through the Scala API (logical-named delta).
    val res = Layout.mergeKeyed(spark, dir, "doc_id",
      Seq((2L, "BETA", 22L)).toDF("doc_id", "text", "n"))
    assert(res.rowsUpdated == 1L)
    assert(spark.sql(s"SELECT text FROM graft.`$dir` WHERE doc_id = 2")
      .head().getString(0) == "BETA")
    // Row-level MERGE via SQL on the renamed column.
    Seq((3L, "x")).toDF("doc_id", "tag").createOrReplaceTempView("ren_del")
    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING ren_del s ON t.doc_id = s.doc_id
         |WHEN MATCHED AND t.text = 'gamma' THEN DELETE""".stripMargin)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$dir`")
      .head().getLong(0) == 3L)
    // COW range delete keeps the logical view and the history.
    Layout.deleteRange(spark, dir, "doc_id", 4L, 4L)
    val left = spark.sql(s"SELECT text FROM graft.`$dir` ORDER BY doc_id").collect()
    assert(left.map(_.getString(0)).toSeq == Seq("alpha", "BETA"))
    // A full re-profile must NOT revert the rename — plain or bloom-bearing.
    Manifest.create(spark, dir, "doc_id")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").columns.contains("text"))
    Manifest.createWithBloom(spark, dir, Seq("doc_id"), Seq("doc_id"))
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").columns.contains("text"),
      "a bloom re-profile must keep the logical names")
  }

  test("rename refusals: key column, existing name, chained rename keeps mapping") {
    val dir = fixture("rename_refuse")
    intercept[Exception] { Manifest.renameColumn(spark, dir, "doc_id", "id") }
    intercept[Exception] { Manifest.renameColumn(spark, dir, "body", "n") }
    intercept[Exception] { Manifest.renameColumn(spark, dir, "nope", "x") }
    // Chained rename: body -> text -> content maps content to the ORIGINAL
    // physical name.
    Manifest.renameColumn(spark, dir, "body", "text")
    Manifest.renameColumn(spark, dir, "text", "content")
    assert(Manifest.currentPhysicalNames(spark, dir) == Map("content" -> "body"))
    assert(spark.sql(s"SELECT content FROM graft.`$dir` WHERE doc_id = 1")
      .head().getString(0) == "alpha")
    // Rename BACK to the physical name drops the mapping entirely.
    Manifest.renameColumn(spark, dir, "content", "body")
    assert(Manifest.currentPhysicalNames(spark, dir).isEmpty)
    // Dropping a renamed column prunes its map entry.
    Manifest.renameColumn(spark, dir, "body", "text")
    Manifest.dropColumn(spark, dir, "text")
    assert(Manifest.currentPhysicalNames(spark, dir).isEmpty)
    assert(!spark.sql(s"SELECT * FROM graft.`$dir`").columns.contains("text"))
  }

  test("physical-name shadowing: ADD/RENAME onto a renamed column's storage name is refused") {
    val dir = fixture("rename_shadow")
    Manifest.renameColumn(spark, dir, "body", "origin") // origin → body on disk
    // ADD COLUMN `body` would make toPhysicalSchema emit two `body` fields:
    // every pinned read / physical write of the snapshot would then fail.
    val exAdd = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN body STRING")
    }
    assert(exAdd.getMessage.contains("physically stored"), exAdd.getMessage)
    // Same trap via RENAME: another column may not take `body` either.
    val exRen = intercept[Exception] {
      Manifest.renameColumn(spark, dir, "n", "body")
    }
    assert(exRen.getMessage.contains("physically stored"), exRen.getMessage)
    // The legal sequence still works end to end: rename BACK frees the name.
    Manifest.renameColumn(spark, dir, "origin", "body")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN extra STRING")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").columns.toSet ==
      Set("doc_id", "body", "n", "extra"))
  }

  test("rename of a SECOND-LEVEL hive partition column is refused (multi-level guard)") {
    val dir = tmpDir("rename_part2") + "/docs"
    import spark.implicits._
    Seq((1L, "a", "x", 1L), (2L, "b", "y", 2L))
      .toDF("doc_id", "k1", "k2", "n")
      .write.partitionBy("k1", "k2").parquet(dir)
    Manifest.create(spark, dir, "doc_id")
    val ex1 = intercept[Exception] { Manifest.renameColumn(spark, dir, "k1", "p1") }
    assert(ex1.getMessage.contains("partition column"), ex1.getMessage)
    // The old one-level listStatus guard missed exactly this:
    val ex2 = intercept[Exception] { Manifest.renameColumn(spark, dir, "k2", "p2") }
    assert(ex2.getMessage.contains("partition column"), ex2.getMessage)
    // Non-partition columns still rename fine on the partitioned layout.
    Manifest.renameColumn(spark, dir, "n", "m")
    assert(spark.read.parquet(dir).columns.contains("n"), "physical unchanged")
  }
}
