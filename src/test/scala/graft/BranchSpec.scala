package graft

import graft.functions.Hashing
import graft.ops.{Layout, Manifest}
import org.apache.spark.sql.functions._

/** Snapshot branches: ONE writable ref on the single physical chain (the
  * git-checkout posture) — create forks at the latest snapshot and moves
  * the working head onto the branch; `main` reads the pinned fork;
  * fast-forward merges metadata-only; abandon COW-restores the fork.
  */
class BranchSpec extends SparkSpec {

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private def fp(df: org.apache.spark.sql.DataFrame): String =
    Hashing.multisetFingerprintAgg(df.select(docCols.map(col): _*), docCols)
      .head().getString(0)

  private def fixture(tag: String): String = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val dir = tmpDir(tag) + "/docs"
    spark.read.parquet(s"$sf001/documents.parquet")
      .repartitionByRange(4, col("doc_id")).write.parquet(dir)
    Manifest.create(spark, dir, "doc_id")
    dir
  }

  test("branch lifecycle: fork, commit, read both, fast-forward; refusals typed") {
    val dir = fixture("branch_ff")
    val fpMain = fp(spark.read.parquet(dir))
    val fork = Manifest.createBranch(spark, dir, "dev")
    assert(Manifest.currentBranch(spark, dir).contains(("dev", fork)))
    // One branch at a time; tag/branch name collisions refused both ways.
    intercept[Exception] { Manifest.createBranch(spark, dir, "dev2") }
    intercept[Exception] { Manifest.tag(spark, dir, "dev", fork) }
    intercept[Exception] { Manifest.tag(spark, dir, "main", fork) }
    intercept[Exception] { Manifest.createBranch(spark, dir, "main") }
    // Branch commits advance the working head; main stays pinned.
    Layout.deleteRange(spark, dir, "doc_id", 0L, 49L): Unit
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'main'"))
      == fpMain, "main must read the pinned fork during the branch")
    val fpDev = fp(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'dev'"))
    assert(fpDev == fp(spark.read.parquet(dir)), "branch head = working head")
    assert(fpDev != fpMain)
    // Retention cannot expire the pinned fork while the branch is active.
    Manifest.createIncremental(spark, dir, "doc_id"): Unit // harmless no-op guard
    Manifest.expireSnapshots(spark, dir, 1): Unit
    assert(Manifest.hasSnapshot(spark, dir, fork),
      "the active branch's fork is pinned like a tag")
    // $refs introspects the whole ref model while the branch is active.
    val refs = spark.sql(s"SELECT ref, kind, snapshot FROM graft.`$dir$$refs`")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(refs.contains(("main", "trunk", fork)) &&
      refs.exists { case (n, k, _) => n == "dev" && k == "branch" }, s"$refs")
    // Fast-forward: metadata-only, main takes the branch state.
    val head = Manifest.fastForward(spark, dir, "dev")
    assert(Manifest.currentBranch(spark, dir).isEmpty)
    assert(head == Manifest.latestSnapshotId(spark, dir).get)
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'main'"))
      == fpDev)
    // Unknown refs stay typed.
    intercept[Exception] { Manifest.fastForward(spark, dir, "dev") }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'dev'").collect()
    }
  }

  test("abandon: the fork restores and the branch edits leave no trace") {
    val dir = fixture("branch_abandon")
    val before = fp(spark.read.parquet(dir))
    spark.sql(s"CALL graft.system.create_branch('$dir', 'scratch')")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE doc_id < 100")
    assert(fp(spark.read.parquet(dir)) != before, "branch edit visible on head")
    spark.sql(s"CALL graft.system.abandon_branch('$dir', 'scratch')")
    assert(Manifest.currentBranch(spark, dir).isEmpty)
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir`")) == before,
      "abandon must restore the fork exactly")
    // The chain is free again.
    assert(Manifest.createBranch(spark, dir, "next") > 0)
    Manifest.fastForward(spark, dir, "next"): Unit
  }
}
