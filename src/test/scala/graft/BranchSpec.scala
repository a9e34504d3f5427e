package graft

import graft.functions.Hashing
import graft.ops.{Layout, Manifest}
import org.apache.spark.sql.functions._

/** Snapshot branches: N named refs on the single physical chain, ONE
  * checked out at a time (the git-working-tree posture) — create forks at
  * the latest snapshot and checks the branch out; checkout switches refs
  * (pin + COW restore + unpin), which is what makes branches DIVERGE on a
  * linear id chain; `main` reads its pinned head; fast-forward merges the
  * checked-out branch metadata-only; abandon discards (restoring main's
  * head when the branch held the tree).
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
    // Duplicate names refused; tag/branch name collisions refused both ways.
    intercept[Exception] { Manifest.createBranch(spark, dir, "dev") }
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

  test("multi-branch: two branches diverge from main, checkout switches trees, ff one + abandon other") {
    val dir = fixture("branch_multi")
    val fpMain = fp(spark.read.parquet(dir))
    // Branch A: fork at main, delete low ids.
    spark.sql(s"CALL graft.system.create_branch('$dir', 'expA')")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE doc_id < 100")
    val fpA = fp(spark.read.parquet(dir))
    // Branch B must fork from MAIN, not from A's tree: check main out
    // (COW-restores the working tree), then fork.
    spark.sql(s"CALL graft.system.checkout_branch('$dir', 'main')")
    // Metadata-only checkout: the CATALOG's latest view serves main's
    // pinned head immediately (the raw tree materializes lazily, at the
    // next write — create_branch below forces it).
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir`")) == fpMain,
      "checkout main must serve the trunk's state")
    spark.sql(s"CALL graft.system.create_branch('$dir', 'expB')")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE doc_id >= 400")
    val fpB = fp(spark.read.parquet(dir))
    assert(fpA != fpB && fpA != fpMain && fpB != fpMain)
    // All three refs readable AT ONCE — true divergence on the linear chain.
    def ref(name: String): String =
      fp(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF '$name'"))
    assert(ref("main") == fpMain && ref("expA") == fpA && ref("expB") == fpB)
    // Retention pins every fork and dormant head.
    Manifest.expireSnapshots(spark, dir, 1): Unit
    assert(ref("main") == fpMain && ref("expA") == fpA && ref("expB") == fpB,
      "expiry must pin branch forks and heads")
    // $refs lists the whole model.
    val refs = spark.sql(s"SELECT ref, kind FROM graft.`$dir$$refs`")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(refs(("main", "trunk")) && refs(("expA", "branch")) &&
      refs(("expB", "branch")), s"$refs")
    // ff requires holding the tree: expA is dormant.
    intercept[Exception] { Manifest.fastForward(spark, dir, "expA") }
    // Check expA out and fast-forward it into main; expB stays dormant.
    spark.sql(s"CALL graft.system.checkout_branch('$dir', 'expA')")
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir`")) == fpA)
    spark.sql(s"CALL graft.system.fast_forward('$dir', 'expA')")
    assert(ref("main") == fpA, "main must take expA's state")
    assert(ref("expB") == fpB, "dormant expB unaffected by the merge")
    // Abandon dormant expB: ref drop only, tree untouched.
    spark.sql(s"CALL graft.system.abandon_branch('$dir', 'expB')")
    assert(fp(spark.read.parquet(dir)) == fpA)
    assert(Manifest.branches(spark, dir).isEmpty)
    intercept[Exception] { ref("expB") }
    // DML keeps working on the merged trunk.
    spark.sql(s"DELETE FROM graft.`$dir` WHERE doc_id = 200")
    assert(spark.read.parquet(dir).filter(col("doc_id") === 200).count() == 0)
  }

  test("non-fast-forward guard, state-identity round trips, and interrupted-transition heal") {
    val dir = fixture("branch_nff")
    val fpMain0 = fp(spark.read.parquet(dir))
    spark.sql(s"CALL graft.system.create_branch('$dir', 'dev')")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE doc_id < 50")
    val fpDev = fp(spark.read.parquet(dir))
    // MATERIALIZED checkout round trip restores each tree exactly.
    Layout.checkoutBranch(spark, dir, "main", materialize = true)
    assert(fp(spark.read.parquet(dir)) == fpMain0)
    // Advance MAIN after the fork: fast-forwarding dev would silently
    // discard main's commit — must refuse typed (git's non-ff refusal).
    spark.sql(s"DELETE FROM graft.`$dir` WHERE doc_id BETWEEN 300 AND 310")
    val fpMain1 = fp(spark.read.parquet(dir))
    Layout.checkoutBranch(spark, dir, "dev", materialize = true)
    assert(fp(spark.read.parquet(dir)) == fpDev)
    val e = intercept[IllegalArgumentException] {
      Manifest.fastForward(spark, dir, "dev")
    }
    assert(e.getMessage.contains("not a fast-forward"))
    // main's advanced state is intact; abandoning dev restores main's
    // ADVANCED head (not the stale fork).
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'main'"))
      == fpMain1)
    Layout.abandonBranch(spark, dir, "dev"): Unit
    assert(fp(spark.read.parquet(dir)) == fpMain1)
    // State-identity ff: a checkout ROUND TRIP creates restore commits
    // whose ids differ from the fork while main's STATE is unchanged —
    // the guard compares state, so the merge still fast-forwards.
    val fork2 = Manifest.createBranch(spark, dir, "dev2")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE doc_id = 450")
    val fpDev2 = fp(spark.read.parquet(dir))
    Layout.checkoutBranch(spark, dir, "main", materialize = true)
    Layout.checkoutBranch(spark, dir, "dev2", materialize = true)
    assert(Manifest.mainRefHead(spark, dir).exists(_ != fork2),
      "the round trip must have moved main's pin off the fork id")
    Manifest.fastForward(spark, dir, "dev2"): Unit
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'main'"))
      == fpDev2)
    // Interrupted-transition heal: a dangling ref-main pin (crash between
    // pinCurrentHolder and the target's ref write) freezes 'main' reads;
    // checkout_branch('main') COMPLETES the transition — restores the
    // pinned state, releases the pin — instead of no-opping forever.
    // (Commits made in the nobody-checked-out crash state are detached
    // work the completed checkout rolls back, the git-detached-HEAD rule.)
    val pinnedAt = Manifest.latestSnapshotId(spark, dir).get
    val fpPinned = fp(spark.read.parquet(dir))
    Manifest.pinCurrentHolder(spark, dir) // simulate the crash state
    spark.sql(s"DELETE FROM graft.`$dir` WHERE doc_id = 460")
    assert(Manifest.resolveRef(spark, dir, "main").contains(pinnedAt),
      "main reads stay frozen at the pin during the crash state")
    Layout.checkoutBranch(spark, dir, "main")
    assert(Manifest.mainRefHead(spark, dir).isEmpty,
      "completing the transition must release the dangling pin")
    assert(fp(spark.read.parquet(dir)) == fpPinned)
  }
  test("metadata-only checkout: switching a diverged branch moves ZERO data bytes; writes materialize lazily") {
    val dir = fixture("branch_meta")
    val fpMain = fp(spark.read.parquet(dir))
    val nMain = spark.read.parquet(dir).count()
    // Diverge: branch deletes a range, then PHYSICALLY return to main so
    // the working tree is the trunk's.
    spark.sql(s"CALL graft.system.create_branch('$dir', 'exp')")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE doc_id < 100")
    val fpExp = fp(spark.read.parquet(dir))
    Layout.checkoutBranch(spark, dir, "main", materialize = true)
    assert(fp(spark.read.parquet(dir)) == fpMain)
    // Metadata-only checkout of the DIVERGED branch: zero data movement —
    // every data file keeps its exact path and mtime (at 100 TB an
    // experiment switch must be a ref write, not a tree restore).
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dataState(): Set[(String, Long)] = {
      val out = Set.newBuilder[(String, Long)]
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.startsWith("part-"))
          out += ((st.getPath.toUri.getPath, st.getModificationTime))
      }
      out.result()
    }
    val before = dataState()
    spark.sql(s"CALL graft.system.checkout_branch('$dir', 'exp')")
    assert(dataState() == before,
      "a metadata-only checkout must move zero data bytes")
    // The catalog's latest view serves the branch exactly (files resolved
    // through the retained trash); time travel to 'main' still works.
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir`")) == fpExp)
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'main'"))
      == fpMain)
    // Switch back — still zero movement, still exact.
    spark.sql(s"CALL graft.system.checkout_branch('$dir', 'main')")
    assert(dataState() == before)
    assert(spark.sql(s"SELECT count(*) c FROM graft.`$dir`").head().getLong(0)
      == nMain)
    // A WRITE against a logically checked-out branch materializes first:
    // the commit lands on the BRANCH's tree, never the stale holder's.
    spark.sql(s"CALL graft.system.checkout_branch('$dir', 'exp')")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE doc_id BETWEEN 450 AND 459")
    val expNow = spark.read.parquet(dir)
    assert(expNow.filter(col("doc_id") < 100).count() == 0,
      "the write must land on the branch's materialized tree")
    assert(expNow.filter(col("doc_id").between(450, 459)).count() == 0)
    assert(fp(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'main'"))
      == fpMain, "main stays pinned through the lazy materialization")
    assert(Manifest.logicalRef(spark, dir).isEmpty,
      "materialization must clear the logical pointer")
  }
}
