package graft

import graft.functions.Hashing
import graft.sync._
import org.apache.spark.sql.SaveMode
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5.3): ∀ random (master, slave) pairs, sync
  * converges and is idempotent; fingerprints are order-insensitive.
  * Uses ScalaCheck generators directly with fixed seeds (the scalatestplus
  * bridge isn't available offline); row counts are tiny — the value is in
  * shape coverage, and each case pays several Spark jobs.
  */
class SyncPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen: Gen[(Long, Option[Int], Option[String], Option[Double])] =
    for {
      k <- Gen.choose(1L, 40L)
      a <- Gen.option(Gen.choose(-5, 5))
      s <- Gen.option(Gen.oneOf("x", "y", "z", "", "a,b", "NULL"))
      d <- Gen.option(Gen.oneOf(0.0, 1.5, -2.25, 1e6))
    } yield (k, a, s, d)

  private val tableGen: Gen[List[(Long, Option[Int], Option[String], Option[Double])]] =
    Gen.listOfN(12, rowGen).map(_.groupBy(_._1).map(_._2.head).toList) // unique keys

  private def sample(g: Gen[List[(Long, Option[Int], Option[String], Option[Double])]],
                     seed: Long) =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("random master/slave pairs: sync converges and second run is a no-op") {
    val cols = Seq("k", "a", "s", "d")
    for (seed <- 1 to 6) {
      val mRows = sample(tableGen, seed)
      val sRows = sample(tableGen, seed + 1000)
      val md = tmpDir("prop_m"); val sd = tmpDir("prop_s")
      mRows.toDF("k", "a", "s", "d").write.mode(SaveMode.Overwrite).parquet(s"$md/t.parquet")
      sRows.toDF("k", "a", "s", "d").write.mode(SaveMode.Overwrite).parquet(s"$sd/t.parquet")
      val ms = new ParquetStore(spark, md); val ss = new ParquetStore(spark, sd)
      val engine = new SyncEngine(ms, ss, SyncConfig(primaryKeys = Map("t" -> Seq("k"))))
      engine.syncTable("t")
      assert(Hashing.tableFingerprint(ss.read("t"), cols) ==
        Hashing.tableFingerprint(ms.read("t"), cols), s"seed $seed did not converge")
      assert(engine.syncTable("t") == SyncAction.Skip("t", "already in sync"),
        s"seed $seed not idempotent")
    }
  }

  test("random partitioned master/slave pairs converge through the grouped cascade") {
    // low-cardinality partition column p ∈ {0,1,2}; random divergence on
    // both sides including whole-partition presence differences
    val pRowGen = for {
      k <- Gen.choose(1L, 60L)
      p <- Gen.choose(0, 2)
      v <- Gen.option(Gen.oneOf("x", "y", "z"))
    } yield (k, p, v)
    val pTableGen = Gen.listOfN(20, pRowGen).map(_.groupBy(_._1).map(_._2.head).toList)
    val cols = Seq("k", "p", "v")
    for (seed <- 1 to 4) {
      val mRows = pTableGen.pureApply(Gen.Parameters.default, Seed(seed))
      val sRows = pTableGen.pureApply(Gen.Parameters.default, Seed(seed + 500))
      val md = tmpDir("pprop_m"); val sd = tmpDir("pprop_s")
      mRows.toDF("k", "p", "v").write.mode(SaveMode.Overwrite).parquet(s"$md/t.parquet")
      sRows.toDF("k", "p", "v").write.mode(SaveMode.Overwrite).parquet(s"$sd/t.parquet")
      val ms = new ParquetStore(spark, md); val ss = new ParquetStore(spark, sd)
      val engine = new SyncEngine(ms, ss, SyncConfig(
        primaryKeys = Map("t" -> Seq("k")),
        partitionedTables = Map("t" -> "p")))
      engine.syncTable("t")
      assert(Hashing.tableFingerprint(ss.read("t"), cols) ==
        Hashing.tableFingerprint(ms.read("t"), cols), s"seed $seed did not converge")
      assert(engine.syncTable("t") == SyncAction.Skip("t", "already in sync"),
        s"seed $seed not idempotent")
    }
  }

  test("NULL partition values converge (null-safe partitioned cascade)") {
    // The ADVICE scenario: a NULL partition value on either side — including
    // a slave-ONLY NULL partition that an equi-join delete would silently
    // never remove — must converge like any other value.
    val pRowGen = for {
      k <- Gen.choose(1L, 60L)
      p <- Gen.option(Gen.choose(0, 1))   // partition ∈ {NULL, 0, 1}
      v <- Gen.option(Gen.oneOf("x", "y", "z"))
    } yield (k, p, v)
    val pTableGen = Gen.listOfN(20, pRowGen).map(_.groupBy(_._1).map(_._2.head).toList)
    val cols = Seq("k", "p", "v")
    for (seed <- 1 to 4) {
      val mAll = pTableGen.pureApply(Gen.Parameters.default, Seed(seed))
      // master sometimes has NO null partition while the slave does (and
      // vice versa through the random draw) — the excess-NULL-partition case
      val mRows = if (seed % 2 == 0) mAll.filter(_._2.isDefined) else mAll
      val sRows = pTableGen.pureApply(Gen.Parameters.default, Seed(seed + 500))
      val md = tmpDir("nprop_m"); val sd = tmpDir("nprop_s")
      mRows.toDF("k", "p", "v").write.mode(SaveMode.Overwrite).parquet(s"$md/t.parquet")
      sRows.toDF("k", "p", "v").write.mode(SaveMode.Overwrite).parquet(s"$sd/t.parquet")
      val ms = new ParquetStore(spark, md); val ss = new ParquetStore(spark, sd)
      val engine = new SyncEngine(ms, ss, SyncConfig(
        primaryKeys = Map("t" -> Seq("k")),
        partitionedTables = Map("t" -> "p")))
      engine.syncTable("t")
      assert(Hashing.tableFingerprint(ss.read("t"), cols) ==
        Hashing.tableFingerprint(ms.read("t"), cols), s"seed $seed did not converge")
      assert(engine.syncTable("t") == SyncAction.Skip("t", "already in sync"),
        s"seed $seed not idempotent")
    }
  }

  test("random pairs converge through the partition-PRUNED physical store") {
    // Same cascade, but master/slave live as Hive-layout PartitionedStore
    // tables (string partition values incl. NULL via the sentinel) — the
    // pruned applyDelta must converge every random divergence shape.
    val pRowGen = for {
      k <- Gen.choose(1L, 60L)
      p <- Gen.option(Gen.oneOf("p0", "p1", "p2"))
      v <- Gen.option(Gen.oneOf("x", "y", "z"))
    } yield (k, p, v)
    val pTableGen = Gen.listOfN(20, pRowGen).map(_.groupBy(_._1).map(_._2.head).toList)
    val cols = Seq("k", "p", "v")
    for (seed <- 1 to 3) {
      val mRows = pTableGen.pureApply(Gen.Parameters.default, Seed(seed))
      val sRows = pTableGen.pureApply(Gen.Parameters.default, Seed(seed + 500))
      val ms = new PartitionedStore(spark, s"prps_m$seed", Map("t" -> "p"))
      val ss = new PartitionedStore(spark, s"prps_s$seed", Map("t" -> "p"))
      try {
        ms.overwrite("t", mRows.toDF("k", "p", "v"))
        ss.overwrite("t", sRows.toDF("k", "p", "v"))
        val engine = new SyncEngine(ms, ss, SyncConfig(
          primaryKeys = Map("t" -> Seq("k")),
          partitionedTables = Map("t" -> "p"),
          keyAwareDiff = true))
        engine.syncTable("t")
        assert(Hashing.tableFingerprint(ss.read("t"), cols) ==
          Hashing.tableFingerprint(ms.read("t"), cols), s"seed $seed did not converge")
        assert(engine.syncTable("t") == SyncAction.Skip("t", "already in sync"),
          s"seed $seed not idempotent")
      } finally {
        ms.list().foreach(ms.drop)
        ss.list().foreach(ss.drop)
      }
    }
  }

  test("slave-only NULL partition is deleted (partition-delete-only path)") {
    val cols = Seq("k", "p", "v")
    val md = tmpDir("nullp_m"); val sd = tmpDir("nullp_s")
    Seq((1L, Some(0), "a"), (2L, Some(1), "b")).toDF("k", "p", "v")
      .write.parquet(s"$md/t.parquet")
    Seq((1L, Some(0), "a"), (2L, Some(1), "b"), (9L, None: Option[Int], "ghost"))
      .toDF("k", "p", "v").write.parquet(s"$sd/t.parquet")
    val ms = new ParquetStore(spark, md); val ss = new ParquetStore(spark, sd)
    val engine = new SyncEngine(ms, ss, SyncConfig(
      primaryKeys = Map("t" -> Seq("k")),
      partitionedTables = Map("t" -> "p")))
    engine.syncTable("t")
    assert(ss.read("t").count() == 2)
    assert(Hashing.tableFingerprint(ss.read("t"), cols) ==
      Hashing.tableFingerprint(ms.read("t"), cols))
    assert(engine.auditLog.exists {
      case SyncAction.DropPartition("t", "p", _) => true; case _ => false
    })
  }

  test("duplicate-content multiplicity difference converges via recopy fallback") {
    // master: the SAME full row twice; slave: one copy. Every row hash
    // matches the other side, so the hash diff is empty (the reference's
    // documented blind spot, SURVEY §2.3 J1) — the engine must fall back to
    // full copy, not report an empty delta.
    val cols = Seq("k", "v")
    val md = tmpDir("dupm"); val sd = tmpDir("dups")
    Seq((1L, "A"), (1L, "A")).toDF("k", "v").write.parquet(s"$md/t.parquet")
    Seq((1L, "A")).toDF("k", "v").write.parquet(s"$sd/t.parquet")
    val ms = new ParquetStore(spark, md); val ss = new ParquetStore(spark, sd)
    val engine = new SyncEngine(ms, ss, SyncConfig(primaryKeys = Map("t" -> Seq("k"))))
    assert(engine.syncTable("t") == SyncAction.CopyTable("t"))
    assert(Hashing.tableFingerprint(ss.read("t"), cols) ==
      Hashing.tableFingerprint(ms.read("t"), cols))
    assert(engine.syncTable("t") == SyncAction.Skip("t", "already in sync"))
  }

  test("random pairs in maintained mode: converge, token-skip, CDC folds stay exact") {
    val cols = Seq("k", "a", "s", "d")
    for (seed <- 1 to 4) {
      val mRows = sample(tableGen, seed)
      val sRows = sample(tableGen, seed + 2000)
      val md = tmpDir("mprop_m"); val sd = tmpDir("mprop_s")
      mRows.toDF("k", "a", "s", "d").write.mode(SaveMode.Overwrite).parquet(s"$md/t.parquet")
      sRows.toDF("k", "a", "s", "d").write.mode(SaveMode.Overwrite).parquet(s"$sd/t.parquet")
      val ms = new ParquetStore(spark, md); val ss = new ParquetStore(spark, sd)
      val engine = new SyncEngine(ms, ss, SyncConfig(
        primaryKeys = Map("t" -> Seq("k")), maintainFingerprints = true))
      engine.syncTable("t")
      assert(Hashing.tableFingerprint(ss.read("t"), cols) ==
        Hashing.tableFingerprint(ms.read("t"), cols), s"seed $seed did not converge")
      // Idempotence in maintained mode = the zero-job token skip, and the
      // maintained value must equal a full recompute (the drift audit).
      assert(engine.syncTable("t") ==
        SyncAction.Skip("t", "unchanged (master change token)"), s"seed $seed")
      assert(engine.verifyMaintained("t"), s"seed $seed maintained != recompute")
      // Random CDC fold: delete every key ≡ 0 (mod 3) with its exact
      // before-image (slave ≡ master now), reinsert with d := 42.0.
      val dels = mRows.filter(_._1 % 3 == 0)
      val changes =
        dels.map(r => ("D", r._1, r._2, r._3, r._4)) ++
          dels.map(r => ("I", r._1, r._2, r._3, Some(42.0): Option[Double]))
      engine.applyCdc("t", changes.toDF("op", "k", "a", "s", "d"))
      assert(engine.verifyMaintained("t"), s"seed $seed CDC fold diverged from recompute")
      val expected = mRows.map(r => if (r._1 % 3 == 0) (r._1, r._2, r._3, Some(42.0)) else r)
      assert(Hashing.tableFingerprint(ss.read("t"), cols) ==
        Hashing.tableFingerprint(expected.toDF("k", "a", "s", "d"), cols),
        s"seed $seed CDC content mismatch")
    }
  }

  test("fingerprint order-insensitivity on random data") {
    val cols = Seq("k", "a", "s", "d")
    for (seed <- 1 to 4) {
      val rows = sample(tableGen, seed)
      assert(Hashing.tableFingerprint(rows.toDF("k", "a", "s", "d"), cols) ==
        Hashing.tableFingerprint(rows.reverse.toDF("k", "a", "s", "d"), cols))
    }
  }
}
