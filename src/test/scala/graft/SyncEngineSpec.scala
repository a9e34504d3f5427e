package graft

import graft.functions.Hashing
import graft.sync._
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

class SyncEngineSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: String, name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/$name.parquet")

  private def mkStores(tag: String): (String, String, ParquetStore, ParquetStore) = {
    val (md, sd) = (tmpDir(s"${tag}_m"), tmpDir(s"${tag}_s"))
    (md, sd, new ParquetStore(spark, md), new ParquetStore(spark, sd))
  }

  private def custDf = Seq(
    (1L, "alice", 10, 5.0), (2L, "bob", 11, 6.0), (3L, "carol", 12, 7.0),
    (4L, "dave", 13, 8.0), (5L, "erin", 14, 9.0)).toDF("id", "name", "nk", "bal")

  private def fp(df: DataFrame): String =
    Hashing.tableFingerprint(df, df.columns.toSeq)

  test("missing table on slave → full copy") {
    val (md, sd, ms, ss) = mkStores("missing")
    write(md, "nation", custDf)
    val engine = new SyncEngine(ms, ss, SyncConfig(primaryKeys = Map("nation" -> Seq("id"))))
    engine.syncDatabase()
    assert(ss.list() == Seq("nation"))
    assert(fp(ss.read("nation")) == fp(ms.read("nation")))
  }

  test("excess table on slave → dropped; ignored tables untouched") {
    val (md, sd, ms, ss) = mkStores("excess")
    write(md, "keep", custDf)
    write(sd, "keep", custDf)
    write(sd, "scratch", custDf)      // excess → dropped
    write(sd, "tmp_x", custDf)        // matches ignore regex → untouched
    val engine = new SyncEngine(ms, ss, SyncConfig(
      ignoreTables = Seq("^tmp_.*$".r), primaryKeys = Map("keep" -> Seq("id"))))
    engine.syncDatabase()
    assert(ss.list().toSet == Set("keep", "tmp_x"))
  }

  test("changed schema → drop + full recopy") {
    val (md, sd, ms, ss) = mkStores("schema")
    write(md, "part", custDf)
    write(sd, "part", custDf.drop("bal")) // slave missing a column
    val engine = new SyncEngine(ms, ss, SyncConfig(primaryKeys = Map("part" -> Seq("id"))))
    val action = engine.syncTable("part")
    assert(action.isInstanceOf[SyncAction.CopyTable])
    assert(fp(ss.read("part")) == fp(ms.read("part")))
  }

  test("already in sync → fingerprint short-circuit, zero writes") {
    val (md, sd, ms, ss) = mkStores("insync")
    write(md, "region", custDf)
    write(sd, "region", custDf.orderBy(desc("id"))) // same multiset, different order
    val engine = new SyncEngine(ms, ss, SyncConfig(primaryKeys = Map("region" -> Seq("id"))))
    val action = engine.syncTable("region")
    assert(action == SyncAction.Skip("region", "already in sync"))
  }

  test("row insert/delete/update converges (hash diff)") {
    val (md, sd, ms, ss) = mkStores("rows")
    write(md, "customer", custDf)
    val slave = custDf.filter($"id" =!= 2L) // deleted row on slave
      .withColumn("bal", when($"id" === 3L, lit(99.0)).otherwise($"bal")) // mutated
      .unionByName(Seq((9L, "eve", 20, 1.0)).toDF("id", "name", "nk", "bal")) // excess
    write(sd, "customer", slave)
    val engine = new SyncEngine(ms, ss, SyncConfig(primaryKeys = Map("customer" -> Seq("id"))))
    engine.syncTable("customer")
    assert(fp(ss.read("customer")) == fp(ms.read("customer")))
    // idempotence: second run short-circuits
    assert(engine.syncTable("customer") == SyncAction.Skip("customer", "already in sync"))
  }

  test("no primary key: copy when allowed, skip when not") {
    val (md, sd, ms, ss) = mkStores("nopk")
    write(md, "heap", custDf)
    write(sd, "heap", custDf.filter($"id" =!= 1L))
    val engineCopy = new SyncEngine(ms, ss, SyncConfig(copyTablesWithNoPrimary = true))
    assert(engineCopy.syncTable("heap").isInstanceOf[SyncAction.CopyTable])
    assert(fp(ss.read("heap")) == fp(ms.read("heap")))

    write(sd, "heap", custDf.filter($"id" =!= 2L))
    val engineSkip = new SyncEngine(ms, ss, SyncConfig(copyTablesWithNoPrimary = false))
    assert(engineSkip.syncTable("heap") == SyncAction.Skip("heap", "no primary key"))
    assert(ss.read("heap").count() == 4) // untouched
  }

  test("partitioned table: changed/missing/excess partitions + partition move") {
    val (md, sd, ms, ss) = mkStores("part")
    val masterDf = Seq(
      (1L, "p1", "a"), (2L, "p1", "b"), (3L, "p2", "c"), (4L, "p3", "d")
    ).toDF("id", "part", "v")
    // slave: p1 has a mutated row; p3 missing entirely; excess p9; and id=3
    // moved from p2 (master) to p9 (slave) — the C7 partition-move guard.
    val slaveDf = Seq(
      (1L, "p1", "a"), (2L, "p1", "MUT"), (3L, "p9", "c"), (9L, "p9", "x")
    ).toDF("id", "part", "v")
    write(md, "t", masterDf)
    write(sd, "t", slaveDf)
    val engine = new SyncEngine(ms, ss, SyncConfig(
      primaryKeys = Map("t" -> Seq("id")),
      partitionedTables = Map("t" -> "part")))
    engine.syncTable("t")
    assert(fp(ss.read("t")) == fp(ms.read("t")))
    assert(engine.syncTable("t") == SyncAction.Skip("t", "already in sync"))
  }

  test("dry run plans but does not mutate") {
    val (md, sd, ms, ss) = mkStores("dry")
    write(md, "x", custDf)
    write(sd, "x", custDf.filter($"id" =!= 1L))
    val before = fp(ss.read("x"))
    val engine = new SyncEngine(ms, ss, SyncConfig(
      primaryKeys = Map("x" -> Seq("id")), dryRun = true))
    val action = engine.syncTable("x")
    assert(action.isInstanceOf[SyncAction.ApplyDelta])
    assert(fp(ss.read("x")) == before)
  }

  test("per-table failure is tolerated: other tables still sync (C6 || true)") {
    val (md, sd, ms, ss) = mkStores("tolerate")
    write(md, "good", custDf)
    write(sd, "good", custDf.filter($"id" =!= 1L))
    // corrupt table: slave's parquet dir exists but holds garbage → read throws
    write(md, "bad", custDf)
    val badDir = new java.io.File(s"$sd/bad.parquet"); badDir.mkdirs()
    java.nio.file.Files.writeString(badDir.toPath.resolve("part-0.parquet"), "not parquet")
    val engine = new SyncEngine(ms, ss, SyncConfig(primaryKeys = Map("good" -> Seq("id"))))
    engine.syncDatabase()
    assert(fp(ss.read("good")) == fp(ms.read("good")), "good table must converge")
    assert(engine.auditLog.exists {
      case SyncAction.Skip("bad", r) => r.startsWith("failed:")
      case _ => false
    }, s"bad table failure must be recorded: ${engine.auditLog}")
  }

  test("audit log file: every action appended as a JSON line (S15)") {
    val (md, sd, ms, ss) = mkStores("auditfile")
    write(md, "x", custDf)
    write(sd, "x", custDf.filter($"id" =!= 1L))
    write(sd, "gone", custDf)
    val logPath = tmpDir("auditlog") + "/audit.jsonl"
    val engine = new SyncEngine(ms, ss, SyncConfig(
      primaryKeys = Map("x" -> Seq("id")), auditLogPath = Some(logPath)))
    engine.syncDatabase()
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(logPath))
    assert(lines.size == engine.auditLog.size)
    assert(lines.stream().anyMatch(_.contains(""""action":"DropTable","table":"gone"""")))
    assert(lines.stream().anyMatch(_.contains(""""action":"ApplyDelta","table":"x"""")))
  }

  test("NullColumnTest convergence: NULL-permuted rows sync correctly") {
    val (md, sd, ms, ss) = mkStores("nullcol")
    val m = Seq((1L, Option(2), Option.empty[Int], Option.empty[Int]))
      .toDF("id", "a", "b", "c")
    val s = Seq((1L, Option.empty[Int], Option(2), Option.empty[Int]))
      .toDF("id", "a", "b", "c")
    write(md, "nulls", m)
    write(sd, "nulls", s)
    val engine = new SyncEngine(ms, ss, SyncConfig(primaryKeys = Map("nulls" -> Seq("id"))))
    engine.syncTable("nulls")
    assert(fp(ss.read("nulls")) == fp(ms.read("nulls")))
  }

  test("C1 scale guard: 100 tables complete and audit correctly through the pool") {
    // The driver-side orchestration cost is what bounds a 10k-table sync:
    // per CLEAN table the cascade is two tiny fingerprint jobs (the A1
    // short-circuit), and the pool overlaps them. 100 tables — 90 clean,
    // 5 dirty, 5 missing — must finish with exactly one audit action each
    // and converge the dirty/missing ones.
    val (md, sd, ms, ss) = mkStores("scale100")
    val names = (0 until 100).map(i => f"t$i%03d")
    names.foreach(t => write(md, t, custDf))
    names.drop(5).take(90).foreach(t => write(sd, t, custDf))              // clean
    names.takeRight(5).foreach(t =>                                        // dirty
      write(sd, t, custDf.filter($"id" =!= 2L)))
    val engine = new SyncEngine(ms, ss, SyncConfig(
      primaryKeys = names.map(_ -> Seq("id")).toMap, tableParallelism = 8))
    val actions = engine.syncDatabase()
    assert(actions.length == 100)
    assert(actions.count(_.isInstanceOf[SyncAction.CopyTable]) == 5)
    assert(actions.count { case SyncAction.Skip(_, r) => r == "already in sync"; case _ => false } == 90)
    assert(actions.count(_.isInstanceOf[SyncAction.ApplyDelta]) == 5)
    assert(ss.list().length == 100)
    val mfp = fp(ms.read("t000"))
    (names.take(5) ++ names.takeRight(5)).foreach { t =>
      assert(fp(ss.read(t)) == mfp, s"table $t did not converge")
    }
  }
}
