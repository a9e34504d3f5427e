package graft

import graft.functions.Hashing
import graft.sync._
import org.apache.spark.sql.functions._

/** PartitionedStore: partition-pruned copy-on-write. The sync cascade over
  * Hive-layout tables rewrites ONLY the partitions the delta touches —
  * proven physically (untouched partitions keep the same files, same
  * mtimes), with excess partitions dropped as metadata and NULL partition
  * values converging through the default-partition sentinel.
  */
class PartitionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def locationOf(qtable: String): java.io.File = {
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $qtable")
      .filter($"col_name" === "Location").select("data_type").as[String].head()
    new java.io.File(new java.net.URI(loc).getPath)
  }

  private def filesOf(dir: java.io.File): Set[(String, Long)] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet

  test("round-trip, append, metadata-only deleteWhere") {
    val store = new PartitionedStore(spark, "pst_rt", Map("t" -> "part"))
    try {
      val df = Seq((1L, "a", "p1"), (2L, "b", "p2"), (3L, "c", "p2")).toDF("id", "v", "part")
      store.overwrite("t", df)
      assert(store.list() == Seq("t"))
      store.append("t", Seq((4L, "d", "p3")).toDF("id", "v", "part"))
      assert(store.read("t").count() == 4)
      store.deleteWhere("t", "part", "p2")
      assert(store.read("t").select("part").distinct().as[String].collect().toSet ==
        Set("p1", "p3"))
    } finally store.list().foreach(store.drop)
  }

  test("partitioned sync rewrites only touched partitions; excess partition dropped") {
    val cols = Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val master = new PartitionedStore(spark, "pst_m", Map("orders" -> "o_orderstatus"))
    val slave = new PartitionedStore(spark, "pst_s", Map("orders" -> "o_orderstatus"))
    try {
      master.overwrite("orders", orders)
      // Perturb ONLY the 'O' partition; add a bogus excess partition 'X'.
      slave.overwrite("orders", orders
        .filter(!($"o_orderstatus" === "O" && $"o_orderkey" % 5 === 0))
        .withColumn("o_totalprice",
          when($"o_orderstatus" === "O" && $"o_orderkey" % 7 === 0,
            $"o_totalprice" + 1.0).otherwise($"o_totalprice"))
        .unionByName(orders.orderBy("o_orderkey").limit(2)
          .withColumn("o_orderstatus", lit("X"))
          .withColumn("o_orderkey", $"o_orderkey" + 900000L)))

      val fDirBefore = filesOf(new java.io.File(locationOf("pst_s_orders"), "o_orderstatus=F"))
      assert(fDirBefore.nonEmpty)

      val engine = new SyncEngine(master, slave, SyncConfig(
        primaryKeys = Map("orders" -> Seq("o_orderkey")),
        partitionedTables = Map("orders" -> "o_orderstatus"),
        keyAwareDiff = true))
      engine.syncTable("orders")

      assert(Hashing.tableFingerprint(slave.read("orders"), cols) ==
        Hashing.tableFingerprint(master.read("orders"), cols))
      // Untouched partition: physically the same files.
      val fDirAfter = filesOf(new java.io.File(locationOf("pst_s_orders"), "o_orderstatus=F"))
      assert(fDirAfter == fDirBefore, "partition F must not be rewritten")
      // Excess partition gone from reads.
      assert(slave.read("orders").filter($"o_orderstatus" === "X").isEmpty)
    } finally {
      master.list().foreach(master.drop)
      slave.list().foreach(slave.drop)
    }
  }

  test("NULL partition values converge via the default-partition sentinel") {
    val master = new PartitionedStore(spark, "pst_nm", Map("t" -> "part"))
    val slave = new PartitionedStore(spark, "pst_ns", Map("t" -> "part"))
    try {
      val m = Seq((1L, "a", Some("p1")), (2L, "b", None), (3L, "c", None))
        .toDF("id", "v", "part")
      master.overwrite("t", m)
      // Slave diverges inside the NULL partition AND carries a NULL-partition
      // excess row.
      slave.overwrite("t", Seq((1L, "a", Some("p1")), (2L, "STALE", None),
        (9L, "ghost", None)).toDF("id", "v", "part"))
      val engine = new SyncEngine(master, slave, SyncConfig(
        primaryKeys = Map("t" -> Seq("id")),
        partitionedTables = Map("t" -> "part"),
        keyAwareDiff = true))
      engine.syncTable("t")
      val cols = Seq("id", "v", "part")
      assert(Hashing.tableFingerprint(slave.read("t"), cols) ==
        Hashing.tableFingerprint(master.read("t"), cols))
    } finally {
      master.list().foreach(master.drop)
      slave.list().foreach(slave.drop)
    }
  }

  test("mis-declared high-cardinality partition column fails loudly, not OOM") {
    import spark.implicits._
    // 'part' has 500 distinct values against a bound of 100 — a violated
    // low-cardinality declaration must name the column, and the guarded
    // collect ships at most bound+1 rows to the driver before throwing.
    val store = new PartitionedStore(spark, "pst_guard", Map("t" -> "part"),
      maxCollectedPartitions = 100)
    try {
      store.overwrite("t", (1 to 500).map(i => (i.toLong, i % 500, s"v$i"))
        .toDF("id", "part", "v"))
      val ex = intercept[IllegalStateException] {
        store.deleteKeys("t", (1 to 500).map(i => (i.toLong, i % 500))
          .toDF("id", "part"), Seq("id", "part"))
      }
      assert(ex.getMessage.contains("'part'") && ex.getMessage.contains("100"),
        ex.getMessage)
      // within the declared bound the same shape still works
      val small = new PartitionedStore(spark, "pst_guard2", Map("t" -> "part"),
        maxCollectedPartitions = 100)
      try {
        small.overwrite("t", (1 to 50).map(i => (i.toLong, i % 5, s"v$i"))
          .toDF("id", "part", "v"))
        small.deleteKeys("t", Seq((1L, 1)).toDF("id", "part"), Seq("id", "part"))
        assert(small.read("t").count() == 49)
      } finally small.list().foreach(small.drop)
    } finally store.list().foreach(store.drop)
  }
}
