package graft

import graft.functions.Hashing
import graft.ops.Bucketing
import graft.sync._
import org.apache.spark.sql.functions._

/** BucketedStore: the sync engine over co-located catalog tables — the
  * key-aware diff's full-outer join runs with ZERO shuffle exchanges when
  * master and slave share the bucket layout (the recurring-sync trade: one
  * clustered write, then every diff cycle is exchange-free).
  */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ordersCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  test("store round-trip, append, deleteKeys through the catalog") {
    val store = new BucketedStore(spark, "bst_rt", Map("t" -> Seq("id")), numBuckets = 4)
    try {
      val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      store.overwrite("t", df)
      assert(store.list() == Seq("t"))
      assert(store.read("t").count() == 3)
      store.append("t", Seq((4L, "d")).toDF("id", "v"))
      store.deleteKeys("t", Seq(Tuple1(2L)).toDF("id"), Seq("id"))
      assert(store.read("t").select("id").as[Long].collect().sorted
        .sameElements(Array(1L, 3L, 4L)))
      // overwrite from a plan reading the table being replaced (stage+swap)
      store.overwrite("t", store.read("t").withColumn("v", upper($"v")))
      assert(store.read("t").select("v").as[String].collect().sorted
        .sameElements(Array("A", "C", "D")))
    } finally store.list().foreach(store.drop)
  }

  test("key-aware sync converges over bucketed stores; the diff join is shuffle-free") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet").select(ordersCols.map(col): _*)
    val keys = Map("orders" -> Seq("o_orderkey"))
    val master = new BucketedStore(spark, "bst_m", keys, numBuckets = 4)
    val slave = new BucketedStore(spark, "bst_s", keys, numBuckets = 4)
    try {
      master.overwrite("orders", orders)
      slave.overwrite("orders", orders
        .filter($"o_orderkey" % 5 =!= 0)
        .withColumn("o_totalprice",
          when($"o_orderkey" % 7 === 0, $"o_totalprice" + 1.0).otherwise($"o_totalprice"))
        .unionByName(orders.orderBy("o_orderkey").limit(2)
          .withColumn("o_orderkey", $"o_orderkey" + 900000L)))

      // The physical shape the diff runs: hash maps on both sides, full-outer
      // on the bucket key — no exchange on either table side.
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val m = Hashing.fastHashMap(master.read("orders"), Seq("o_orderkey"), ordersCols)
        val s = Hashing.fastHashMap(slave.read("orders"), Seq("o_orderkey"), ordersCols)
          .withColumnRenamed("h1", "s_h1").withColumnRenamed("h2", "s_h2")
        val diff = m.join(s, Seq("o_orderkey"), "full_outer")
        assert(Bucketing.isShuffleFree(diff), "bucketed diff join should not shuffle:\n" +
          diff.queryExecution.executedPlan.toString.linesIterator.take(20).mkString("\n"))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

      val engine = new SyncEngine(master, slave,
        SyncConfig(primaryKeys = keys, keyAwareDiff = true))
      engine.syncTable("orders")
      assert(Hashing.tableFingerprint(slave.read("orders"), ordersCols) ==
        Hashing.tableFingerprint(master.read("orders"), ordersCols))
    } finally {
      master.list().foreach(master.drop)
      slave.list().foreach(slave.drop)
    }
  }

  test("changeToken: stable across reads, moved by writes, absent-aware") {
    import spark.implicits._
    val store = new BucketedStore(spark, "graft_tok", Map("t" -> Seq("k")), numBuckets = 2)
    try {
      assert(store.changeToken("t").contains("__absent__"))
      store.overwrite("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      val t1 = store.changeToken("t")
      store.read("t").count() // reads must not move the token
      assert(store.changeToken("t") == t1 && t1.exists(_ != "__absent__"))
      store.append("t", Seq((3L, "c")).toDF("k", "v"))
      val t2 = store.changeToken("t")
      assert(t2 != t1)
      store.deleteKeys("t", Seq(Tuple1(2L)).toDF("k"), Seq("k"))
      assert(store.changeToken("t") != t2)
    } finally store.list().foreach(store.drop)
  }
}
