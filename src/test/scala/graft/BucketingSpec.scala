package graft

import graft.ops.Bucketing
import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables: same data, same join — zero shuffle
  * exchanges in the physical plan once both sides are clustered on the key.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_orderkey", "o_totalprice")

    Bucketing.writeBucketed(li, "b_lineitem", Seq("l_orderkey"), 8, tmpDir("bli"))
    Bucketing.writeBucketed(ord.withColumnRenamed("o_orderkey", "l_orderkey"),
      "b_orders", Seq("l_orderkey"), 8, tmpDir("bord"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange-elision is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), Seq("l_orderkey"))
      assert(Bucketing.isShuffleFree(joined), "bucketed join should not shuffle:\n" +
        joined.queryExecution.executedPlan.toString.linesIterator.take(15).mkString("\n"))
      // and it computes the right thing
      val unbucketed = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      assert(joined.count() === unbucketed.count())

      // grouped aggregation on the bucket key is shuffle-free too
      val agg = spark.table("b_lineitem").groupBy("l_orderkey")
        .agg(sum($"l_quantity").as("q"))
      assert(Bucketing.isShuffleFree(agg), "bucketed groupBy should not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
