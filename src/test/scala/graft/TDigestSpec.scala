package graft

import graft.functions.{Quantiles, TDigest}
import org.apache.spark.sql.functions._

/** t-digest quantile sketch: rank-error bound holds on skewed data,
  * across partial-aggregate merges, and through serialization.
  */
class TDigestSpec extends SparkSpec {

  private def rankOf(sorted: Array[Double], v: Double): Double = {
    // midrank: (count(< v) + count(<= v)) / 2n — symmetric under ties
    var lt = 0; var le = 0
    var i = 0
    while (i < sorted.length) {
      if (sorted(i) < v) lt += 1
      if (sorted(i) <= v) le += 1
      i += 1
    }
    (lt + le) / (2.0 * sorted.length)
  }

  test("rank error ≤ 2% on a heavy-tailed distribution (direct adds)") {
    val rnd = new scala.util.Random(42)
    val xs = Array.fill(50000)(math.exp(rnd.nextGaussian() * 2.0))
    val d = new TDigest(200.0)
    xs.foreach(d.add(_))
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val err = math.abs(rankOf(sorted, d.quantile(q)) - q)
      assert(err <= 0.02, s"q=$q rank error $err")
    }
  }

  test("merging partial digests preserves the bound; serialization round-trips") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(40000)(rnd.nextGaussian() * 100.0 + (rnd.nextInt(4) * 500))
    val parts = xs.grouped(1000).map { chunk =>
      val p = new TDigest(200.0); chunk.foreach(p.add(_)); p
    }.toSeq
    val merged = new TDigest(200.0)
    parts.foreach(merged.mergeIn)
    val thawed = TDigest.fromBytes(merged.toBytes)
    assert(math.abs(thawed.total - xs.length) < 1e-6)
    val sorted = xs.sorted
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val err = math.abs(rankOf(sorted, thawed.quantile(q)) - q)
      assert(err <= 0.02, s"q=$q rank error $err after 40-way merge + thaw")
    }
  }

  test("Spark aggregate: per-group sketch quantiles within 2% rank of exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 30000).map(i =>
      (s"g${i % 3}", math.abs(rnd.nextGaussian()) * (100 + (i % 3) * 50)))
    val df = rows.toDF("g", "x").repartition(8)
    val got = df.groupBy("g")
      .agg(Quantiles.tdigestQuantiles(col("x"), Seq(0.5, 0.9)).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).toArray.sorted
      val Seq(p50, p90) = got(g).toSeq
      assert(math.abs(rankOf(sorted, p50) - 0.5) <= 0.02, s"$g p50")
      assert(math.abs(rankOf(sorted, p90) - 0.9) <= 0.02, s"$g p90")
    }
  }

  test("degenerate inputs: empty group is NaN-free skipped, single value exact, nulls ignored") {
    import spark.implicits._
    val df = Seq(("a", Some(5.0)), ("a", None), ("b", Some(1.0)), ("b", Some(3.0)))
      .toDF("g", "x")
    val got = df.groupBy("g")
      .agg(Quantiles.tdigestQuantiles(col("x"), Seq(0.5)).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    assert(got("a") == 5.0)
    assert(got("b") >= 1.0 && got("b") <= 3.0)
  }
}
