package graft

import graft.functions.{MGSummary, MisraGries}
import org.apache.spark.sql.functions._

/** Misra–Gries sketch: exactness under capacity, the n/(k+1) undercount
  * bound (which must survive map-side partial merges — the property the
  * heavy-hitter query's correctness rests on), and candidate coverage of
  * every true heavy hitter at threshold n/m with k + 1 > m.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def aggTopk(items: Seq[String], k: Int, parts: Int): Map[String, Long] =
    items.toDF("item").repartition(parts)
      .agg(MisraGries.mg_topk(col("item"), k).as("s"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("serialization roundtrips a token past writeUTF's 64 KiB modified-UTF-8 cap") {
    // Forces a shuffle-side serialize/deserialize of the buffer with one
    // entry whose UTF-8 form is ~128 KiB — writeUTF would throw here.
    val big = "é" * 65536 // 2 bytes each in UTF-8
    val got = aggTopk(Seq(big, big, "small"), k = 4, parts = 3)
    assert(got == Map(big -> 2L, "small" -> 1L))
  }

  test("exact when the domain fits in capacity") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val got = aggTopk(scala.util.Random.shuffle(items), k = 8, parts = 5)
    assert(got == Map("a" -> 40L, "b" -> 25L, "c" -> 3L))
  }

  test("undercount bound and heavy-hitter coverage survive partitioned merges") {
    val rnd = new scala.util.Random(42)
    // Skewed domain: a few hot items over a long uniform tail.
    val items = (1 to 20000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 25) "hot1" else if (r < 40) "hot2" else if (r < 50) "hot3"
      else s"tail${rnd.nextInt(500)}"
    }
    val n = items.size.toLong
    val k = 64
    val exact = items.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val got = aggTopk(items, k, parts = 13)
    got.foreach { case (item, est) =>
      val truth = exact(item)
      assert(est <= truth, s"$item overcounted: $est > $truth")
      assert(est >= truth - n / (k + 1), s"$item undercut past the bound")
    }
    // Every item with true count >= ceil(n/20) must be in the summary.
    val thresh = (n + 19) / 20
    exact.filter(_._2 >= thresh).keys.foreach { hh =>
      assert(got.contains(hh), s"true heavy hitter $hh missing from summary")
    }
  }

  test("driver-side summary matches the classic semantics on a tiny stream") {
    val s = new MGSummary(2)
    Seq("a", "b", "a", "c", "a", "d").foreach(x => s.add(x))
    // k=2: 'c' evicts nothing tracked below 1... classic MG leaves 'a'
    // dominant; estimates never exceed true counts.
    val m = s.sorted.toMap
    assert(m.keySet.contains("a"))
    assert(m("a") <= 3)
    assert(m.values.forall(_ >= 1))
  }

  test("planted single dominant token surfaces through the full query path") {
    val docs = (1 to 200).map(i => (i.toLong, "needle " * 3 + s"hay$i")).toDF("doc_id", "text")
    val row = docs.select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("token"))
      .agg(MisraGries.mg_topk(col("token"), 64).as("s")).head()
    val top = row.getSeq[org.apache.spark.sql.Row](0).map(r => r.getString(0))
    assert(top.contains("needle"))
  }
}
