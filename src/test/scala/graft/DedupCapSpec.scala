package graft

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame

/** Hot-shingle df-cap semantics for the inverted-index pair operators:
  * equivalence when no shingle exceeds the cap, and bounded loss (only
  * boilerplate-decided pairs disappear; content pairs keep exact scores)
  * when the cap is active.
  */
class DedupCapSpec extends SparkSpec {
  import spark.implicits._

  // d1/d2: a genuine near-dup pair over RARE shingles (jaccard 0.6).
  // d10..d19: ten docs sharing ONE boilerplate shingle (df = 10) plus two
  // unique shingles each — any two of them score 1/(3+3-1) = 0.2, decided
  // ONLY by the hot shingle.
  private def fixture: DataFrame = {
    val nearDups = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"))
    val boiler = (10L to 19L).map(i => (i, s"shared boiler plate uniq${i}a uniq${i}b"))
    (nearDups ++ boiler).toDF("doc_id", "text")
  }

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 1e6) / 1e6)).toSet

  test("jaccard cap: inactive cap is exactly equivalent to the uncapped run") {
    val uncapped = pairs(Dedup.jaccardPairsInverted(fixture, "doc_id", "text",
      shingleK = 3, threshold = 0.15))
    val capped = pairs(Dedup.jaccardPairsInverted(fixture, "doc_id", "text",
      shingleK = 3, threshold = 0.15, maxShingleDf = Some(100L)))
    assert(capped == uncapped)
    assert(uncapped.contains((1L, 2L, 0.6)))
    assert(uncapped.size == 1 + 45) // near-dup pair + C(10,2) boilerplate pairs
  }

  test("jaccard cap: active cap drops only boilerplate-decided pairs, keeps exact scores") {
    val capped = pairs(Dedup.jaccardPairsInverted(fixture, "doc_id", "text",
      shingleK = 3, threshold = 0.15, maxShingleDf = Some(5L)))
    // The content pair survives with its EXACT score (none of its shingles
    // are hot); every pair that existed only through the df-10 boilerplate
    // shingle is gone.
    assert(capped == Set((1L, 2L, 0.6)))
  }

  test("containment cap: equivalence below cap; planted subset survives an active cap") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),          // contained in 2
      (2L, "alpha beta gamma delta epsilon zeta eta")) // container
    val fx = (docs ++ (10L to 19L).map(i =>
      (i, s"shared boiler plate uniq${i}a uniq${i}b"))).toDF("doc_id", "text")
    // threshold 0.3 < the boilerplate pairs' 1/3, so they exist UNCAPPED
    // (90 directed pairs) and the active cap must be what removes them.
    val uncapped = pairs(Dedup.containmentPairsInverted(fx, "doc_id", "text",
      shingleK = 3, threshold = 0.3))
    val inactive = pairs(Dedup.containmentPairsInverted(fx, "doc_id", "text",
      shingleK = 3, threshold = 0.3, maxShingleDf = Some(100L)))
    assert(inactive == uncapped)
    assert(uncapped.exists(p => p._1 >= 10L && p._2 >= 10L))
    val capped = pairs(Dedup.containmentPairsInverted(fx, "doc_id", "text",
      shingleK = 3, threshold = 0.3, maxShingleDf = Some(5L)))
    assert(capped == Set((1L, 2L, 1.0), (2L, 1L, 0.6)), s"got: $capped")
  }
}
