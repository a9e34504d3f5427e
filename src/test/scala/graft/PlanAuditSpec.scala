package graft

import graft.queries.Registry
import org.apache.spark.sql.DataFrame

/** PLANS.md's structural claims as regression tests: the plans the corpus
  * was tuned to produce (broadcast star joins, single-exchange windows,
  * zero-shuffle chunking, parquet pushdown, top-k without a global sort)
  * must SURVIVE code movement — a silent fallback to a shuffle or a
  * sort-merge join is a scale regression the oracle check cannot see.
  *
  * Assertions run against the RUNTIME plan (executed once, so AQE's final
  * decisions — not the static estimate — are what's checked).
  */
class PlanAuditSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    // collect(), not count(): count() runs a SEPARATE QueryExecution (and
    // prunes the audited projections), leaving df's own AdaptiveSparkPlan
    // unfinalized — the assertions would silently run against the static
    // estimate (caught by review; verified against the build's Spark).
    df.collect()
    // A finalized AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
    // "== Initial Plan ==" sections — keep only the final one, or every
    // node (and every Exchange) counts twice.
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  private def planOf(name: String): String =
    finalPlan(Registry.queries(name)(spark, sf001))

  test("pipeline_cdc_chunk: no data-sized shuffle — chunking is a pure map (plus the small-input widen)") {
    val p = planOf("pipeline_cdc_chunk")
    // The compute-dense map may widen a BELOW-CORE-COUNT scan with one
    // round-robin exchange of the raw text; a key-hash exchange would mean
    // the chunker stopped being a map.
    assert(!p.contains("Exchange hashpartitioning"), p.linesIterator.take(12).mkString("\n"))
    val n = "Exchange".r.findAllIn(p).size
    assert(n <= 1, s"expected at most the widen exchange, got $n")
  }

  test("q5_multi_join: all-broadcast star join, fact scanned once, no sort-merge") {
    val p = planOf("q5_multi_join")
    assert(!p.contains("SortMergeJoin"), p.linesIterator.take(20).mkString("\n"))
    val nBhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(nBhj >= 4, s"expected >=4 broadcast joins, got $nBhj")
    val factScans = p.linesIterator.count(l => l.contains("Scan parquet") && l.contains("lineitem"))
    assert(factScans == 1, s"lineitem must be scanned exactly once, got $factScans")
  }

  test("p2_eq_filter: predicate reaches the parquet scan") {
    val p = planOf("p2_eq_filter")
    assert(p.contains("PushedFilters: [IsNotNull") || p.contains("PushedFilters: [EqualTo"),
      p.linesIterator.filter(_.contains("Scan")).mkString("\n"))
  }

  test("q3_join_topk: top-k via TakeOrderedAndProject, not a global sort") {
    val p = planOf("q3_join_topk")
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(8).mkString("\n"))
  }

  test("j1_anti_missing: anti join is broadcast at small scale (AQE-final)") {
    val p = planOf("j1_anti_missing")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.linesIterator.take(20).mkString("\n"))
  }

  test("q1_agg: single exchange between partial and final aggregation") {
    val p = planOf("q1_agg")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n == 1, s"expected exactly 1 hash exchange, got $n")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final HashAggregate")
  }

  test("knn_brute_topk: per-query top-k via the partial bounded-heap aggregate, no Window/global Sort") {
    val p = planOf("knn_brute_topk")
    assert(p.contains("partial_topkbyscore"),
      "map-side partial heap must ship only k entries per task: " +
        p.linesIterator.take(10).mkString("\n"))
    assert(!p.contains("Window") && !p.contains("Sort "),
      p.linesIterator.filter(l => l.contains("Window") || l.contains("Sort")).mkString("\n"))
  }

  test("q_window_top_order: exactly one hash-partitioning exchange feeds the window") {
    val p = planOf("q_window_top_order")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n == 1, s"expected exactly 1 hash exchange, got $n:\n" +
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }
}
