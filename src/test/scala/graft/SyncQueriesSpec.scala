package graft

import graft.queries.Registry

/** The sync fixtures are pre-staged once per process and restored per run
  * (file copy / MSCK instead of Spark writes in the timed body) — a second
  * invocation must therefore see the identical perturbed starting state and
  * converge to the identical fingerprint.
  */
class SyncQueriesSpec extends SparkSpec {

  private def runTwice(name: String): Unit = {
    val fn = Registry.queries(name)
    val a = fn(spark, sf001).collect().map(_.toString).sorted.toSeq
    val b = fn(spark, sf001).collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty, s"$name returned no rows")
    assert(a == b, s"$name: restored-fixture run diverged from first run")
  }

  test("sync_database restores its slave base between runs") {
    runTwice("sync_database")
  }

  test("sync_converge_pruned restores the partitioned slave between runs") {
    runTwice("sync_converge_pruned")
  }

  test("sync_converge_bucketed restores the bucketed slave between runs") {
    runTwice("sync_converge_bucketed")
  }
}
