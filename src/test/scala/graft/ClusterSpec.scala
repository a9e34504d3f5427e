package graft

import graft.ops.Cluster
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels chains, cliques, and singleton-free pairs") {
    // Components: {1,2,3,4} (a chain — needs >1 propagation round),
    // {10,11,12} (a triangle), {20,21} (an isolated pair).
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("id_a", "id_b")
    val got = Cluster.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dedupClusters marks exactly one keeper per component") {
    val edges = Seq((5L, 9L), (9L, 7L), (100L, 101L)).toDF("id_a", "id_b")
    val got = Cluster.dedupClusters(edges)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((5L, 5L, true), (9L, 5L, false), (7L, 5L, false),
      (100L, 100L, true), (101L, 100L, false)))
    assert(got.count(_._3) == 2)
  }

  test("empty edge list yields an empty labeling") {
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Cluster.connectedComponents(edges).isEmpty)
    assert(Cluster.dedupClusters(edges).isEmpty)
  }

  test("long path converges within diameter rounds") {
    // Path 0-1-2-...-9: min label must travel the full length.
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Cluster.connectedComponents(edges).as[(Long, Long)].collect()
    assert(got.length == 10 && got.forall(_._2 == 0L))
  }
}
