package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph clustering over near-duplicate pair lists: connected components by
  * iterative min-label propagation, plus the "keep one canonical document per
  * cluster" step that completes a corpus-dedup pipeline
  * (pairs → components → representatives).
  *
  * Scale design: each iteration is one shuffle (join labels to the adjacency
  * list on the neighbor id) + one hash aggregate (min label per node); rounds
  * needed = graph diameter, which for near-dup clusters is tiny (dup groups
  * are cliques or near-cliques, diameter ≤ 2-3). Lineage is cut per round
  * with an eager localCheckpoint so the plan does not grow exponentially.
  * For adversarial long-chain graphs the standard refinement is large-star /
  * small-star (Kiveris et al., "Connected Components in MapReduce and
  * Beyond"), which converges in O(log n) rounds with the same per-round
  * shuffle shape — propagation is chosen here because dedup graphs are
  * shallow and each round is cheaper.
  */
object Cluster {

  /** Connected components of the undirected graph given by `edges`
    * (columns `srcCol`, `dstCol`). Returns (id, cluster_id) for every node
    * appearing in an edge, where cluster_id = min node id reachable.
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
                          dstCol: String = "id_b", maxIter: Int = 50): DataFrame = {
    // Materialize the adjacency ONCE: it joins into every propagation round,
    // and the edge list is often the output of an expensive upstream plan
    // (e.g. an all-pairs similarity join) that would otherwise re-execute
    // per round.
    val adj = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .localCheckpoint(true)
    var labels = adj.select(col("u").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint(true)
    // Labels are monotonically non-increasing, so the label sum strictly
    // decreases until the fixpoint: convergence = unchanged sum, ONE
    // ungrouped aggregate per round (vs a join against the previous labels).
    // decimal(38,0) because a 100 TB-scale id space overflows a long sum.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head.getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s // empty graph: no labels
    }
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = adj
        .join(labels.select(col("id").as("v"), col("cluster_id").as("n_cluster")), Seq("v"))
        .groupBy(col("u").as("id"))
        .agg(min("n_cluster").as("n_cluster"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("n_cluster"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(true)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      Caching.release(labels) // Dataset.unpersist is a no-op on checkpoints
      labels = next
      iter += 1
    }
    Caching.release(adj)
    labels
  }

  /** Dedup clustering: assign every paired document to its component and
    * mark the canonical representative (min id). Singleton documents (no
    * near-dup pair) are implicitly their own cluster and are omitted —
    * union them back with `is_keep = true` when materializing a cleaned
    * corpus (cheap left_anti against this result).
    */
  def dedupClusters(pairs: DataFrame, srcCol: String = "id_a",
                    dstCol: String = "id_b"): DataFrame =
    connectedComponents(pairs, srcCol, dstCol)
      .withColumn("is_keep", col("id") === col("cluster_id"))
}
