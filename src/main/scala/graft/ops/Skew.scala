package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join splitting handles skewed JOINS at runtime; skewed
  * AGGREGATION keys (a handful of giant groups) still funnel each hot group
  * through one reducer under a plain `groupBy`. [[saltedAgg]] is the
  * standard two-phase fix: aggregate on (key, salt) first — fanning each hot
  * key across `saltBuckets` reducers — then combine the partials per key.
  * Works for any algebraic aggregate (count/sum/min/max and compositions);
  * the caller supplies both phases.
  */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param partials phase-1 aggregates over (keyCols + salt); one Column per
    *                 aggregate, each aliased
    * @param combine  phase-2 re-aggregates of the phase-1 outputs (referencing
    *                 the phase-1 aliases), producing the final per-key values
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
                partials: Seq[Column], combine: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted.groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .drop("__salt")
    phase1.groupBy(keyCols.map(col): _*).agg(combine.head, combine.tail: _*)
  }

  /** Salted count/sum — the common case packaged: per-key row count and sums
    * of `sumCols`, resistant to hot keys.
    */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], sumCols: Seq[String],
                     saltBuckets: Int = 32): DataFrame =
    saltedAgg(df, keyCols, saltBuckets,
      partials = count(lit(1)).as("__n") +: sumCols.map(c => sum(col(c)).as(s"__s_$c")),
      combine = sum(col("__n")).as("n") +: sumCols.map(c => sum(col(s"__s_$c")).as(s"sum_$c")))

  /** Salt the BUILD side of a join against a replicated probe side: each
    * probe row is exploded `saltBuckets` ways so every (key, salt) bucket
    * finds its match. Use when one join key dominates and the probe side is
    * small enough to replicate but too big to broadcast outright; otherwise
    * prefer AQE's skew-join handling.
    */
  def saltedJoinKeys(big: DataFrame, small: DataFrame, keyCols: Seq[String],
                     saltBuckets: Int): (DataFrame, DataFrame) = {
    val bigSalted = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val smallExploded = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    (bigSalted, smallExploded)
  }
}
