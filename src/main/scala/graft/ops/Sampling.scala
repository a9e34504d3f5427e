package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data mixing: the reweight-by-source primitive a
  * training-data pipeline uses to compose a corpus (N% web, M% books, …).
  *
  * Membership is a pure function of the row id — `md5(id)`'s first 8 hex
  * digits mod 10⁴ under a per-source rate — so the sample is reproducible
  * across engines, runs, and cluster layouts (no RNG state, no
  * `TABLESAMPLE` row-order dependence), and the filter pushes down to the
  * scan. Zero shuffles.
  */
object Sampling {

  /** md5-derived bucket in [0, 10000) — both engines compute the identical
    * value from the id's decimal string form.
    */
  def hashBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"), lit(10000L))

  /** Keep ~`rate` of rows, deterministically by id hash. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hashBucket(col(idCol)) < math.round(rate * 10000).toInt)

  /** EXACT-count stratified sample: the first `n` rows of each stratum in
    * deterministic `(hashBucket(id), id)` order — "give me exactly 10k docs
    * per source, reproducibly". The hash order makes the selection a
    * uniform-without-replacement sample that is stable across engines and
    * cluster layouts; the id tiebreak makes it total.
    *
    * Scale note: the rank is one window sort per stratum. When strata are
    * huge relative to `n`, compose with [[hashSample]] first — a rate-based
    * prefilter at a safely generous rate bounds the sorted input while the
    * window still yields the exact same first `n` (the prefilter keeps a
    * prefix of the same hash order).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Leakage-safe train/val/test split: rows are assigned by the hash of
    * their GROUP key — the near-dup cluster root for clustered rows, the
    * row's own id for singletons — so a near-dup cluster can never straddle
    * splits (train/test contamination by paraphrase). `clusters` is
    * `(id, cluster_id)` from [[Cluster.dedupClusters]]; thresholds are in
    * basis points of 10⁴ (8000/1000 ⇒ 80/10/10).
    *
    * One left join (clusters ≪ corpus after dedup) + the same pushed-down
    * bucket filter as [[mixSources]] — no extra shuffle beyond the join.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                       trainBps: Int, valBps: Int): DataFrame = {
    val keyed = df.join(
        clusters.select(col("id").as(idCol), col("cluster_id")), Seq(idCol), "left_outer")
      .withColumn("__gk", coalesce(col("cluster_id"), col(idCol)))
    keyed.withColumn("split",
        when(hashBucket(col("__gk")) < trainBps, "train")
          .when(hashBucket(col("__gk")) < trainBps + valBps, "val")
          .otherwise("test"))
      .drop("cluster_id", "__gk")
  }

  /** Per-source mixing: keep each row iff its hash bucket clears the
    * source's rate (`defaultRate` for sources not listed). Rates are a tiny
    * driver map folded into ONE case expression — no join, no shuffle; the
    * mixed corpus is a single filtered scan.
    */
  def mixSources(df: DataFrame, idCol: String, sourceCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rateCol = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(math.round(defaultRate * 10000).toInt)) { case (acc, (s, r)) =>
        when(col(sourceCol) === s, lit(math.round(r * 10000).toInt)).otherwise(acc)
      }
    df.filter(hashBucket(col(idCol)) < rateCol)
  }

  /** TEMPERATURE-based source mixing — the multilingual/multi-source
    * sampling rule (target proportions ∝ n_s^α): per-source keep rates
    * r_s ∝ n_s^(α−1), normalized so the SMALLEST source keeps everything —
    * α = 1 is passthrough, α → 0 equalizes expected counts, in between
    * up-weights small sources without starving big ones. Rates derive from
    * the data itself: ONE grouped count (collected — bounded by the number
    * of sources), a #sources-sized basis-points map, and the same
    * pushed-down deterministic bucket filter as [[mixSources]] — no join,
    * no shuffle, no RNG state.
    *
    * Returns the mixed frame plus the rate map (basis points) so callers
    * can surface/audit the computed rates. α = 0.5 is computed via
    * exact-rounded `sqrt` (oracle-replayable bit-for-bit); other α use
    * `pow` (replayable in practice; not a correctly-rounded IEEE op).
    */
  def mixByTemperature(df: DataFrame, idCol: String, sourceCol: String,
                       alpha: Double): (DataFrame, Map[String, Int]) = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1]: $alpha")
    require(df.schema(sourceCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"source column `$sourceCol` must be a string (got " +
        s"${df.schema(sourceCol).dataType.simpleString})")
    // NULL sources are not a source: excluded from the counts (they would
    // skew nMin and every real rate) AND from the mix — the equality in
    // the rate fold below never matches NULL, so the two stay consistent.
    val counts = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap // rows ∝ #sources
    require(counts.nonEmpty, "empty input: no sources to mix")
    val nMin = counts.values.min.toDouble
    val bps = counts.map { case (s, n) =>
      val ratio = nMin / n.toDouble
      val rate = if (alpha == 0.5) Math.sqrt(ratio) else Math.pow(ratio, 1.0 - alpha)
      // Quantization floor: every real rate is > 0 (n_s is finite), so a
      // source whose basis-points rounding lands on 0 (≳4e8× larger than the
      // smallest at α=0.5) is FLOORED to 1 bps — heavily downsampled, never
      // silently dropped from the mix.
      s -> math.max(1, Math.round(10000.0 * rate).toInt)
    }
    (df.filter(hashBucket(col(idCol)) < rateColOf(bps, sourceCol)), bps)
  }

  /** The per-row basis-points rate expression for a computed rate map —
    * shared by [[mixByTemperature]]'s filter and callers that surface the
    * rate as an output column (one definition, so the two can never
    * silently desynchronize). Unlisted (and NULL) sources rate 0.
    */
  def rateColOf(bps: Map[String, Int], sourceCol: String): Column =
    bps.toSeq.sortBy(_._1).foldLeft(lit(0)) { case (acc, (s, b)) =>
      when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
}
