package graft.queries

import graft.ops.Joins
import org.apache.spark.sql.functions._

/** Analytic extension corpus beyond the reference surface: temporal joins
  * (as-of, range), pivot, exact + sketched distinct counts, exact
  * percentiles. Each is the batch face of an operator a large event/training
  * pipeline needs; oracles in DuckDB where ANSI-expressible.
  */
object ExtendedQueries {
  import Registry.{table => T}

  private val Hour = 3600000000L // micros

  def all: Seq[Q] = Seq(

    // ---- as-of join: each purchase matched to the user's most recent prior
    //      (or simultaneous) click — union + keyed-window shape, one shuffle.
    //      Timestamps surface as epoch micros (cross-harness hash-stable).
    Q("q_asof_join",
      (s, dir) => {
        val ev = Registry.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"))
        Joins.asofJoinBackward(purchases, clicks, Seq("user_id"),
            leftTs = "ts", rightTs = "ts", valueCol = "ts", outCol = "click_ts")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("p_ts_us"),
            unix_micros(col("click_ts")).as("click_ts_us"))
      },
      Some("""SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_ts_us, epoch_us(c.ts) AS click_ts_us
              |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
              |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
              |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)),

    // ---- range join with NO equi-key: events vs derived [h+45min, h+75min)
    //      intervals (deliberately straddling the hourly bucket boundary so
    //      the multi-bucket explode path is exercised)
    Q("q_range_join",
      (s, dir) => {
        val ev = Registry.events(s, dir)
          .select(unix_micros(col("ts")).as("ts_us"), col("value"))
        val ranges = Registry.events(s, dir)
          .select(unix_micros(date_trunc("hour", col("ts"))).as("h")).distinct()
          .select((col("h") + 45L * 60000000L).as("r_start"),
            (col("h") + 75L * 60000000L).as("r_end"))
        Joins.bucketedRangeJoin(ev, "ts_us", ranges, "r_start", "r_end", Hour)
          .groupBy("r_start", "r_end")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      },
      Some("""WITH r AS (SELECT DISTINCT epoch_us(date_trunc('hour', ts)) + 2700000000 AS r_start,
              |    epoch_us(date_trunc('hour', ts)) + 4500000000 AS r_end FROM events)
              |SELECT r_start, r_end, count(*) AS n,
              | cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
              |FROM r JOIN events e ON epoch_us(e.ts) >= r_start AND epoch_us(e.ts) < r_end
              |GROUP BY 1, 2""".stripMargin)),

    // ---- time-series RESAMPLE + GAP-FILL: per-user hourly grid between
    //      the user's first and last event hour (sequence-explode — fully
    //      distributed, no driver loop), left-joined hourly aggregate,
    //      forward-fill via an ignoreNulls running last(). Empty hours
    //      surface with n_events=0 and the last seen hourly sum carried
    //      forward — the resample/ffill primitive every event-feature
    //      pipeline needs. Decimal-summed values so both engines fill the
    //      identical doubles.
    Q("q_resample_ffill",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Registry.events(s, dir).filter(col("user_id") < 50)
        val base = ev.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("v"))
        val grid = base.groupBy("user_id")
          .agg(min("h").as("lo"), max("h").as("hi"))
          .select(col("user_id"),
            explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
        val w = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(base, Seq("user_id", "h"), "left")
          .select(col("user_id"), unix_micros(col("h")).as("hour_us"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            last(col("v"), ignoreNulls = true).over(w).as("v_ffill"))
      },
      Some("""WITH base AS (
              | SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n_events,
              |  cast(sum(cast(value as decimal(12,2))) as double) AS v
              | FROM events WHERE user_id < 50 GROUP BY 1, 2),
              | grid AS (
              | SELECT user_id, unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
              | FROM base GROUP BY user_id)
              |SELECT g.user_id, epoch_us(g.h) AS hour_us,
              | coalesce(b.n_events, 0) AS n_events,
              | last_value(b.v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.h
              |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
              |FROM grid g LEFT JOIN base b ON g.user_id = b.user_id AND g.h = b.h""".stripMargin)),

    // ---- pivot (wide conditional aggregation)
    Q("q_pivot",
      (s, dir) => T(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice").cast("decimal(14,2)")).cast("double")),
      Some("""SELECT o_orderpriority,
              | cast(sum(cast(o_totalprice as decimal(14,2))) FILTER (WHERE o_orderstatus = 'F') as double) AS "F",
              | cast(sum(cast(o_totalprice as decimal(14,2))) FILTER (WHERE o_orderstatus = 'O') as double) AS "O",
              | cast(sum(cast(o_totalprice as decimal(14,2))) FILTER (WHERE o_orderstatus = 'P') as double) AS "P"
              |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // ---- exact distinct count (shuffle: two-phase partial aggregation)
    Q("q_distinct_users",
      (s, dir) => Registry.events(s, dir).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
              |FROM events GROUP BY event_type""".stripMargin)),

    // ---- HLL++ sketched distinct count — the 100 TB path (constant state
    //      per group vs the exact variant's per-value state; sketches merge
    //      map-side). Approximate → rows-only here; the error bound vs the
    //      exact count is asserted in OpsSpec.
    // HLL sketched distinct per group, oracle-gated by BOUNDS: the sketch
    // value itself is engine-specific, but |approx − exact| / exact ≤ 5%
    // (2.5× the 2% configured rsd) is a deterministic claim both engines
    // can state — the exact count and the within-bounds flag are compared.
    Q("q_hll_users",
      (s, dir) => Registry.events(s, dir).groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx"),
          countDistinct(col("user_id")).as("n_users_exact"))
        .select(col("event_type"), col("n_users_exact"),
          (abs(col("approx") - col("n_users_exact")).cast("double") /
            col("n_users_exact").cast("double") <= 0.05).cast("int").as("within_5pct")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users_exact,
              | 1 AS within_5pct
              |FROM events GROUP BY event_type""".stripMargin)),

    // ---- ANALYZE-style table profile (CBO/stats-collection shape):
    //      per-column non-null count, EXACT ndv (hash-matched), min/max
    //      rendered as strings (type-heterogeneous columns in one result),
    //      and the HLL sketch gated within 5% of exact. ONE table scan
    //      into a checkpointed narrow projection, then two cheap passes
    //      over it: a plain aggregate (count/HLL/min/max — deliberately NO
    //      distinct aggregates: Spark's multi-countDistinct rewrite plans
    //      an Expand + double shuffle over rows × columns, measured 25s
    //      where this shape takes ~2s) and a two-stage exact ndv — explode
    //      to (column, rendered value), distinct, count per column — whose
    //      shuffle keys are (col, value): the sketch is the 100 TB keeper,
    //      the exact ndv is its gate. Rendering is injective per type, so
    //      distinct-of-rendered ≡ distinct-of-typed.
    Q("stats_table_profile",
      (s, dir) => {
        import s.implicits._
        val li = T(s, dir, "lineitem")
        val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
        val base = li.select(cols.map(col): _*).localCheckpoint(true)
        try {
          val aggs = cols.flatMap(c => Seq(
            count(col(c)).as(s"n_$c"),
            approx_count_distinct(col(c), 0.02).as(s"andv_$c"),
            min(col(c)).cast("string").as(s"min_$c"),
            max(col(c)).cast("string").as(s"max_$c")))
          val r = base.agg(aggs.head, aggs.drop(1): _*).head()
          val ndv = base.select(
              posexplode(array(cols.map(c => col(c).cast("string")): _*)).as(Seq("ci", "v")))
            .filter(col("v").isNotNull)
            .distinct()
            .groupBy("ci").agg(count(lit(1)).as("ndv"))
            .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
          val rows = cols.zipWithIndex.map { case (c, i) =>
            val b = i * 4
            val nd = ndv.getOrElse(i, 0L)
            val andv = r.getLong(b + 1)
            (c, r.getLong(b), nd, r.getString(b + 2), r.getString(b + 3),
              math.abs(andv - nd).toDouble <= 0.05 * nd)
          }
          rows.toDF("col_name", "n_nonnull", "ndv", "min_s", "max_s", "approx_ok")
        } finally graft.ops.Caching.release(base)
      },
      Some(Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate").map(c =>
        s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
           | count(DISTINCT $c) AS ndv,
           | cast(min($c) as varchar) AS min_s, cast(max($c) as varchar) AS max_s,
           | true AS approx_ok FROM lineitem""".stripMargin)
        .mkString("\nUNION ALL\n"))),

    // ---- grouping sets (the general form behind cube/rollup): per
    //      (status, priority), per status, and grand total in ONE pass —
    //      Catalyst plans a single Expand + hash aggregate, not three scans.
    Q("q_grouping_sets",
      (s, dir) => {
        T(s, dir, "orders").createOrReplaceTempView("orders_gs")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total
                |FROM orders_gs
                |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
              | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin)),

    // ---- analytic window functions (lag / lead / ntile) over the per-user
    //      event timeline: one hash exchange on user_id, per-partition sort,
    //      all three functions evaluated in a single Window operator.
    Q("q_lag_lead",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Registry.events(s, dir)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
            lag("value", 1).over(w).as("prev_value"),
            lead("value", 1).over(w).as("next_value"),
            ntile(4).over(w).as("quartile"))
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
              | lag(value, 1) OVER w AS prev_value,
              | lead(value, 1) OVER w AS next_value,
              | ntile(4) OVER w AS quartile
              |FROM events
              |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    // ---- Batch gap-sessionization — the batch twin of stream_sessionize
    //      under the SAME oracle definition (30-min inactivity gap): lag +
    //      flag + running sum share ONE user_id exchange and sort (three
    //      window steps, one Window partitioning), then the per-session
    //      rollup. The streaming form replays this with
    //      flatMapGroupsWithState; agreeing with the same SQL ties the two
    //      implementations together.
    Q("q_sessionize",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Registry.events(s, dir).select("user_id", "event_id", "ts")
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s", when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1L)
            .otherwise(0L))
          .withColumn("session_id",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            unix_micros(min(col("ts"))).as("t_start_us"),
            unix_micros(max(col("ts"))).as("t_end_us"))
      },
      Some("""WITH e AS (
              |  SELECT user_id, event_id, ts,
              |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              |  FROM events),
              | f AS (SELECT user_id, event_id, ts,
              |    CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END AS new_s
              |  FROM e),
              | g AS (SELECT user_id, ts,
              |    cast(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) as bigint) AS session_id
              |  FROM f)
              |SELECT user_id, session_id, count(*) AS n_events,
              |  epoch_us(min(ts)) AS t_start_us, epoch_us(max(ts)) AS t_end_us
              |FROM g GROUP BY user_id, session_id""".stripMargin)),

    // ---- JSON scalar functions over the events.props payload column:
    //      get_json_object path extraction, cross-checked against DuckDB's
    //      json_extract_string on the same strings.
    Q("q_json_extract",
      (s, dir) => Registry.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k")),
      Some("""SELECT event_type, count(*) AS n,
              | cast(sum(json_extract_string(props, '$.k')::BIGINT) as bigint) AS sum_k,
              | min(json_extract_string(props, '$.k')::BIGINT) AS min_k,
              | max(json_extract_string(props, '$.k')::BIGINT) AS max_k
              |FROM events GROUP BY event_type""".stripMargin)),

    // ---- salted join (replicated probe side): every (key, salt) bucket of
    //      the big side finds its dimension match, so one dominant supplier
    //      key cannot funnel through a single reducer. Values identical to
    //      the plain join (the oracle).
    Q("q_salted_join",
      (s, dir) => {
        val li = T(s, dir, "lineitem").select(col("l_suppkey").as("s_suppkey"), col("l_quantity"))
        val sup = T(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
        val (big, probe) = graft.ops.Skew.saltedJoinKeys(li, sup, Seq("s_suppkey"), saltBuckets = 8)
        big.join(probe, Seq("s_suppkey", "__salt"))
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      },
      Some("""SELECT s_nationkey, count(*) AS n, sum(l_quantity) AS sum_qty
              |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              |GROUP BY s_nationkey""".stripMargin)),

    // ---- window FRAMES (rows-between aggregation — the third window
    //      family next to ranking and offsets): running total and a
    //      3-row moving sum per user timeline. Sums in decimal for
    //      cross-engine hash stability, surfaced as double.
    Q("q_window_frames",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val moving = base.rowsBetween(-2, Window.currentRow)
        Registry.events(s, dir)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
            sum(col("value").cast("decimal(14,2)")).over(running)
              .cast("double").as("running_total"),
            sum(col("value").cast("decimal(14,2)")).over(moving)
              .cast("double").as("moving_sum3"),
            count(lit(1)).over(moving).as("n_in_frame"))
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
              | cast(sum(cast(value as decimal(14,2))) OVER w_run as double) AS running_total,
              | cast(sum(cast(value as decimal(14,2))) OVER w_mov as double) AS moving_sum3,
              | count(*) OVER w_mov AS n_in_frame
              |FROM events
              |WINDOW
              | w_run AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              | w_mov AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // ---- exact percentiles (linear interpolation — same definition as
    //      DuckDB's quantile_cont)
    Q("q_percentiles",
      (s, dir) => T(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.25)).as("q25"),
          percentile(col("l_quantity"), lit(0.5)).as("q50"),
          percentile(col("l_quantity"), lit(0.75)).as("q75")),
      Some("""SELECT l_returnflag, quantile_cont(l_quantity, 0.25) AS q25,
              | quantile_cont(l_quantity, 0.5) AS q50, quantile_cont(l_quantity, 0.75) AS q75
              |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- sketched quantiles (Greenwald-Khanna t-digest-style bounded
    //      state) — the constant-memory partner to q_percentiles, like HLL
    //      to exact distinct. Approximate → rows-only; error vs the exact
    //      percentile asserted in OpsSpec.
    // Sketched quantiles, oracle-gated by RANK bounds: percentile_approx at
    // accuracy 1000 guarantees rank error ≤ 1/1000, so each sketch value
    // must lie within the exact quantile envelope at p ± 0.01 — a
    // deterministic all-true claim (the sketch's exact output is not).
    Q("q_approx_percentiles",
      (s, dir) => {
        def bounded(p: Double, name: String) = Seq(
          percentile_approx(col("l_quantity"), lit(p), lit(1000)).as(s"${name}_approx"),
          expr(s"percentile(l_quantity, ${p - 0.01})").as(s"${name}_lo"),
          expr(s"percentile(l_quantity, ${p + 0.01})").as(s"${name}_hi"))
        val agg = T(s, dir, "lineitem").groupBy("l_returnflag")
          .agg(bounded(0.25, "q25").head,
            (bounded(0.25, "q25").tail ++ bounded(0.5, "q50") ++ bounded(0.75, "q75")): _*)
        def ok(name: String) =
          (col(s"${name}_approx") >= col(s"${name}_lo") &&
            col(s"${name}_approx") <= col(s"${name}_hi")).cast("int").as(s"ok_$name")
        agg.select(col("l_returnflag"), ok("q25"), ok("q50"), ok("q75"))
      },
      Some("""SELECT l_returnflag, 1 AS ok_q25, 1 AS ok_q50, 1 AS ok_q75
              |FROM lineitem GROUP BY l_returnflag""".stripMargin))
  )
}
