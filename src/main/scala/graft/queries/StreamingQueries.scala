package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming corpus: the reference's raison d'être is iterative
  * re-sync (README.md:24); its Spark-native form is a micro-batch streaming
  * pipeline. These queries run a real `readStream → writeStream` cycle
  * synchronously (Trigger.AvailableNow + memory sink), so the streaming
  * plumbing — source schema inference, watermark, windowed state — is
  * exercised in the verify gate, with batch-SQL oracles.
  */
object StreamingQueries {
  import Registry.{table => T}

  def all: Seq[Q] = Seq(

    // Tumbling-window (1 h) counts per event type, computed by a streaming
    // query over the events parquet. Oracle = the equivalent batch aggregate.
    Q("stream_hourly_counts",
      (s, dir) => {
        val src = Registry.eventsStream(s, dir)
        val agg = src
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
          .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
        val qname = "graft_stream_hourly"
        val q = agg.writeStream.outputMode("complete")
          .format("memory").queryName(qname)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(qname)
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
              | cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
              |FROM events GROUP BY 1, 2""".stripMargin)),

    // Stateful sessionization-lite: per-user event counts and value totals
    // via a streaming aggregation (state store exercised), batch oracle.
    Q("stream_user_totals",
      (s, dir) => {
        val src = Registry.eventsStream(s, dir)
        val agg = src.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
        val qname = "graft_stream_user"
        val q = agg.writeStream.outputMode("complete")
          .format("memory").queryName(qname)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(qname)
      },
      Some("""SELECT user_id, count(*) AS n_events,
              | cast(sum(cast(value as decimal(12,2))) as double) AS total_value
              |FROM events GROUP BY user_id""".stripMargin)),

    // Stateful custom-state operator: flatMapGroupsWithState sessionization
    // (30-minute gap). Oracle = the equivalent batch lag/cumsum windows.
    Q("stream_sessionize",
      (s, dir) => graft.streaming.Sessionize.runAvailableNow(
        Registry.eventsStream(s, dir), gapSeconds = 1800, queryName = "graft_sessions"),
      Some("""WITH e AS (
              |  SELECT user_id, event_id, ts,
              |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              |  FROM events),
              | f AS (SELECT user_id, event_id, ts,
              |    CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END AS new_s
              |  FROM e),
              | g AS (SELECT user_id, ts,
              |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
              |  FROM f)
              |SELECT user_id, session_id, count(*) AS n_events,
              |  min(ts) AS t_start, max(ts) AS t_end
              |FROM g GROUP BY user_id, session_id""".stripMargin))
  )
}
