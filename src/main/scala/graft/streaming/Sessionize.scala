package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state operator of the streaming surface (SURVEY §2.7 maps the
  * reference's iterative re-sync loop onto Structured Streaming; this is the
  * state-store-backed member of that family).
  *
  * Sessions: per-user event runs where consecutive events are ≤ `gapSeconds`
  * apart. Multi-batch-correct by construction: a session is IDENTIFIED by
  * its start instant, every batch that touches it emits its current
  * (t_start, t_end, n_events) snapshot, open sessions stay in [[GroupState]]
  * across batches, and [[runAvailableNow]] reconciles snapshots by taking
  * the final (max-n) emission per (user, t_start) — so a session spanning
  * micro-batches is one session, not a per-batch fragment. (The previous
  * design cleared state at each batch end, splitting cross-batch sessions.)
  *
  * In-order feeds only across batches (the usual file-stream contract):
  * within a batch events are sorted by (ts, event_id); an event older than
  * an already-closed session would start a new overlapping session, exactly
  * as any gap-sessionizer without late-data watermarking.
  */
object Sessionize extends Serializable {

  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(startMicros: Long, endMicros: Long, n: Long)
  /** One per-batch snapshot of a session (final iff the session closed). */
  final case class SessionEmit(user_id: Long, n_events: Long,
                               t_start: java.sql.Timestamp, t_end: java.sql.Timestamp)

  /** Raw per-batch session snapshots for a (possibly streaming) events frame
    * with columns (user_id long, event_id long, ts timestamp). Downstream
    * must reconcile duplicates per (user_id, t_start) — see [[finalize]].
    */
  def sessionSnapshots(events: DataFrame, gapSeconds: Long): Dataset[SessionEmit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L

    def run(key: Long, it: Iterator[Ev], state: GroupState[SessionState]): Iterator[SessionEmit] = {
      val evs = it.toArray.sortBy(e => (micros(e.ts), e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionEmit]
      var cur = state.getOption
      evs.foreach { e =>
        val tm = micros(e.ts)
        cur match {
          case Some(s) if tm - s.endMicros <= gapMicros =>
            cur = Some(s.copy(endMicros = tm, n = s.n + 1))
          case Some(s) =>
            out += toEmit(key, s) // closed — final snapshot
            cur = Some(SessionState(tm, tm, 1))
          case None =>
            cur = Some(SessionState(tm, tm, 1))
        }
      }
      cur.foreach { s =>
        out += toEmit(key, s) // open — snapshot now, KEEP state for next batch
        state.update(s)
      }
      out.iterator
    }

    events.select(col("user_id").cast("long"), col("event_id").cast("long"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(run)
  }

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  private def toEmit(uid: Long, s: SessionState): SessionEmit = {
    def ts(micros: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(micros / 1000000L * 1000L)
      t.setNanos(((micros % 1000000L) * 1000L).toInt)
      t
    }
    SessionEmit(uid, s.n, ts(s.startMicros), ts(s.endMicros))
  }

  /** Reconcile snapshots to final sessions: last (max-n) emission per
    * (user, t_start), then 1-based session numbering per user in start
    * order — the batch lag/cumsum oracle's exact shape.
    */
  def finalizeSessions(snapshots: DataFrame): DataFrame =
    snapshots.groupBy(col("user_id"), col("t_start"))
      .agg(max(col("n_events")).as("n_events"), max(col("t_end")).as("t_end"))
      .withColumn("session_id", row_number()
        .over(Window.partitionBy("user_id").orderBy("t_start")).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("t_start"), col("t_end"))

  /** Run the sessionizer over the staged events stream synchronously and
    * return the finished sessions (AvailableNow drains every pending batch;
    * the final batch's open-session snapshots are their last word).
    */
  def runAvailableNow(stream: DataFrame, gapSeconds: Long, queryName: String): DataFrame = {
    val spark = stream.sparkSession
    val q = sessionSnapshots(stream, gapSeconds)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    finalizeSessions(spark.table(queryName))
  }
}
