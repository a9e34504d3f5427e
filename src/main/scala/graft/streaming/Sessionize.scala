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
            // Merge with max/min, not overwrite: a cross-batch OUT-OF-ORDER
            // event inside the lateness budget (watermark < ts < endMicros)
            // must never REGRESS t_end (a regressed end both mis-reports the
            // session and mis-bases the next gap-close test), and an event
            // older than the recorded start extends the session downward.
            cur = Some(SessionState(math.min(s.startMicros, tm),
              math.max(s.endMicros, tm), s.n + 1))
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

  /** Watermark-bounded variant of [[sessionSnapshots]] — the production
    * form for a CONTINUOUS feed. [[sessionSnapshots]] keeps one open-session
    * state row per user forever (`NoTimeout`): every user that ever appeared
    * holds state for the stream's life. Here the state is bounded by
    * `EventTimeTimeout`: a session whose close instant (`t_end + gap`) the
    * watermark has passed can never be extended — any event that COULD
    * extend it (`ts ≤ t_end + gap ≤ watermark`) would be dropped as late —
    * so the operator emits its final form and DELETES the state row. State
    * size is therefore ∝ users active within one (gap + watermark-delay)
    * horizon, not users-ever-seen.
    *
    * Out-of-order events the watermark still ADMITS (watermark < ts, even
    * when ts is older than the open session's current end) are handled:
    * the merge takes end = max and start = min, so a late-but-in-budget
    * arrival can extend a session backward but never regress its end —
    * and the gap-close timeout is always based on the true max end.
    * Events older than the watermark are dropped by the operator itself,
    * exactly the lateness contract the caller chose.
    *
    * Emission is close-only (gap-close in batch, timeout, or
    * already-expired at batch end): each session is emitted exactly once,
    * so no snapshot reconciliation is needed downstream — run
    * [[finalizeSessions]] for the per-user numbering only. On a finite
    * feed, open sessions at end-of-stream need the watermark pushed past
    * them to flush — stage a sentinel event (filtered out of the result)
    * far enough ahead, exactly as the append-mode windowed aggregation
    * does.
    *
    * `events` must already carry `withWatermark("ts", …)` — event-time
    * timeouts require it, and the delay choice belongs to the caller's
    * latency/lateness contract.
    */
  def sessionSnapshotsBounded(events: DataFrame, gapSeconds: Long): Dataset[SessionEmit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L

    def run(key: Long, it: Iterator[Ev], state: GroupState[SessionState]): Iterator[SessionEmit] = {
      if (state.hasTimedOut) {
        // Watermark passed t_end + gap: the session is final — emit & drop.
        val out = state.getOption.map(toEmit(key, _)).iterator
        state.remove()
        out
      } else {
        val evs = it.toArray.sortBy(e => (micros(e.ts), e.event_id))
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionEmit]
        var cur = state.getOption
        evs.foreach { e =>
          val tm = micros(e.ts)
          cur match {
            case Some(s) if tm - s.endMicros <= gapMicros =>
              // Merge with max/min, not overwrite: a cross-batch OUT-OF-ORDER
              // event inside the lateness budget (watermark < ts < endMicros)
              // must never REGRESS t_end (a regressed end both mis-reports the
              // session and mis-bases the next gap-close test), and an event
              // older than the recorded start extends the session downward.
              cur = Some(SessionState(math.min(s.startMicros, tm),
                math.max(s.endMicros, tm), s.n + 1))
            case Some(s) =>
              out += toEmit(key, s) // closed in-batch — final
              cur = Some(SessionState(tm, tm, 1))
            case None =>
              cur = Some(SessionState(tm, tm, 1))
          }
        }
        cur.foreach { s =>
          val closeMs = s.endMicros / 1000L + gapSeconds * 1000L
          if (closeMs <= state.getCurrentWatermarkMs()) {
            // Already expired as of this batch's watermark (setTimeout in
            // the past is illegal, and the timeout would fire next batch
            // anyway): close now — same final form, one batch earlier.
            out += toEmit(key, s)
            state.remove()
          } else {
            state.update(s)
            state.setTimeoutTimestamp(closeMs)
          }
        }
        out.iterator
      }
    }

    events.select(col("user_id").cast("long"), col("event_id").cast("long"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(run)
  }

  /** Result of a drained bounded run: the finished sessions plus the state
    * rows the final micro-batch left behind — the operator's bounded-state
    * claim, observable (a sentinel-flushed finite feed should leave only
    * the sentinel user's own state).
    */
  final case class BoundedRun(sessions: DataFrame, finalStateRows: Long)

  /** Drain a watermarked events stream through [[sessionSnapshotsBounded]]
    * synchronously. The caller stages the feed so the watermark ends past
    * every real session's close instant (sentinel batches); sessions are
    * emitted exactly once, so only numbering remains.
    */
  def runAvailableNowBounded(watermarked: DataFrame, gapSeconds: Long,
                             queryName: String): BoundedRun = {
    val spark = watermarked.sparkSession
    val q = sessionSnapshotsBounded(watermarked, gapSeconds)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stateRows = q.recentProgress.flatMap(_.stateOperators)
      .lastOption.map(_.numRowsTotal).getOrElse(-1L)
    BoundedRun(finalizeSessions(spark.table(queryName)), stateRows)
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
