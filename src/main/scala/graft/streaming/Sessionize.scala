package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state operator of the streaming surface (SURVEY §2.7 maps the
  * reference's iterative re-sync loop onto Structured Streaming; this is the
  * state-store-backed member of that family).
  *
  * Sessions: per-user event runs where consecutive events are ≤ `gapSeconds`
  * apart. Events within one micro-batch are sorted by (ts, event_id) before
  * sessionizing, and open sessions persist in [[GroupState]] across batches,
  * emitted when a later batch's events (or stream end under AvailableNow)
  * close them.
  */
object Sessionize extends Serializable {

  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(startMicros: Long, endMicros: Long, n: Long, sid: Long)
  final case class Session(user_id: Long, session_id: Long, n_events: Long,
                           t_start: java.sql.Timestamp, t_end: java.sql.Timestamp)

  /** Sessionize a (possibly streaming) events frame with columns
    * (user_id long, event_id long, ts timestamp).
    */
  def sessions(events: DataFrame, gapSeconds: Long, emitOpen: Boolean): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L

    def run(key: Long, it: Iterator[Ev], state: GroupState[SessionState]): Iterator[Session] = {
      val evs = it.toArray.sortBy(e => (e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var cur = state.getOption
      evs.foreach { e =>
        val tm = e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000
        cur match {
          case Some(s) if tm - s.endMicros <= gapMicros =>
            cur = Some(s.copy(endMicros = tm, n = s.n + 1))
          case Some(s) =>
            out += toSession(key, s)
            cur = Some(SessionState(tm, tm, 1, s.sid + 1))
          case None =>
            cur = Some(SessionState(tm, tm, 1, 1))
        }
      }
      cur match {
        case Some(s) if emitOpen => out += toSession(key, s); state.remove()
        case Some(s) => state.update(s)
        case None => ()
      }
      out.iterator
    }

    events.select(col("user_id").cast("long"), col("event_id").cast("long"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(run)
  }

  private def toSession(uid: Long, s: SessionState): Session = {
    def ts(micros: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(micros / 1000000L * 1000L)
      t.setNanos(((micros % 1000000L) * 1000L).toInt)
      t
    }
    Session(uid, s.sid, s.n, ts(s.startMicros), ts(s.endMicros))
  }

  /** Run the sessionizer over the staged events stream synchronously and
    * return the finished sessions (AvailableNow: the whole table is one
    * batch, `emitOpen = true` closes trailing sessions).
    */
  def runAvailableNow(stream: DataFrame, gapSeconds: Long, queryName: String): DataFrame = {
    val spark = stream.sparkSession
    val q = sessions(stream, gapSeconds, emitOpen = true)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
