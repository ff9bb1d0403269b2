package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Sessionization over an event stream: events of one user belong to the
  * same session while gaps stay under `gapMinutes`.
  *
  * Two implementations with identical semantics:
  *   - [[sessionizeBatch]]: lag + cumulative-sum window — one shuffle on
  *     user_id, fully codegen'd; DuckDB-oracle-checkable.
  *   - [[sessionizeStream]]: flatMapGroupsWithState with event-time
  *     timeout — the Structured Streaming scale path (bounded state,
  *     emits sessions as they close).
  */
object Sessionize {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, events: Long, total_value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** Batch: session id = running count of gap-breaks per user. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L // compare in microseconds: exact
    events
      .withColumn("_prev", lag(col("ts"), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev").isNull ||
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("_prev").cast("timestamp")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("_new_session").over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("events"),
        round(sum("value"), 2).as("total_value"))
      .drop("session_id")
  }

  /** Streaming: per-user state holds the open session; event-time timeout
    * closes it `gapMinutes` past the watermark. Session arithmetic is in
    * MICROSECONDS (matching the batch variant's unix_micros exactly —
    * Timestamp.getTime truncates to ms and disagrees at gap boundaries).
    */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var closed = List.empty[Session]
      var cur = state.getOption
      for (e <- sorted) {
        val t = micros(e.ts)
        cur match {
          case Some(s) if t - s.end <= gapUs =>
            cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
          case Some(s) =>
            closed ::= Session(userId, toTs(s.start), toTs(s.end), s.n,
              BigDecimal(s.total).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      if (state.hasTimedOut) {
        val out = cur.map(s => Session(userId, toTs(s.start), toTs(s.end),
          s.n, BigDecimal(s.total).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
        state.remove()
        return (closed.reverse ++ out).iterator
      }
      cur.foreach { s =>
        state.update(s)
        // timeout API is ms; an admissible late event can have
        // end + gap < watermark, and setTimeoutTimestamp throws for
        // timestamps behind the watermark — clamp forward
        val wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(math.max((s.end + gapUs) / 1000L, wm + 1))
      }
      closed.reverse.iterator
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
