package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over an event stream — batch (window-function
  * formulation) and streaming (flatMapGroupsWithState) variants. The
  * reference has no event-time surface (SURVEY §2.9 R8); this is part of
  * the training-data/stream-analytics extension of the engine. */
object Sessionize {

  /** Batch: assign session ids per user with a max inactivity gap, then
    * aggregate one row per session. Input needs `user_id` and an epoch-
    * micros long column `us`; unique (user_id, us, event_id) assumed for
    * deterministic ordering. */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
  }

  final case class SessionEvent(userId: Long, us: Long)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class ClosedSession(userId: Long, startUs: Long, endUs: Long, nEvents: Long)

  /** Streaming: custom state via flatMapGroupsWithState (SURVEY §2.9
    * mapping for KeyValueGroupedDataset state). A session closes when a
    * later event for the same user arrives past the gap (event-time gap
    * closure); open sessions persist in state until then. */
  def streaming(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          val sorted = rows.toSeq.sortBy(_.us)
          var closed = List.empty[ClosedSession]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.us - s.end <= gapUs =>
                cur = Some(SessionState(s.start, e.us, s.n + 1))
              case Some(s) =>
                closed ::= ClosedSession(userId, s.start, s.end, s.n)
                cur = Some(SessionState(e.us, e.us, 1))
              case None =>
                cur = Some(SessionState(e.us, e.us, 1))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
        })
  }
}
