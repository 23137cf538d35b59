package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-state sessionization via flatMapGroupsWithState — the custom
  * twin of [[EventStreams.sessionRollup]]'s built-in session_window.
  *
  * State per user = the one open session; a new event either extends it
  * (gap ≤ limit) or closes it (emitted) and opens a fresh one; the event-
  * time timeout closes the final session once the watermark passes
  * lastTs+gap. This is the canonical GroupState pattern for state the
  * built-ins can't express (the gap rule here CAN be — session_window is
  * the production path — which makes the two implementations mutually
  * checkable in EventStreamsSpec). Scale shape: one shuffle on user_id,
  * state size O(1) per key, timeouts bound state lifetime.
  */
object StatefulSessions {

  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long)

  /** Per-key state (not private: the state encoder's codegen needs
    * public accessors). */
  final case class Open(startMs: Long, lastMs: Long, n: Long)

  def statefulSessionize(spark: SparkSession, events: DataFrame,
                         gapMinutes: Int = 30,
                         watermark: String = "2 hours"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", watermark)
      .select($"user_id", $"ts")
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Open, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user,
              new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n))
          } else {
            val times = rows.map(_._2.getTime).toArray.sorted
            val closed = ArrayBuffer[SessionOut]()
            var open = state.getOption
            times.foreach { t =>
              open = open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(user,
                    new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)
                  Some(Open(t, t, 1))
                case None => Some(Open(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.iterator
          }
      }
  }
}
