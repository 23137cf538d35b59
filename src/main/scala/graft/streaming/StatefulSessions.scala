package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-state sessionization via flatMapGroupsWithState — the custom
  * twin of [[EventStreams.sessionRollup]]'s built-in session_window.
  *
  * State per user = the one open session. An event within
  * [start−gap, last+gap] merges (extending either end — handles
  * out-of-order arrivals above the watermark); an event past last+gap
  * closes the session and opens a fresh one; an above-watermark event
  * older than start−gap emits as its own immediate session (single-open-
  * session state cannot grow a second earlier session — a documented
  * trade-off; session_window's full interval-merge is the production
  * path). The event-time timeout closes the final session once the
  * watermark passes lastTs+gap. Boundary contract: an exactly-gap-apart
  * pair MERGES, matching batch q19's strict > rule (session_window's
  * half-open intervals split there instead). Scale shape: one shuffle on
  * user_id, O(1) state per key, timeouts bound state lifetime.
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
                case Some(s) if t >= s.startMs - gapMs && t <= s.lastMs + gapMs =>
                  Some(Open(math.min(s.startMs, t), math.max(s.lastMs, t), s.n + 1))
                case Some(s) if t > s.lastMs + gapMs =>
                  closed += SessionOut(user,
                    new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)
                  Some(Open(t, t, 1))
                case Some(s) => // late event earlier than start-gap: own session
                  closed += SessionOut(user, new Timestamp(t), new Timestamp(t), 1)
                  Some(s)
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
