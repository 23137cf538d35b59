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
  final case class Open(startUs: Long, lastUs: Long, n: Long)

  /** Timestamp ↔ microseconds, preserving the full µs precision the
    * fixtures carry — `Timestamp.getTime` alone is millisecond-truncated
    * and silently shifted every emitted boundary until the st8 oracle
    * caught it. */
  private def toMicros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  def statefulSessionize(spark: SparkSession, events: DataFrame,
                         gapMinutes: Int = 30,
                         watermark: String = "2 hours"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

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
              toTs(s.startUs), toTs(s.lastUs), s.n))
          } else {
            val times = rows.map(r => toMicros(r._2)).toArray.sorted
            val closed = ArrayBuffer[SessionOut]()
            var open = state.getOption
            times.foreach { t =>
              open = open match {
                case Some(s) if t >= s.startUs - gapUs && t <= s.lastUs + gapUs =>
                  Some(Open(math.min(s.startUs, t), math.max(s.lastUs, t), s.n + 1))
                case Some(s) if t > s.lastUs + gapUs =>
                  closed += SessionOut(user,
                    toTs(s.startUs), toTs(s.lastUs), s.n)
                  Some(Open(t, t, 1))
                case Some(s) => // late event earlier than start-gap: own session
                  closed += SessionOut(user, toTs(t), toTs(t), 1)
                  Some(s)
                case None => Some(Open(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // timer API is millisecond-granular: round the expiry UP so
              // it never fires before last + gap has fully passed
              state.setTimeoutTimestamp((s.lastUs + gapUs + 999) / 1000)
            }
            closed.iterator
          }
      }
  }
}
