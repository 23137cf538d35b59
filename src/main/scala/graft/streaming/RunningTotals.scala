package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.unix_millis
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user running totals via Spark 4's `transformWithState` — the
  * arbitrary-state API that supersedes `flatMapGroupsWithState`
  * ([[StatefulSessions]] keeps the classic API for comparison). What the
  * new surface buys at 100 TB/day:
  *
  *  - state is DECLARED (named ValueState/ListState/MapState with their
  *    own encoders and per-state TTL) instead of one opaque blob, so the
  *    store can evolve schema and evict per-state;
  *  - explicit TimeMode separates event-time timers from processing-time
  *    timers at the API level;
  *  - requires the RocksDB state store provider (Spark ships
  *    rocksdbjni), whose changelog checkpointing keeps snapshot upload
  *    cost off the hot path — the provider a production deployment runs.
  *
  * The operator itself is the simplest always-on aggregate: per-user
  * event count + total, emitted per micro-batch in Update mode. Totals
  * accumulate in CENTS (long) so the incremental fold is bit-identical
  * to the batch aggregate regardless of arrival order — the parity spec
  * pins stream == batch exactly.
  */
object RunningTotals {

  final case class Totals(user_id: Long, n_events: Long, cents_total: Long)

  /** Keyed processor: one ValueState holding (count, cents). */
  class Processor extends StatefulProcessor[Long, (Long, Long), Totals] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                 timerValues: TimerValues): Iterator[Totals] = {
      var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, c) => n += 1; cents += c }
      totals.update((n, cents))
      Iterator.single(Totals(key, n, cents))
    }
  }

  /** Events `(user_id, value)` → running per-user totals, one updated row
    * per user per micro-batch. Callers must run with the RocksDB state
    * store provider (`spark.sql.streaming.stateStore.providerClass`). */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[Totals] = {
    import spark.implicits._
    events
      .select($"user_id", ($"value" * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }

  final case class QuietAlert(user_id: Long, last_seen_ms: Long, fired_at_ms: Long)

  /** Inactivity alerts via EVENT-TIME TIMERS — the other half of the
    * transformWithState surface ([[Processor]] covers declared state;
    * this covers `registerTimer`/`handleExpiredTimer`): each event
    * re-arms the user's timer at last_seen + gap, and when the WATERMARK
    * crosses an armed timer the expiry callback emits a "user went
    * quiet" row and clears the key's state. This is the push-based churn
    * trigger: no per-interval rescans of the user table — silence itself
    * produces the row, from O(active users) state, each key carrying one
    * long and one armed timer. */
  class QuietProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, Long), QuietAlert] {
    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long]("last_seen",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                 timerValues: TimerValues): Iterator[QuietAlert] = {
      val newest = rows.map(_._2).max
      val prev = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      if (newest > prev) {
        // re-arm: one live timer per key (delete the stale one if armed)
        if (prev != Long.MinValue) getHandle.deleteTimer(prev + gapMs)
        lastSeen.update(newest)
        getHandle.registerTimer(newest + gapMs)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[QuietAlert] = {
      val last = lastSeen.get()
      lastSeen.clear()
      Iterator.single(QuietAlert(key, last, expiredTimerInfo.getExpiryTimeInMs))
    }
  }

  /** Events `(ts, user_id)` with a watermark → one QuietAlert per user
    * whose silence exceeds `gapMs` (event time). */
  def inactivityAlerts(spark: SparkSession, events: DataFrame,
                       gapMs: Long, watermark: String = "10 minutes"): Dataset[QuietAlert] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select($"user_id", unix_millis($"ts").as("event_ms"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new QuietProcessor(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }

  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-user per-event-type counts via MAP STATE — the third state
    * primitive (ValueState: [[Processor]]; timers: [[QuietProcessor]]).
    * MapState stores each (type → count) entry as its OWN store key, so
    * updating one event type never rewrites the user's whole profile —
    * the point at 100 TB: a ValueState holding a Map would serialize the
    * full map per update, O(|types|) write amplification per event. */
  class TypeCountProcessor extends StatefulProcessor[Long, (Long, String), TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("type_counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
                                 timerValues: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { case (_, t) =>
        val cur = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, cur + 1)
        touched += t
      }
      touched.iterator.map(t => TypeCount(key, t, counts.getValue(t)))
    }
  }

  /** Events `(user_id, event_type)` → running per-(user, type) counts,
    * emitting only the types touched in each micro-batch. */
  def typeCounts(spark: SparkSession, events: DataFrame): Dataset[TypeCount] = {
    import spark.implicits._
    events
      .select($"user_id", $"event_type")
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TypeCountProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  final case class TopIds(user_id: Long, top_ids: Seq[Long])

  /** Bounded top-k event ids per user via LIST STATE — the fourth and
    * last state primitive. The list is re-put truncated to k every
    * update, so state stays O(k) per user forever — the always-on
    * "retain the N best/latest per key" shape (dedup candidates, recent
    * history for features) that an unbounded collect_list would OOM.
    * Top-BY-ID (not arrival order) keeps the result deterministic under
    * shuffled within-batch arrival. */
  class TopIdsProcessor(k: Int) extends StatefulProcessor[Long, (Long, Long), TopIds] {
    @transient private var ids: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ids = getHandle.getListState[Long]("ids", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                 timerValues: TimerValues): Iterator[TopIds] = {
      val merged = (ids.get().toSeq ++ rows.map(_._2))
        .sorted(Ordering[Long].reverse).take(k)
      ids.put(merged.toArray)
      Iterator.single(TopIds(key, merged))
    }
  }

  /** Events `(user_id, event_id)` → running top-k event ids per user. */
  def topEventIds(spark: SparkSession, events: DataFrame, k: Int = 3): Dataset[TopIds] = {
    import spark.implicits._
    events
      .select($"user_id", $"event_id")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new TopIdsProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }
}
