package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Pins the transformWithState running-totals operator (Spark 4's
  * arbitrary-state API) against the batch aggregate: after all batches,
  * each user's LAST emitted row (the one with the highest n_events —
  * counts grow monotonically) must equal the batch count/total exactly
  * (cents accumulation makes the fold order-insensitive). Runs on the
  * RocksDB state store provider, the one transformWithState requires. */
class RunningTotalsSpec extends SparkTestBase {

  import spark.implicits._

  test("transformWithState running totals match the batch aggregate across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = graft.Tables(spark, sfDir, "events")
      .select($"ts", $"event_type", $"value", $"user_id", $"event_id")
      .limit(300)
      .as[(Timestamp, String, Double, Long, Long)]
      .collect().map(EventRow.tupled).toSeq
    val (batch1, batch2) = rows.splitAt(rows.size / 2)

    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[EventRow]
      val q = RunningTotals.runningUserTotals(spark, ms.toDF())
        .toDF()
        .writeStream.format("memory").queryName("running_totals")
        .outputMode("update").start()
      try {
        ms.addData(batch1)
        q.processAllAvailable()
        ms.addData(batch2)
        q.processAllAvailable()
      } finally q.stop()

      // final snapshot per user = the row with the max n_events
      val got = spark.table("running_totals")
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
        .values.map { case (u, n, c) => (u, n, c) }.toSet

      val expected = rows.toDF()
        .select($"user_id", ($"value" * 100).cast("long").as("cents"))
        .groupBy($"user_id")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"cents").as("total"))
        .as[(Long, Long, Long)].collect().toSet

      assert(expected.nonEmpty)
      assert(got == expected)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("MapState per-type counts match the batch (user, type) aggregate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.Tables(spark, sfDir, "events")
      .select($"ts", $"event_type", $"value", $"user_id", $"event_id")
      .limit(300)
      .as[(Timestamp, String, Double, Long, Long)]
      .collect().map(EventRow.tupled).toSeq
    val (batch1, batch2) = rows.splitAt(rows.size / 2)

    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[EventRow]
      val q = RunningTotals.typeCounts(spark, ms.toDF())
        .toDF()
        .writeStream.format("memory").queryName("type_counts")
        .outputMode("update").start()
      try {
        ms.addData(batch1); q.processAllAvailable()
        ms.addData(batch2); q.processAllAvailable()
      } finally q.stop()

      // final snapshot per (user, type) = the max running count emitted
      val got = spark.table("type_counts")
        .as[(Long, String, Long)].collect()
        .groupBy(r => (r._1, r._2)).map { case (k, rs) => k -> rs.map(_._3).max }
        .toSet
      val expected = rows.toDF()
        .groupBy($"user_id", $"event_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .as[(Long, String, Long)].collect()
        .map(r => ((r._1, r._2), r._3)).toSet
      assert(expected.nonEmpty)
      assert(got == expected)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("ListState top-k ids stay bounded and match the batch top-k per user") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.Tables(spark, sfDir, "events")
      .select($"ts", $"event_type", $"value", $"user_id", $"event_id")
      .limit(300)
      .as[(Timestamp, String, Double, Long, Long)]
      .collect().map(EventRow.tupled).toSeq
    val (batch1, batch2) = rows.splitAt(rows.size / 2)

    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[EventRow]
      val q = RunningTotals.topEventIds(spark, ms.toDF(), k = 3)
        .toDF()
        .writeStream.format("memory").queryName("top_ids")
        .outputMode("update").start()
      try {
        ms.addData(batch1); q.processAllAvailable()
        ms.addData(batch2); q.processAllAvailable()
      } finally q.stop()

      // final snapshot per user = the longest/greatest emitted list
      // (per-user lists only ever grow toward the true top-3)
      val got = spark.table("top_ids")
        .as[(Long, Seq[Long])].collect()
        .groupBy(_._1).map { case (u, rs) =>
          u -> rs.map(_._2).maxBy(l => (l.length, l.sum)) }
        .toMap
      val expected = rows.groupBy(_.user_id).map { case (u, es) =>
        u -> es.map(_.event_id).sorted(Ordering[Long].reverse).take(3)
      }
      assert(expected.nonEmpty)
      assert(got == expected)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("event-time timers fire inactivity alerts exactly for users who go quiet") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-03-01 09:00:00")
    def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    def ev(min: Int, user: Long, id: Long) = EventRow(at(min), "e", 1.0, user, id)

    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[EventRow]
      // 5-minute gap, 1-minute watermark delay
      val q = RunningTotals.inactivityAlerts(spark, ms.toDF(),
        gapMs = 5 * 60000L, watermark = "1 minute")
        .toDF()
        .writeStream.format("memory").queryName("quiet_alerts")
        .outputMode("append").start()
      try {
        // user 1: events at t+0, t+2, then silence → alert at t+7
        // user 2: keeps active every 3 min through t+12 → no alert yet
        ms.addData(Seq(ev(0, 1, 10), ev(2, 1, 11), ev(0, 2, 20), ev(3, 2, 21)))
        q.processAllAvailable()
        ms.addData(Seq(ev(6, 2, 22), ev(9, 2, 23), ev(12, 2, 24)))
        q.processAllAvailable()
        // watermark now 12-1=11 min > user 1's expiry at 2+5=7 min →
        // the alert fired with user 1's true last-seen; user 2's timer
        // (12+5=17) is still armed
        val got = spark.table("quiet_alerts")
          .as[(Long, Long, Long)].collect().toSet
        assert(got == Set((1L, at(2).getTime, at(7).getTime)))
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
