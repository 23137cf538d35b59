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
}
