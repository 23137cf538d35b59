package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pins st1's contract: the AvailableNow catch-up emits EXACTLY the
  * windows the watermark finalizes — equal, row for row, to the batch
  * rollup restricted to windows whose end is at or below max(ts) − 2 h.
  * This is the same rule the DuckDB oracle replays for the driver. */
class StreamQueriesSpec extends SparkTestBase {

  test("st1 catch-up equals batch rollup over watermark-closed windows") {
    import spark.implicits._
    val streamed = StreamQueries.hourlyRollupCatchUp(spark, sfDir)

    val events = Tables(spark, sfDir, "events")
    val maxTs = events.agg(max($"ts")).head().getTimestamp(0)
    val expected = events
      .withColumn("value", $"value".cast("decimal(18,4)"))
      .groupBy(date_trunc("hour", $"ts").as("win_start"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .filter($"win_start" + expr("INTERVAL 1 HOUR") <=
        lit(maxTs) - expr("INTERVAL 2 HOURS"))
      .select($"win_start", $"event_type", $"n",
        $"sum_value".cast("double").as("sum_value"))
      .orderBy($"win_start", $"event_type")

    val got = streamed.collect().map(_.toSeq)
    val want = expected.collect().map(_.toSeq)
    assert(got.length == want.length,
      s"row count ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }
}
