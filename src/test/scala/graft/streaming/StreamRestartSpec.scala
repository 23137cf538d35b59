package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Pins CHECKPOINT RECOVERY — the deployment property none of the st*
  * oracle rows exercise: a stream stopped after draining part of its
  * inbox and restarted over the SAME checkpoint must (a) not re-emit
  * windows the first run already finalized (exactly-once across
  * restarts) and (b) end with the sink equal to the batch rollup over
  * the whole inbox under the final watermark — byte-identical to what a
  * single uninterrupted run produces. This is the property that lets a
  * daily AvailableNow catch-up job run as a cron loop at 100 TB: each
  * invocation resumes the watermark and aggregation state from the
  * checkpoint and appends only newly finalized windows.
  */
class StreamRestartSpec extends SparkTestBase {
  import spark.implicits._

  test("AvailableNow catch-up resumes from its checkpoint exactly once") {
    val events = Tables(spark, sfDir, "events")
      .withColumn("value", $"value".cast("decimal(18,4)"))
    val dir = java.nio.file.Files.createTempDirectory("graft_restart")
    val inbox = s"$dir/in"
    val ranged = events.repartitionByRange(8, $"ts").sortWithinPartitions("ts")
    ranged.write.parquet(inbox)
    val parts = new java.io.File(inbox).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length == 8)
    // hold back the last 4 time-ranges ("tomorrow's events"), run 1 over
    // the first half, then restore and run 2 over the full inbox
    val held = parts.drop(4).map { f =>
      val away = new java.io.File(s"$dir/held_${f.getName}")
      assert(f.renameTo(away)); (away, f)
    }
    val mtimeBase = parts.map(_.lastModified()).max
    def pinMtimes(): Unit = new java.io.File(inbox).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) =>
        assert(f.setLastModified(mtimeBase + i * 2000L))
      }
    pinMtimes()
    val schema = spark.read.parquet(inbox).schema
    def runOnce(): Unit = {
      val q = EventStreams.hourlyRollup(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2).parquet(inbox))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/chk")
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", s"$dir/out").start()
      q.awaitTermination()
    }
    runOnce()
    val afterFirst = spark.read.parquet(s"$dir/out").count()
    held.foreach { case (away, orig) => assert(away.renameTo(orig)) }
    pinMtimes()
    runOnce()
    val out = spark.read.parquet(s"$dir/out")

    // (a) run 2 appended strictly, re-emitting nothing run 1 finalized
    val perKey = out.groupBy($"hour", $"event_type").count()
      .filter($"count" > 1).count()
    assert(perKey == 0, "restart re-emitted already-finalized windows")
    assert(out.count() > afterFirst,
      "run 2 finalized no new windows — the restart did not resume")

    // (b) final sink == batch rollup under the final watermark
    val maxTs = events.agg(max($"ts")).head().getTimestamp(0)
    val expected = events
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .filter($"hour" + expr("INTERVAL 1 HOUR") <=
        lit(maxTs) - expr("INTERVAL 2 HOURS"))
      .select($"hour", $"event_type", $"n",
        $"sum_value".cast("double").as("sum_value"))
    val got = out
      .select($"hour", $"event_type", $"n",
        $"sum_value".cast("double").as("sum_value"))
      .orderBy($"hour", $"event_type").collect().map(_.toSeq)
    val want = expected.orderBy($"hour", $"event_type")
      .collect().map(_.toSeq)
    assert(got.length == want.length, s"${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }
}
