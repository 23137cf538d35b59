package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

final case class EventRow(ts: Timestamp, event_type: String, value: Double,
                          user_id: Long, event_id: Long)

final case class DocRow(ts: Timestamp, doc_id: Long, text: String)

/** Verifies the streaming plane (VERDICT r1 "What's missing" #5): the
  * windowed aggregates must produce the same rows as their batch twins on
  * identical data, and the conversion stream must drain an inbox through
  * the kernel. Watermark mechanics: append mode only emits a window after
  * the watermark passes its end, and the watermark advances at the END of
  * a micro-batch — hence the two far-future sentinel rounds.
  */
class EventStreamsSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val data: Seq[EventRow] = {
    graft.Tables(spark, sfDir, "events")
      .select($"ts", $"event_type", $"value", $"user_id", $"event_id")
      .limit(400)
      .as[(Timestamp, String, Double, Long, Long)]
      .collect().map(EventRow.tupled).toSeq
  }

  private def maxTs: Timestamp = data.map(_.ts).max(Ordering.by((t: Timestamp) => t.getTime))

  private def sentinel(plusHours: Int) = EventRow(
    new Timestamp(maxTs.getTime + plusHours * 3600L * 1000), "__wm__", 0.0, -1L, -1L)

  /** Run a streaming transform of EventRow data through a memory sink in
    * append mode, advancing the watermark far enough to close every
    * data window. */
  private def runStream(name: String,
                        transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
  : org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventRow]
    val q = transform(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(data)
      q.processAllAvailable()
      ms.addData(Seq(sentinel(100))) // advances watermark past all data windows
      q.processAllAvailable()
      ms.addData(Seq(sentinel(200))) // next batch actually emits them
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter($"event_type".isNull || $"event_type" =!= "__wm__")
  }

  test("stream-stream interval join emits exactly the batch follow-up pairs (q26 twin)") {
    val streamed = runStream("followup_out",
      df => EventStreams.followupPairsStream(df).select(
        $"a_id", $"b_id", lit(null).cast("string").as("event_type")))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val df = data.toDF()
    val batch = df.as("a").join(df.as("b"), expr(
      "a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTES"))
      .select($"a.event_id", $"b.event_id").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty) // fixture must actually exercise the join
    assert(streamed == batch)
  }

  test("left-outer interval join emits unmatched triggers at state eviction (outer q26 twin)") {
    // the sentinel rows are themselves unmatched triggers in an OUTER
    // join (user -1 never recurs), so filter them by id, not event_type
    val streamed = runStream("followup_outer_out",
      df => EventStreams.followupPairsStreamOuter(df).select(
        $"a_id", $"b_id", lit(null).cast("string").as("event_type")))
      .filter($"a_id" =!= -1L)
      .select($"a_id", $"b_id").as[(Long, Option[Long])].collect().toSet
    val df = data.toDF()
    val batch = df.as("a").join(df.as("b"), expr(
      "a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTES"),
      "left_outer")
      .select($"a.event_id", $"b.event_id").as[(Long, Option[Long])].collect().toSet
    // fixture must exercise BOTH outcomes: matched pairs and
    // no-follow-up triggers (the null-extended rows the outer form adds)
    assert(batch.exists(_._2.isEmpty) && batch.exists(_._2.nonEmpty))
    assert(streamed == batch)
  }

  test("composed curation chain (dedup → enrich → rollup) matches its batch twin") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = graft.Tables(spark, sfDir, "customer")
    // plant at-least-once redelivery: 50 events appear in BOTH batches
    val (batch1, batch2) = data.splitAt(data.size / 2)
    val redelivered = batch1.takeRight(50)

    val ms = MemoryStream[EventRow]
    val q = EventStreams.curatedSegmentRollup(ms.toDF(), dim)
      .writeStream.format("memory").queryName("curated_rollup")
      .outputMode("append").start()
    try {
      ms.addData(batch1)
      q.processAllAvailable()
      ms.addData(redelivered ++ batch2)
      q.processAllAvailable()
      ms.addData(Seq(sentinel(100)))
      q.processAllAvailable()
      ms.addData(Seq(sentinel(200)))
      q.processAllAvailable()
    } finally q.stop()

    // exclude the sentinel rows' own far-future windows
    val horizon = new Timestamp(maxTs.getTime + 3600L * 1000)
    val got = spark.table("curated_rollup")
      .filter($"hour" <= horizon)
      .as[(Timestamp, String, Long, Long)].collect().toSet

    val expected = data.toDF()
      .dropDuplicates("event_id")
      .withColumn("cents", ($"value" * 100).cast("long"))
      .join(dim.select($"c_custkey", $"c_mktsegment"),
        $"user_id" === $"c_custkey", "left_outer")
      .groupBy(window($"ts", "1 hour").as("w"),
        coalesce($"c_mktsegment", lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n_events"), sum($"cents").as("cents_sum"))
      .select($"w.start", $"segment", $"n_events", $"cents_sum")
      .as[(Timestamp, String, Long, Long)].collect().toSet

    assert(expected.nonEmpty)
    assert(got == expected)
  }

  test("stream-static enrichment join matches the batch dimension lookup, stateless") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = graft.Tables(spark, sfDir, "customer")
      .select($"c_custkey", $"c_name", $"c_nationkey")
    val ms = MemoryStream[EventRow]
    val q = EventStreams.enrichStream(ms.toDF(), dim)
      .select($"event_id", $"user_id", $"c_name", $"c_nationkey")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    val got = try {
      ms.addData(data)
      q.processAllAvailable()
      // stateless: no sentinel/watermark rounds needed — every row emits
      // in the micro-batch it arrives in
      spark.table("enriched").collect().map(_.toSeq).toSet
    } finally q.stop()
    val expected = data.toDF()
      .join(dim, $"user_id" === $"c_custkey", "left_outer")
      .select($"event_id", $"user_id", $"c_name", $"c_nationkey")
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.size == data.size, "left outer must keep every event exactly once")
  }

  test("streaming exact dedup keeps first-seen content within the watermark (d1 twin)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    def at(sec: Int) = new Timestamp(t0.getTime + sec * 1000L)
    val ms = MemoryStream[DocRow]
    val q = EventStreams.dedupStream(ms.toDF(), watermark = "10 minutes")
      .select($"doc_id")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      // batch 1: doc 3 repeats doc 1's content in the SAME batch
      ms.addData(Seq(DocRow(at(0), 1, "alpha beta"), DocRow(at(1), 2, "gamma"),
        DocRow(at(2), 3, "alpha beta")))
      q.processAllAvailable()
      // batch 2: doc 4 repeats doc 2's content ACROSS batches, within the
      // watermark; doc 5 is new
      ms.addData(Seq(DocRow(at(30), 4, "gamma"), DocRow(at(31), 5, "delta")))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("dedup_out").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 5L))
  }

  test("streaming hourlyRollup emits exactly the batch hourly aggregate (q20 twin)") {
    val streamed = runStream("hr", df => EventStreams.hourlyRollup(df))
      .select($"hour", $"event_type", $"n", $"sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .toSet

    val batch = data.toDF()
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .toSet

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming slidingRollup matches the batch sliding-window aggregate") {
    val streamed = runStream("slide", df => EventStreams.slidingRollup(df))
      .select($"win_start", $"event_type", $"n", $"sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .toSet

    // batch twin: the same built-in window() explodes each event into its
    // 4 overlapping (1h, 15m-slide) windows
    val batch = data.toDF()
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .select($"w.start", $"event_type", $"n", $"sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .toSet

    assert(streamed.nonEmpty)
    // each event lands in exactly 4 sliding windows
    assert(streamed.toSeq.map(_._3).sum == 4L * data.size)
    assert(streamed == batch)
  }

  test("streaming HLL rollup matches batch sketches and re-merges to coarser rollups (x1 twin)") {
    val streamedDf = runStream("hllroll", df => EventStreams.distinctUsersRollup(df))
    val streamed = streamedDf
      .select($"win_start", $"event_type", $"approx_users")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    // HLL register updates are idempotent maxes → estimates are arrival-
    // order- and micro-batch-independent: exact equality with batch
    val batch = data.toDF()
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).cast("long").as("n"))
      .select($"w.start", $"event_type", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)

    // the emitted sketches must union-merge into the per-type totals a
    // sketch store would serve — without replaying the stream
    val remerged = streamedDf
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wholeStream = data.toDF()
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(remerged == wholeStream,
      s"re-merged window sketches drift from one-pass: $remerged vs $wholeStream")
  }

  test("streaming sessionRollup matches the batch lag-based sessionization (q19 twin)") {
    val streamed = runStream("sess", df =>
      EventStreams.sessionRollup(df).withColumn("event_type", lit("data")))
      .select($"user_id", $"session_start", $"n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .filter(_._1 != -1L)
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.getTime).map(_._3).toSeq).toMap

    // q19's algorithm (strict 1800s gap) on the same rows, driver-side.
    val batch = data.groupBy(_.user_id).view.mapValues { evs =>
      val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
      val counts = scala.collection.mutable.ArrayBuffer[Long]()
      var prev: Option[Long] = None
      sorted.foreach { e =>
        if (prev.forall(p => e.ts.getTime - p > 1800L * 1000)) counts += 1L
        else counts(counts.size - 1) += 1L
        prev = Some(e.ts.getTime)
      }
      counts.toSeq
    }.toMap

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState sessionizer matches the batch gap rule AND session_window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventRow]
    val q = StatefulSessions.statefulSessionize(spark, ms.toDF())
      .writeStream.format("memory").queryName("customsess").outputMode("append").start()
    try {
      ms.addData(data)
      q.processAllAvailable()
      ms.addData(Seq(sentinel(100)))
      q.processAllAvailable()
      ms.addData(Seq(sentinel(200)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("customsess")
      .select($"user_id", $"session_start", $"n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .filter(_._1 != -1L)
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.getTime).map(_._3).toSeq).toMap

    // identical driver-side ground truth as the session_window test
    val batch = data.groupBy(_.user_id).view.mapValues { evs =>
      val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
      val counts = scala.collection.mutable.ArrayBuffer[Long]()
      var prev: Option[Long] = None
      sorted.foreach { e =>
        if (prev.forall(p => e.ts.getTime - p > 1800L * 1000)) counts += 1L
        else counts(counts.size - 1) += 1L
        prev = Some(e.ts.getTime)
      }
      counts.toSeq
    }.toMap

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stateful sessionizer merges above-watermark out-of-order events across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = maxTs.getTime + 1000L * 3600 * 1000 // far from fixture data
    def ev(offsetMin: Long) = EventRow(
      new Timestamp(base + offsetMin * 60000), "d", 1.0, 7L, offsetMin)
    val ms = MemoryStream[EventRow]
    val q = StatefulSessions.statefulSessionize(spark, ms.toDF())
      .writeStream.format("memory").queryName("oo_sess").outputMode("append").start()
    try {
      ms.addData(Seq(ev(60), ev(65))) // open session [60, 65]
      q.processAllAvailable()
      // late but within watermark AND within start-gap: must merge,
      // extending session_start back to minute 40
      ms.addData(Seq(ev(40)))
      q.processAllAvailable()
      ms.addData(Seq(sentinel(2000))) // advance watermark, close
      q.processAllAvailable()
      ms.addData(Seq(sentinel(3000)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("oo_sess").filter($"user_id" === 7L)
      .select($"session_start", $"session_end", $"n_events")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime, r.getLong(2)))
    assert(rows.toSeq == Seq((base + 40 * 60000, base + 65 * 60000, 3L)))
  }

  test("conversionStream drains an inbox directory through the kernel") {
    val inbox = Files.createTempDirectory("graft-inbox")
    val out = Files.createTempDirectory("graft-out")
    val ckpt = Files.createTempDirectory("graft-ckpt")
    Files.write(inbox.resolve("a.md"), "# Streamed\n\nDoc A.".getBytes(StandardCharsets.UTF_8))
    Files.write(inbox.resolve("b.csv"), "h1,h2\n1,2\n".getBytes(StandardCharsets.UTF_8))

    val q = EventStreams.conversionStream(
      spark, inbox.toString, out.toString, ckpt.toString)
    try q.processAllAvailable() finally q.stop()

    val results = spark.read
      .schema("filename STRING, markdown STRING, images ARRAY<STRUCT<type: STRING, filename: STRING, image: STRING>>, error STRING")
      .json(out.toString)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(results.map(_._1).toSeq == Seq("a", "b"))
    assert(results(0)._2 == "# Streamed\n\nDoc A.")
    assert(results(1)._2 == "| h1 | h2 |\n|---|---|\n| 1 | 2 |")
  }

  test("conversionCatchUp drains, terminates itself, and never re-converts on rerun") {
    val inbox = Files.createTempDirectory("graft-inbox-cu")
    val out = Files.createTempDirectory("graft-out-cu")
    val ckpt = Files.createTempDirectory("graft-ckpt-cu")
    Files.write(inbox.resolve("one.md"), "# One".getBytes(StandardCharsets.UTF_8))

    // run 1: AvailableNow self-terminates after draining the inbox
    val q1 = EventStreams.conversionCatchUp(
      spark, inbox.toString, out.toString, ckpt.toString)
    assert(q1.awaitTermination(60000), "catch-up query did not self-terminate")

    def converted(): Seq[String] = spark.read
      .schema("filename STRING, markdown STRING, error STRING")
      .json(out.toString)
      .collect().map(_.getString(0)).toSeq.sorted
    assert(converted() == Seq("one"))

    // run 2 with a NEW file: the checkpoint skips the already-converted
    // one — only the new file converts, exactly once
    Files.write(inbox.resolve("two.md"), "# Two".getBytes(StandardCharsets.UTF_8))
    val q2 = EventStreams.conversionCatchUp(
      spark, inbox.toString, out.toString, ckpt.toString)
    assert(q2.awaitTermination(60000), "second catch-up did not self-terminate")
    assert(converted() == Seq("one", "two"), "rerun must add exactly the new file")
  }
}
