package graft.operators

import graft.SparkTestBase

/** Independent-reimplementation pins for the sequence-analytics queries:
  * q50 (regex pattern match over per-user ordered type sequences) and
  * q51 (interval concurrency sweep). Both are ALSO value-checked by the
  * DuckDB oracle; these specs recompute the answers driver-side from the
  * raw fixture rows with plain Scala collections — a third opinion that
  * shares no SQL with either engine — and pin the distributed prefix-sum
  * machinery against it.
  */
class SequenceAnalyticsSpec extends SparkTestBase {

  import spark.implicits._

  private def events(): Array[(Long, Long, Long, String)] =
    graft.Tables(spark, sfDir, "events")
      .selectExpr("user_id", "event_id", "unix_timestamp(date_trunc('second', ts))", "event_type")
      .as[(Long, Long, Long, String)].collect()

  test("q50 flags agree with a driver-side sequence rebuild") {
    val byUser = events().groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (e._3, e._2)).map(_._4).mkString(",")
    }
    val got = graft.SparkEntry.queries("q50_event_pattern_match")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))))
      .toMap
    assert(got.keySet == byUser.keySet)
    byUser.foreach { case (u, seq) =>
      val expect = (
        "view.*purchase".r.findFirstIn(seq).isDefined,
        seq.contains("error,error,error"),
        seq.contains("signup,purchase"))
      assert(got(u) == expect, s"user $u: got ${got(u)} want $expect for [$seq]")
    }
  }

  test("q50 conversion requires a purchase strictly after a view") {
    // semantic cross-check against q45's funnel: every q50 conversion
    // user has a view, and SOME purchase at/after their first view
    val q50 = graft.SparkEntry.queries("q50_event_pattern_match")(spark, sfDir)
      .collect().filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val es = events()
    q50.foreach { u =>
      val mine = es.filter(_._1 == u).sortBy(e => (e._3, e._2))
      val vi = mine.indexWhere(_._4 == "view")
      assert(vi >= 0 && mine.drop(vi + 1).exists(_._4 == "purchase"),
        s"user $u flagged converted without view→purchase order")
    }
  }

  test("q51 peaks equal a driver-side sessionize-and-sweep") {
    // plain-Scala oracle: 30-min gap sessionization per user, then a
    // global sweep with +1-before--1 tie order, peak per UTC day
    val sessions = events().groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).map(_._3)
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = sorted.head; var prev = sorted.head
      sorted.tail.foreach { t =>
        if (t - prev > 1800) { bounds += ((start, prev)); start = t }
        prev = t
      }
      bounds += ((start, prev))
      bounds
    }
    val deltas = sessions.flatMap { case (a, b) => Seq((a, 1), (b, -1)) }
      .sortBy { case (t, d) => (t, -d) }
    var acc = 0
    val peaks = scala.collection.mutable.Map.empty[Long, Int]
    deltas.foreach { case (t, d) =>
      acc += d
      val day = java.time.Instant.ofEpochSecond(t)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay
      peaks(day) = math.max(peaks.getOrElse(day, Int.MinValue), acc)
    }
    val got = graft.SparkEntry.queries("q51_session_concurrency")(spark, sfDir)
      .collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1).toInt)
      .toMap
    assert(got == peaks.toMap, s"sweep mismatch: got $got want $peaks")
  }

  test("q51 sweep matches the driver oracle on synthetic event histories") {
    // the query only reads events.parquet, so point it at generated
    // fixtures: seeded random histories with heavy timestamp ties and
    // users whose sessions interleave across day boundaries — shapes the
    // driver fixture doesn't stress
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val base = 1700000000L
      val rows = (0 until 2000).map { i =>
        val u = rnd.nextInt(12).toLong
        // cluster timestamps so gaps >30min and exact ties both occur
        val t = base + rnd.nextInt(4) * 86400L +
          rnd.nextInt(40) * 2400L + (if (rnd.nextBoolean()) 0 else rnd.nextInt(90))
        (i.toLong, new java.sql.Timestamp(t * 1000L), u, "view", 1.0, "{}")
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_q51p_$seed")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = graft.SparkEntry.queries("q51_session_concurrency")(
          spark, dir.toString)
        .collect()
        .map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1).toInt)
        .toMap
      // driver-side oracle: same sessionize + sweep as the fixture test
      val sessions = rows.groupBy(_._3).toSeq.flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (e._2.getTime, e._1)).map(_._2.getTime / 1000L)
        val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var start = sorted.head; var prev = sorted.head
        sorted.tail.foreach { t =>
          if (t - prev > 1800) { bounds += ((start, prev)); start = t }
          prev = t
        }
        bounds += ((start, prev))
        bounds
      }
      val deltas = sessions.flatMap { case (a, b) => Seq((a, 1), (b, -1)) }
        .sortBy { case (t, d) => (t, -d) }
      var acc = 0
      val peaks = scala.collection.mutable.Map.empty[Long, Int]
      deltas.foreach { case (t, d) =>
        acc += d
        val day = java.time.Instant.ofEpochSecond(t)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay
        peaks(day) = math.max(peaks.getOrElse(day, Int.MinValue), acc)
      }
      assert(got == peaks.toMap, s"seed $seed: sweep mismatch")
    }
  }

  test("q51 two-phase prefix sum is partition-count invariant") {
    // the distributed sweep must not depend on how the range partitioner
    // splits the timeline: 1 partition vs the default must agree
    val q = graft.SparkEntry.queries("q51_session_concurrency")
    val default = q(spark, sfDir).collect().map(_.toSeq)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val single = q(spark, sfDir).collect().map(_.toSeq)
      assert(single.sameElements(default),
        "partitioning changed the concurrency sweep result")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
