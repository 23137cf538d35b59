package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** x1 registers rows-only (sketch estimates are DataSketches-specific, so
  * no DuckDB oracle); these pin the two properties that make the sketch
  * path trustworthy at scale: union-merging pre-aggregated sketches must
  * equal the one-pass sketch, and the estimate must sit within HLL's
  * published error envelope of the exact count.
  */
class SketchesSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val events = graft.Tables(spark, sfDir, "events")

  test("daily-sketch union equals the one-pass sketch estimate (mergeability)") {
    val merged = graft.SparkEntry.queries("x1_hll_distinct_users")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val onePass = events
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == onePass,
      s"union-of-daily must equal one-pass: $merged vs $onePass")
  }

  test("estimates sit within the HLL error envelope of the exact counts") {
    val approx = graft.SparkEntry.queries("x1_hll_distinct_users")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      // default lgK=12 ⇒ ~1.6% relative standard error; 5% is >3 sigma
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx $a vs exact $n drifts beyond the HLL envelope")
    }
  }

  test("approx quantiles land within the GK rank-error bound of exact") {
    val approx = graft.SparkEntry.queries("x2_approx_length_quantiles")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val byLang = graft.Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull)
      .select($"lang", size(split(trim($"text"), "\\s+")).cast("long").as("n"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(approx.keySet == byLang.keySet)
    // GK guarantee: the returned value's RANK is within n/accuracy of the
    // target rank (plus 1 for discreteness at tiny n)
    def rankOk(sorted: Array[Long], v: Long, q: Double): Boolean = {
      val n = sorted.length
      val lo = sorted.count(_ < v)      // ranks v could occupy: [lo+1, hi]
      val hi = sorted.count(_ <= v)
      val target = math.ceil(q * n)
      val tol = n.toDouble / Sketches.QuantileAccuracy + 1
      assert(hi > lo, s"approx value $v does not occur in the data")
      target >= lo + 1 - tol && target <= hi + tol
    }
    byLang.foreach { case (lang, sorted) =>
      val (p50, p90) = approx(lang)
      assert(rankOk(sorted, p50, 0.5), s"$lang p50=$p50 outside rank bound")
      assert(rankOk(sorted, p90, 0.9), s"$lang p90=$p90 outside rank bound")
    }
  }
}
