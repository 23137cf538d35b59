package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Sketch plane: mergeable approximate aggregates — the 100 TB answer to
  * "how many distinct X" when exact distinct counting would shuffle every
  * key. An HLL sketch is a fixed-size (KBs) summary with two properties
  * exact counting lacks at scale:
  *
  *  - the per-partition partial is CONSTANT-SIZE, so the distinct-count
  *    aggregation's exchange moves kilobytes per group instead of the key
  *    stream (`countDistinct` must shuffle every distinct key to its
  *    group's reducer);
  *  - sketches MERGE: pre-aggregate per day/source/shard, store the
  *    sketch, and union later — re-aggregation over any rollup dimension
  *    without touching raw data. That is how a 100 TB warehouse serves
  *    "distinct users last quarter" without a quarter-long scan.
  *
  * x1 demonstrates exactly that shape on the events table: per-day HLL
  * sketches union-merged to per-event-type totals. Estimates are
  * DataSketches-implementation-specific, so the query registers rows-only
  * (the d4/s2 pattern); SketchesSpec pins the two properties that make it
  * trustworthy — merge-invariance (daily-then-union == one-pass) and
  * accuracy vs the exact count (HLL lgK=12 ⇒ ~1.6% RSE).
  */
object Sketches {

  val specs: Seq[QuerySpec] = Seq(

    // ----------------------------------------------------------------- x1
    // Distinct users per event type via mergeable HLL sketches: stage 1
    // builds one sketch per (event_type, day) — the pre-aggregation a
    // warehouse would persist alongside daily partitions; stage 2
    // union-merges the daily sketches per event type and reads the
    // estimate. Both aggregations' partials are fixed-size sketch
    // buffers, never key streams.
    QuerySpec(
      "x1_hll_distinct_users",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .groupBy($"event_type", to_date($"ts").as("day"))
          .agg(hll_sketch_agg($"user_id").as("sk"))
          .groupBy($"event_type")
          .agg(hll_union_agg($"sk").as("sk"))
          .select($"event_type",
            hll_sketch_estimate($"sk").cast("long").as("approx_users"))
          .orderBy($"event_type")
      },
      None),

    // ----------------------------------------------------------------- x2
    // Approximate per-language token-length quantiles — the sketch twin
    // of t11's exact row_number formulation. t11 is the calibration path:
    // its window sorts EVERY row within each language (a per-group total
    // sort — fine at audit scale, the bottleneck at 100 TB). The
    // Greenwald-Khanna summary behind percentile_approx keeps O(accuracy)
    // state per group and merges across partitions, so the plan is one
    // hash aggregate with constant-size partials, no sort anywhere.
    // Guarantee: rank error <= n/accuracy (1% here) — SketchesSpec pins
    // it against t11's exact quantiles. Rows-only (summary internals are
    // implementation-specific).
    QuerySpec(
      "x2_approx_length_quantiles",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .filter($"text".isNotNull)
          .select($"lang",
            size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            percentile_approx($"n_tokens", array(lit(0.5), lit(0.9)),
              lit(QuantileAccuracy)).as("qs"))
          .select($"lang", $"n_docs",
            $"qs" (0).as("p50_approx"), $"qs" (1).as("p90_approx"))
          .orderBy($"lang")
      },
      None)
  )

  /** x2's GK-summary accuracy: rank error <= n/accuracy = 1%. */
  val QuantileAccuracy = 100
}
