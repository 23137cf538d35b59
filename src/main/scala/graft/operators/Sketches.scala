package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.SketchFunctions
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

  // Constants live ABOVE specs: the x3 oracle string interpolates
  // FreqTopK at object-construction time, and a forward val reference
  // would silently read 0 (the Relational Q30Sql init-order trap).

  /** x2's GK-summary accuracy: rank error <= n/accuracy = 1%. */
  val QuantileAccuracy = 100

  /** x3's sketch map size (power of 2). At audit SFs the per-language
    * vocab fits, so estimates are exact; at 100 TB the map purges and
    * the NO_FALSE_NEGATIVES guarantee takes over. */
  val FreqMapSize = 1024

  /** x3's emitted rows per language. */
  val FreqTopK = 10

  /** x4's theta lgK: 4096 nominal entries — exact below that many
    * distinct users per event type, ~1.6% RSE above. */
  val ThetaLgK = 12

  /** x5's count-min grid: eps = 2/width ⇒ 2000 counters per row;
    * confidence 0.99 ⇒ 5 hash rows. ~80 KB total, constant in SF. */
  val CmsWidth = 2000

  /** x5's depth (ceil(ln(1/(1-0.99)))) — documented for the collision
    * analysis in the x5 scaladoc; the builder derives it from the
    * confidence argument. */
  val CmsDepth = 5

  /** x10's production KLL k: ±1.33% normalized rank error (99%
    * confidence, DataSketches' published envelope), ~few-KB partials. */
  val KllK = 200

  /** x11's exact-mode KLL k: the sketch never compacts while a group's
    * n stays below this, so quantiles are the exact ceil(q·n)-rank
    * items (capacity precondition pinned per driver SF in SketchesSpec;
    * the largest fixture group is ~2k rows at sf0.1). */
  val KllExactK = 32768

  /** x7/x11's shared oracle — the exact discrete per-language token
    * quantile at 1-based rank ceil(q·n), t11's formulation. */
  private def ExactTokenQuantilesOracle: String = raw"""
        WITH t AS (
          SELECT lang,
                 CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
          FROM documents WHERE text IS NOT NULL),
        r AS (
          SELECT lang, n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens) AS rk,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM t)
        SELECT lang,
               CAST(MAX(n) AS BIGINT) AS n_docs,
               MAX(CASE WHEN rk = CAST(CEIL(n * 0.5) AS BIGINT) THEN n_tokens END) AS p50_tokens,
               MAX(CASE WHEN rk = CAST(CEIL(n * 0.9) AS BIGINT) THEN n_tokens END) AS p90_tokens
        FROM r GROUP BY lang ORDER BY lang"""

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
      // Rows-only BY MEASUREMENT, not assumption: at sf0.01 the HLL sits
      // in its exact coupon mode (estimate == 150 == truth), but already
      // at sf0.1 the 1500-user sets promote past the lgK=12 coupon
      // capacity and the estimate is 1488 — a 0.8% error squarely inside
      // the ~1.6% RSE envelope SketchesSpec pins, and exactly why a
      // fixed-SQL exact-count oracle would be scale-fragile here. The
      // theta twin (x4) stays oracle-exact through sf0.1 because its
      // exact-mode capacity is 2^lgK = 4096; HLL's coupon phase ends an
      // order of magnitude earlier.
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
      None),

    // ----------------------------------------------------------------- x7
    // x2's ORACLE TWIN — the same GK quantile plan run in exact mode,
    // under a hash oracle (the x3/x4 capacity argument, landed for GK):
    // while a group's n stays below the summary's accuracy, rank error
    // n/accuracy < 1 means the summary never compacts and query(q)
    // returns EXACTLY the value at 1-based rank ceil(q·n) of the group's
    // sorted order (convention probed empirically across n ∈ {7..997},
    // q ∈ {0.1..0.9} — 24/24 match ceil(q·n) and no other formula). That
    // is precisely t11's oracle-deterministic discrete quantile, so the
    // whole sketch path — per-partition updates, partial merges in any
    // order, final query — is pinned by DuckDB row-for-row, while the
    // PLAN stays the scale shape (hash aggregate with mergeable
    // constant-size partials, no window, no per-group sort). x2 keeps
    // the production accuracy and its envelope spec; SketchesSpec pins
    // the capacity precondition per driver SF, the x1 lesson (HLL's
    // coupon range ended an order of magnitude before the fixture) made
    // explicit for GK.
    QuerySpec(
      "x7_gk_exact_mode_quantiles",
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
              lit(Relational.SketchExactAccuracy)).as("qs"))
          .select($"lang", $"n_docs",
            $"qs" (0).as("p50_tokens"), $"qs" (1).as("p90_tokens"))
          .orderBy($"lang")
      },
      Some(ExactTokenQuantilesOracle)),

    // ---------------------------------------------------------------- x10
    // KLL per-language token-length quantiles (VERDICT r14 #8) — the
    // sketch a 100 TB SHARD-MERGE actually wants beside x2's GK: GK
    // summaries merge, but their merged error is MERGE-ORDER-DEPENDENT
    // (no published bound for arbitrary merge trees), while KLL proves
    // the same ±ε·n rank envelope (ε ≈ 1.33% at k=200, 99% confidence)
    // regardless of how daily/shard partials are re-rolled — the
    // property that lets stored per-shard summaries answer any rollup
    // without a rescan. Same single-scan hash-aggregate plan as x2:
    // constant-size mergeable partials, no window, no per-group sort.
    // Rows-only by the x1/x2 measurement argument (KLL compacts by
    // RANDOMIZED sampling once a group outgrows k, so estimates are
    // seed-dependent past capacity); SketchesSpec pins the rank-error
    // envelope against exact quantiles, and x11 is the oracle-pinned
    // twin at exact-mode capacity.
    QuerySpec(
      "x10_kll_length_quantiles",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .filter($"text".isNotNull)
          .select($"lang",
            size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            SketchFunctions.kllQuantiles($"n_tokens", KllK,
              Seq(0.5, 0.9)).as("qs"))
          .select($"lang", $"n_docs",
            $"qs" (0).as("p50_approx"), $"qs" (1).as("p90_approx"))
          .orderBy($"lang")
      },
      None),

    // ---------------------------------------------------------------- x11
    // x10's ORACLE TWIN — the identical KLL path (per-partition
    // updates, partial merges in any order, INCLUSIVE query) run below
    // the sketch's compaction capacity, where KLL is EXACT and
    // deterministic: retained == n, and getQuantile(q, INCLUSIVE)
    // returns precisely the item at 1-based rank ceil(q·n) (convention
    // probed empirically, 25/25 across n ∈ {7..997} × q ∈ {0.1..0.9} —
    // the x7 move, replayed for KLL). That is t11's discrete quantile,
    // so the whole custom TypedImperativeAggregate — update, serialize/
    // heapify across exchanges, merge, eval — sits under a DuckDB hash
    // oracle row-for-row, while x10 keeps the production k and its
    // envelope. SketchesSpec pins the capacity precondition per driver
    // SF (max per-lang group ≪ KllExactK), the x1 lesson made explicit.
    QuerySpec(
      "x11_kll_exact_mode_quantiles",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .filter($"text".isNotNull)
          .select($"lang",
            size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            SketchFunctions.kllQuantiles($"n_tokens", KllExactK,
              Seq(0.5, 0.9)).as("qs"))
          .select($"lang", $"n_docs",
            $"qs" (0).as("p50_tokens"), $"qs" (1).as("p90_tokens"))
          .orderBy($"lang")
      },
      Some(ExactTokenQuantilesOracle)),

    // ---------------------------------------------------------------- x12
    // PERSISTED-SKETCH SHARD MERGE (VERDICT r15 #4 — the standing-
    // artifact move s12/s16/d25 made for indexes, now for the sketch
    // plane): the ingest aggregates each shard's token-length KLL ONCE
    // and STORES the serialized sketch ([[kllShardsRoot]], 8 shards ×
    // lang); every later rollup MERGES stored sketches — the query's
    // scan set is the few-KB artifact, never a document row (scan-set
    // spec-pinned, the s16 move). This is the actual 100 TB telemetry
    // shape: per-shard/day summaries land once, arbitrary re-rolls are
    // manifest-sized merges. Shards are built at exact-mode k, so the
    // whole stored path — serialize at ingest, parquet round-trip,
    // heapify + merge in any order, INCLUSIVE query — sits under the
    // x11 DuckDB hash oracle row-for-row; SketchesSpec additionally
    // pins merge-order invariance across permutations.
    QuerySpec(
      "x12_kll_shard_merge",
      (s, dir) => {
        import s.implicits._
        s.read.parquet(kllShardsRoot(s, dir))
          .groupBy($"lang")
          .agg(
            sum($"n_docs").as("n_docs"),
            SketchFunctions.kllMergeQuantiles($"sk", KllExactK,
              Seq(0.5, 0.9)).as("qs"))
          .select($"lang", $"n_docs",
            $"qs" (0).as("p50_tokens"), $"qs" (1).as("p90_tokens"))
          .orderBy($"lang")
      },
      Some(ExactTokenQuantilesOracle)),

    // ----------------------------------------------------------------- x3
    // Heavy-hitter tokens per language via a mergeable Misra-Gries
    // frequent-items sketch (graft.functions.FrequentItemsAgg, a custom
    // TypedImperativeAggregate — Spark 4's built-in sketches stop at
    // HLL). Exact top-k by count must shuffle the full (lang, token)
    // key stream and fully aggregate before any ranking; the sketch's
    // partials are maxMapSize-bounded maps that merge associatively, so
    // the exchange moves constant-size buffers per (partition, lang) and
    // the same partials could be stored per shard/day and re-merged.
    // Guarantee (pinned in SketchesSpec): every token with true count
    // > maxError survives, est is within [true - maxError, true].
    // The fixture's per-language vocabulary sits far below maxMapSize, so
    // the sketch NEVER purges: est is the exact count, lb = ub = est, and
    // the whole sketch path — update, partial merge (any order), eval —
    // is pinned by an exact top-k oracle. Once a real corpus outgrows the
    // map, estimates become merge-order-dependent and the envelope
    // guarantee above is the contract (SketchesSpec).
    QuerySpec(
      "x3_frequent_tokens",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .filter($"text".isNotNull)
          .select($"lang",
            explode(split(lower(trim($"text")), "\\s+")).as("token"))
          .filter(length($"token") >= 3)
          .groupBy($"lang")
          .agg(SketchFunctions.freqItems($"token", FreqMapSize, FreqTopK).as("items"))
          .select($"lang", posexplode($"items").as(Seq("pos", "it")))
          .select($"lang", ($"pos" + 1).as("rank"),
            $"it.token".as("token"), $"it.est".as("est"),
            $"it.lb".as("lb"), $"it.ub".as("ub"))
          .orderBy($"lang", $"rank")
      },
      Some(s"""
        WITH t AS (
          SELECT lang,
                 unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
          FROM documents WHERE text IS NOT NULL),
        c AS (
          SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS est
          FROM t WHERE len(token) >= 3 GROUP BY lang, token),
        r AS (
          SELECT lang, token, est,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY est DESC, token) AS INTEGER) AS rank
          FROM c)
        SELECT lang, rank, token, est, est AS lb, est AS ub
        FROM r WHERE rank <= $FreqTopK ORDER BY lang, rank""")),

    // ----------------------------------------------------------------- x4
    // Audience-overlap matrix between event types via theta sketches
    // (graft.functions.ThetaSketchAgg) — the question HLL cannot answer:
    // "how many distinct users did BOTH a AND b". Exact computation is a
    // per-pair self-join of the distinct (event_type, user_id) stream —
    // T^2/2 shuffles of the user universe; the sketch path aggregates
    // the stream ONCE into T fixed-size (2^lgK) sketches, and every
    // pairwise intersection is then arithmetic over kilobytes. The pair
    // join below is a deliberate bounded nested-loop over the T-row
    // aggregate (T = event-type count), the same dimension-sized
    // exception PLANS.md documents for d5/s1/s2. Under 2^lgK distinct
    // users per type the sketches are in exact mode (estimates == true
    // counts — SketchesSpec pins it); beyond, RSE ~ 1/sqrt(2^lgK).
    QuerySpec(
      "x4_theta_user_overlap",
      (s, dir) => {
        import s.implicits._
        val sk = Tables(s, dir, "events")
          .groupBy($"event_type")
          .agg(SketchFunctions.thetaSketch($"user_id", ThetaLgK).as("sk"))
        val a = sk.select($"event_type".as("type_a"), $"sk".as("sk_a"))
        val b = sk.select($"event_type".as("type_b"), $"sk".as("sk_b"))
        a.join(broadcast(b), $"type_a" < $"type_b")
          .select($"type_a", $"type_b",
            SketchFunctions.thetaEstimate($"sk_a").cast("long").as("users_a"),
            SketchFunctions.thetaEstimate($"sk_b").cast("long").as("users_b"),
            SketchFunctions.thetaIntersect($"sk_a", $"sk_b").cast("long")
              .as("users_both"))
          .orderBy($"type_a", $"type_b")
      },
      // Exact-mode oracle (the per-type user sets sit far below 2^lgK,
      // so estimates and intersections ARE the true distinct counts —
      // the same reasoning as x1's): exact distinct + pairwise overlap.
      Some("""
        WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
        c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS users
              FROM d GROUP BY event_type),
        p AS (SELECT ca.event_type AS type_a, cb.event_type AS type_b,
                     ca.users AS users_a, cb.users AS users_b
              FROM c ca JOIN c cb ON ca.event_type < cb.event_type),
        o AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     CAST(COUNT(*) AS BIGINT) AS users_both
              FROM d a JOIN d b
                ON a.user_id = b.user_id AND a.event_type < b.event_type
              GROUP BY 1, 2)
        SELECT p.type_a, p.type_b, p.users_a, p.users_b,
               COALESCE(o.users_both, CAST(0 AS BIGINT)) AS users_both
        FROM p LEFT JOIN o ON p.type_a = o.type_a AND p.type_b = o.type_b
        ORDER BY p.type_a, p.type_b""")),

    // ----------------------------------------------------------------- x5
    // Count-min sketch point counts — the frequency twin of x1's
    // distinct counts: ONE constant-size (depth × width counters)
    // mergeable summary of the whole event stream answers "how many
    // events of type T" for any later probe without a re-scan. Built
    // with Spark's own codegen'd count_min_sketch aggregate (partials
    // are fixed-size counter grids merged across partitions — kilobytes
    // through the exchange regardless of row count); probed by the
    // cold-path graft_cms_estimate expression over the distinct-key
    // frame (5 rows).
    //
    // Oracle capacity precondition (the x3/x4 convention, but STRONGER:
    // the bound is schema-, not scale-, dependent): a CMS estimate is
    // exact for a key unless it collides with another key in EVERY one
    // of the [[CmsDepth]] hash rows. The event_type alphabet is 5
    // values — fixed by the generator's schema at every SF — against a
    // width-[[CmsWidth]] grid under seed 42, where a single all-rows
    // collision has probability ~(4/2000)^5 ≈ 3e-14 and, the seed being
    // fixed, is a deterministic property of the alphabet verified at
    // every audit SF. Fixture growth changes COUNTS, never the
    // alphabet, so unlike x3/x4 no scale bump can push this sketch out
    // of exact mode.
    QuerySpec(
      "x5_cms_type_counts",
      (s, dir) => {
        import s.implicits._
        val events = Tables(s, dir, "events")
        val sk = events.agg(
          expr(s"count_min_sketch(event_type, ${2.0 / CmsWidth}d, 0.99d, 42)")
            .as("sk"))
        events.select($"event_type").distinct()
          .crossJoin(broadcast(sk))
          .select($"event_type",
            SketchFunctions.cmsEstimate($"sk", $"event_type").as("est_events"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS est_events
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ----------------------------------------------------------------- x6
    // Theta set-DIFFERENCE — the third set operation (x4 covered
    // estimate + intersection): distinct users who did type A but NEVER
    // type B, per ordered pair, straight from the same stored per-type
    // sketches. The exclusivity/churn question ("converted but never
    // errored") that HLL structurally cannot answer and exact counting
    // answers only by re-shuffling the raw key stream per pair. Same
    // exact-mode capacity precondition as x4 (distinct users per type ≪
    // 2^lgK — pinned for every driver SF by SketchesSpec), so the
    // oracle checks exact difference counts.
    QuerySpec(
      "x6_theta_exclusive_users",
      (s, dir) => {
        import s.implicits._
        val sk = Tables(s, dir, "events")
          .groupBy($"event_type")
          .agg(SketchFunctions.thetaSketch($"user_id", ThetaLgK).as("sk"))
        val a = sk.select($"event_type".as("type_a"), $"sk".as("sk_a"))
        val b = sk.select($"event_type".as("type_b"), $"sk".as("sk_b"))
        a.join(broadcast(b), $"type_a" =!= $"type_b")
          .select($"type_a", $"type_b",
            SketchFunctions.thetaDiff($"sk_a", $"sk_b").cast("long")
              .as("users_a_not_b"))
          .orderBy($"type_a", $"type_b")
      },
      Some("""
        WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b
          FROM (SELECT DISTINCT event_type FROM events) a
          JOIN (SELECT DISTINCT event_type FROM events) b
            ON a.event_type != b.event_type),
        diff AS (
          SELECT da.event_type AS type_a, p.type_b,
                 CAST(COUNT(DISTINCT da.user_id) AS BIGINT) AS users_a_not_b
          FROM d da
          JOIN pairs p ON da.event_type = p.type_a
          WHERE NOT EXISTS (
            SELECT 1 FROM d db
            WHERE db.event_type = p.type_b AND db.user_id = da.user_id)
          GROUP BY da.event_type, p.type_b)
        SELECT p.type_a, p.type_b,
               COALESCE(f.users_a_not_b, CAST(0 AS BIGINT)) AS users_a_not_b
        FROM pairs p LEFT JOIN diff f
          ON p.type_a = f.type_a AND p.type_b = f.type_b
        ORDER BY p.type_a, p.type_b""")),

    // ----------------------------------------------------------------- x8
    // Theta-sketch JACCARD similarity matrix — the set-algebra family's
    // capstone: per audience pair, |A∩B| / |A∪B| read straight from the
    // stored per-type sketches, completing ∩ (x4), \ (x6) with ∪ via a
    // REAL DataSketches Union (the new graft_theta_union expression —
    // not the a+b−∩ arithmetic identity, which stops being valid the
    // moment either sketch estimates, and union-of-sketches is exactly
    // the operation per-shard/per-day stored sketches re-merge with).
    // Audience-overlap Jaccard is how segment similarity / campaign
    // cannibalization is actually scored at warehouse scale: T²/2
    // constant-size sketch pairs, never a user-level self-join.
    // Exact-mode oracle (the x4 capacity argument, spec-pinned): below
    // 2^lgK both operands are exact sets, so intersect/union ARE the
    // true counts and the Jaccard is exact arithmetic; the ratio lands
    // through ROUND(·,6) on exact longs in both engines.
    QuerySpec(
      "x8_theta_jaccard",
      (s, dir) => {
        import s.implicits._
        val sk = Tables(s, dir, "events")
          .groupBy($"event_type")
          .agg(SketchFunctions.thetaSketch($"user_id", ThetaLgK).as("sk"))
        val a = sk.select($"event_type".as("type_a"), $"sk".as("sk_a"))
        val b = sk.select($"event_type".as("type_b"), $"sk".as("sk_b"))
        a.join(broadcast(b), $"type_a" < $"type_b")
          .select($"type_a", $"type_b",
            SketchFunctions.thetaIntersect($"sk_a", $"sk_b").cast("long")
              .as("users_both"),
            SketchFunctions.thetaUnion($"sk_a", $"sk_b").cast("long")
              .as("users_any"))
          .withColumn("jaccard",
            round($"users_both".cast("double") / $"users_any".cast("double"), 6))
          .orderBy($"type_a", $"type_b")
      },
      Some("""
        WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
        c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS users
              FROM d GROUP BY event_type),
        o AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     CAST(COUNT(*) AS BIGINT) AS users_both
              FROM d a JOIN d b
                ON a.user_id = b.user_id AND a.event_type < b.event_type
              GROUP BY 1, 2),
        p AS (SELECT ca.event_type AS type_a, cb.event_type AS type_b,
                     ca.users + cb.users AS total
              FROM c ca JOIN c cb ON ca.event_type < cb.event_type)
        SELECT p.type_a, p.type_b,
               COALESCE(o.users_both, CAST(0 AS BIGINT)) AS users_both,
               p.total - COALESCE(o.users_both, 0) AS users_any,
               ROUND(CAST(COALESCE(o.users_both, 0) AS DOUBLE) /
                     (p.total - COALESCE(o.users_both, 0)), 6) AS jaccard
        FROM p LEFT JOIN o ON p.type_a = o.type_a AND p.type_b = o.type_b
        ORDER BY p.type_a, p.type_b""")),

    // ----------------------------------------------------------------- x9
    // One-pass column profiler — the data-quality summary every ingest
    // run computes before anything else touches a new table: per column,
    // null count, exact distinct count, and rendered min/max. ONE
    // relational aggregate produces all metrics (Spark plans the five
    // COUNT(DISTINCT)s as a single scan with an Expand — 5× the rows
    // through one exchange, never five scans), then a constant stack()
    // reshapes the 1-row result to the long (col_name, metrics) report.
    // At lake scale the exact COUNT(DISTINCT) expand is the one piece
    // that doesn't survive 100 TB — the swap is x1's HLL partials
    // (approx_count_distinct per column: constant-size mergeable state,
    // no expand), which drops this from the oracle but keeps the report;
    // the fixture-scale exact form is what pins the plumbing.
    QuerySpec(
      "x9_column_profile",
      (s, dir) => {
        import s.implicits._
        def nulls(c: String) =
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c")
        def mm(c: String) = Seq(
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c"))
        val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val aggs: Seq[org.apache.spark.sql.Column] =
          cols.map(nulls) ++
            cols.map(c => countDistinct(col(c)).as(s"nd_$c")) ++
            cols.flatMap(mm)
        val one = Tables(s, dir, "documents")
          .agg(count(lit(1)).as("n_rows"), aggs: _*)
        val stackArgs = cols.map(c =>
          s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
        one.select($"n_rows", expr(
          s"stack(${cols.length}, $stackArgs) AS " +
            "(col_name, n_null, n_distinct, min_val, max_val)"))
          .select($"col_name", $"n_rows", $"n_null", $"n_distinct",
            $"min_val", $"max_val")
          .orderBy($"col_name")
      },
      Some(raw"""
        WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM documents)
        SELECT col_name, (SELECT n_rows FROM n) AS n_rows, n_null, n_distinct,
               min_val, max_val
        FROM (
          SELECT 'doc_id' AS col_name,
                 CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
                 CAST(MIN(doc_id) AS VARCHAR) AS min_val,
                 CAST(MAX(doc_id) AS VARCHAR) AS max_val
          FROM documents
          UNION ALL
          SELECT 'text',
                 CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(COUNT(DISTINCT text) AS BIGINT),
                 MIN(text), MAX(text)
          FROM documents
          UNION ALL
          SELECT 'lang',
                 CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(COUNT(DISTINCT lang) AS BIGINT),
                 MIN(lang), MAX(lang)
          FROM documents
          UNION ALL
          SELECT 'source',
                 CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(COUNT(DISTINCT source) AS BIGINT),
                 MIN(source), MAX(source)
          FROM documents
          UNION ALL
          SELECT 'n_chars',
                 CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(COUNT(DISTINCT n_chars) AS BIGINT),
                 CAST(MIN(n_chars) AS VARCHAR),
                 CAST(MAX(n_chars) AS VARCHAR)
          FROM documents)
        ORDER BY col_name"""))
  )

  /** x12's STANDING shard-sketch artifact: one row per (shard, lang)
    * carrying the shard's doc count and its serialized exact-mode KLL
    * of token lengths — written ONCE per corpus (fingerprint-stamped,
    * marker-idempotent like the s12/s16 index roots). 8 hash shards
    * stand in for the per-day/per-shard ingest partitions a real
    * telemetry pipeline lands; the artifact is a few KB per shard, and
    * every rollup thereafter is a merge over it, never a corpus
    * rescan. Returns the artifact path. */
  private[graft] def kllShardsRoot(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    import s.implicits._
    val root = new java.io.File(sys.props.getOrElse("graft.fixture.dir",
      sys.props("user.dir") + "/data"))
    root.mkdirs()
    val base = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = new java.io.File(root, "kllshards_" + base)
    val stamp = s"v1:kll-shards:${Multimodal.sourceFingerprint(
      new java.io.File(dir, "documents.parquet"))}"
    val marker = new java.io.File(path.getAbsolutePath + ".staged")
    val upToDate = path.isDirectory && marker.isFile &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath)) == stamp
    if (!upToDate) {
      Mixing.deleteRecursively(path.toPath)
      Tables(s, dir, "documents")
        .filter($"text".isNotNull)
        .select($"doc_id", $"lang",
          size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
        .withColumn("shard", pmod(hash($"doc_id"), lit(8)))
        .groupBy($"shard", $"lang")
        .agg(count(lit(1)).as("n_docs"),
          SketchFunctions.kllSketch($"n_tokens", KllExactK).as("sk"))
        .write.mode("overwrite").parquet(path.getAbsolutePath)
      java.nio.file.Files.write(marker.toPath, stamp.getBytes)
      ()
    }
    path.getAbsolutePath
  }
}
