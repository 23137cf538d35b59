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

  // ------------------------------------------------------- x3 freq items

  test("frequent-items sketch is exact (lb==est==ub) when the map never purges") {
    import graft.functions.SketchFunctions
    // planted counts: tok01 x 60, tok02 x 55, ..., tok20 x 60-5*19; map 256
    // holds all 20 actives, so maxError stays 0 and every estimate is exact
    val rows = (1 to 20).flatMap { i =>
      Seq.fill(65 - 5 * ((i - 1) % 12))(f"tok$i%02d")
    }
    val df = spark.createDataset(rows).toDF("token").repartition(4)
    val out = df.agg(SketchFunctions.freqItems($"token", 256, 5).as("items"))
      .select(posexplode($"items").as(Seq("pos", "it")))
      .select($"it.token", $"it.est", $"it.lb", $"it.ub")
      .collect()
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expectTop = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(5)
    assert(out.length == 5)
    out.zip(expectTop).foreach { case (r, (tok, n)) =>
      assert(r.getString(0) == tok, s"rank order: got ${r.getString(0)}, want $tok")
      assert(r.getLong(1) == n && r.getLong(2) == n && r.getLong(3) == n,
        s"$tok: est/lb/ub ${(r.getLong(1), r.getLong(2), r.getLong(3))} != exact $n")
    }
  }

  test("frequent-items NO_FALSE_NEGATIVES guarantee survives purges") {
    import graft.functions.SketchFunctions
    // 20k one-off tokens force purges in a 64-entry map; the planted heavy
    // hitter (1500 occurrences >> maxError <= 3.5*n/64) must survive with
    // lb <= true <= ub and an error envelope within the published bound
    val n = 20000
    val hot = 1500
    val rows = (0 until n).map(i => f"noise$i%06d") ++ Seq.fill(hot)("heavyhitter")
    val df = spark.createDataset(scala.util.Random.shuffle(rows.toVector))
      .toDF("token").repartition(4)
    val out = df.agg(SketchFunctions.freqItems($"token", 64, 10).as("items"))
      .select(posexplode($"items").as(Seq("pos", "it")))
      .select($"it.token", $"it.est", $"it.lb", $"it.ub")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.contains("heavyhitter"),
      s"heavy hitter purged — NO_FALSE_NEGATIVES violated (got ${out.keys})")
    val (est, lb, ub) = out("heavyhitter")
    assert(lb <= hot && hot <= ub, s"true count $hot outside [$lb, $ub]")
    val bound = (3.5 * (n + hot) / 64).toLong
    assert(est - hot <= bound && est >= hot,
      s"est $est vs true $hot exceeds the published MG overestimate bound $bound")
  }

  test("x3 emits topK rows per language in deterministic order") {
    val out = graft.SparkEntry.queries("x3_frequent_tokens")(spark, sfDir).collect()
    val langs = graft.Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull).select($"lang").distinct().count()
    assert(out.length == langs * Sketches.FreqTopK)
    out.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      assert(rows.map(_.getInt(1)).toSeq == (1 to Sketches.FreqTopK),
        s"$lang ranks not 1..${Sketches.FreqTopK}")
      val ests = rows.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(ests.sameElements(ests.sorted.reverse), s"$lang not sorted by est desc")
    }
  }

  // ----------------------------------------------------- x4 theta overlap

  test("x4 theta overlap equals exact counts while sketches are in exact mode") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("x4_theta_user_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val perType = events.select($"event_type", $"user_id").distinct()
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = perType.keys.toSeq.sorted
    val expectPairs = for {
      i <- types.indices; j <- (i + 1) until types.size
    } yield (types(i), types(j))
    assert(out.keySet == expectPairs.toSet,
      s"pair set mismatch: ${out.keySet} vs ${expectPairs.toSet}")
    expectPairs.foreach { case (a, b) =>
      val (ua, ub2, both) = out((a, b))
      // under 2^lgK=4096 distinct users per type the theta sketch is a
      // complete hash set: estimates are EXACT, not approximate
      assert(perType(a).size < (1 << Sketches.ThetaLgK), "test premise: exact mode")
      assert(ua == perType(a).size, s"$a: $ua != ${perType(a).size}")
      assert(ub2 == perType(b).size, s"$b: $ub2 != ${perType(b).size}")
      assert(both == (perType(a) & perType(b)).size,
        s"($a,$b): intersection $both != ${(perType(a) & perType(b)).size}")
    }
  }

  // ------------------------------------------- oracle capacity preconditions
  //
  // x3's and x4's DuckDB oracles compare exact counts against sketch
  // output, which is only valid while the sketches are in EXACT mode:
  // x4 while distinct users per event type < 2^ThetaLgK (the theta
  // sketch is a complete hash set below capacity), x3 while each
  // language's >=3-char vocabulary < FreqMapSize (Misra-Gries never
  // purges). The x4 test above pins the premise at this spec's sf0.001;
  // the driver, however, runs CORRECTNESS at sf0.01 and Bench at sf0.1 —
  // if fixture growth ever crosses a capacity there, the sketch leaves
  // exact mode and CORRECTNESS would report a FALSE red. This test makes
  // that failure mode a loud, self-explaining spec failure at every
  // driver scale instead: on failure, demote the affected oracle to
  // rows-only (oracle = None), the honest x1/x2 treatment.
  test("x3/x4 exact-mode capacity holds at every driver scale factor") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory).foreach { dir =>
        val maxUsers = graft.Tables(spark, dir, "events")
          .groupBy($"event_type")
          .agg(countDistinct($"user_id").as("n"))
          .agg(max($"n")).as[Long].head()
        assert(maxUsers < (1 << Sketches.ThetaLgK),
          s"$dir: $maxUsers distinct users in one event type >= 2^" +
            s"${Sketches.ThetaLgK} — x4's theta sketches leave exact mode " +
            "and its exact-count oracle becomes invalid; register x4 " +
            "rows-only (oracle = None) before the driver runs CORRECTNESS")
        val maxVocab = graft.Tables(spark, dir, "documents")
          .filter($"text".isNotNull)
          .select($"lang",
            explode(split(lower(trim($"text")), "\\s+")).as("token"))
          .filter(length($"token") >= 3)
          .groupBy($"lang").agg(countDistinct($"token").as("n"))
          .agg(max($"n")).as[Long].head()
        assert(maxVocab < Sketches.FreqMapSize,
          s"$dir: a language's vocabulary ($maxVocab) reached FreqMapSize " +
            s"(${Sketches.FreqMapSize}) — x3's Misra-Gries sketch would " +
            "purge and its exact top-k oracle becomes invalid; register " +
            "x3 rows-only (oracle = None) before the driver runs CORRECTNESS")
        // x7's GK precondition: every language group must stay below the
        // exact-mode accuracy, or the summary compacts and the rank-
        // identity oracle (value at ceil(q·n)) becomes invalid
        val maxLangDocs = graft.Tables(spark, dir, "documents")
          .filter($"text".isNotNull)
          .groupBy($"lang").agg(count(lit(1)).as("n"))
          .agg(max($"n")).as[Long].head()
        assert(maxLangDocs < Relational.SketchExactAccuracy,
          s"$dir: a language holds $maxLangDocs docs >= exact-mode " +
            s"accuracy (${Relational.SketchExactAccuracy}) — x7's GK " +
            "summary would compact and its rank-identity oracle becomes " +
            "invalid; register x7 rows-only before the driver runs " +
            "CORRECTNESS")
      }
  }

  test("x8's real union op equals the inclusion-exclusion identity in exact mode") {
    // below capacity the union estimate must be EXACTLY a + b − ∩ (all
    // exact counts); beyond capacity the arithmetic identity stops
    // holding while the Union op stays valid — this pins that x8 uses a
    // real set operation that agrees with ground truth where ground
    // truth exists
    val rows = graft.SparkEntry.queries("x8_theta_jaccard")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val exact = events.select($"event_type", $"user_id").distinct()
      .groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val (both, any) = (r.getLong(2), r.getLong(3))
      assert(any == exact(ta) + exact(tb) - both,
        s"($ta,$tb): union $any != ${exact(ta)}+${exact(tb)}-$both")
      val j = r.getDouble(4)
      assert(j >= 0.0 && j <= 1.0, s"jaccard $j out of range")
    }
  }

  test("x7 exact-mode quantiles equal t11's exact window quantiles") {
    // the twin claim made inside Spark (the oracle makes it cross-engine):
    // the sketch plan and the sort plan answer identically below capacity
    val viaSketch = graft.SparkEntry.queries("x7_gk_exact_mode_quantiles")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val viaSort = graft.SparkEntry.queries("t11_length_quantiles")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(viaSketch == viaSort,
      s"sketch vs sort quantiles disagree: $viaSketch vs $viaSort")
  }

  // ------------------------------------------------------------------- x5

  test("x5 CMS estimates equal exact counts and the alphabet never collides") {
    val got = graft.SparkEntry.queries("x5_cms_type_counts")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables(spark, sfDir, "events")
      .groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"CMS left exact mode: $got vs $exact")
    // the precondition is the ALPHABET, not the row count: pin it
    assert(exact.size == 5, s"event_type alphabet changed: ${exact.keySet}")
  }

  test("x6 theta difference satisfies |A\\B| == |A| - |A∩B| against x4") {
    // in exact mode the three set operations must be mutually consistent:
    // x4 reports |A|, |B|, |A∩B| per unordered pair; x6's |A\B| and
    // |B\A| must close the identity exactly
    val x4 = graft.SparkEntry.queries("x4_theta_user_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val x6 = graft.SparkEntry.queries("x6_theta_exclusive_users")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(x4.nonEmpty && x6.size == x4.size * 2)
    x4.foreach { case ((a, b), (na, nb, both)) =>
      assert(x6((a, b)) == na - both,
        s"|$a\\$b| = ${x6((a, b))} != $na - $both")
      assert(x6((b, a)) == nb - both,
        s"|$b\\$a| = ${x6((b, a))} != $nb - $both")
    }
  }

  test("overloaded CMS keeps the one-sided guarantee: estimate >= exact") {
    // force collisions: 512 distinct keys into an eps=0.25 (width 8) grid
    val keys = spark.range(0, 2000)
      .selectExpr("concat('k', id % 512) AS k")
    val sk = keys.agg(expr("count_min_sketch(k, 0.25d, 0.9d, 7)").as("sk"))
    val probed = keys.distinct()
      .crossJoin(broadcast(sk))
      .select($"k",
        graft.functions.SketchFunctions.cmsEstimate($"sk", $"k").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = keys.groupBy($"k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(probed.keySet == exact.keySet)
    // count-min never underestimates…
    exact.foreach { case (k, n) =>
      assert(probed(k) >= n, s"$k: CMS underestimated ($n -> ${probed(k)})")
    }
    // …and this grid is genuinely overloaded, so SOME estimate is inflated
    // (otherwise the test proves nothing)
    assert(exact.exists { case (k, n) => probed(k) > n },
      "premise: width-8 grid with 512 keys must collide somewhere")
  }

  test("q56 preconditions hold at every driver scale factor") {
    // the exact-NTILE oracle is valid because (a) n ≡ 0 (mod 10): the GK
    // rank ceil(i·n/10) IS NTILE's bucket-i boundary; (b) n below the
    // exact-mode accuracy: the summary never compacts; (c) custkey under
    // the tiebreak radix: the packed key stays order-isomorphic to
    // (c_acctbal, c_custkey)
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val cust = graft.Tables(spark, dir, "customer")
      val (n, maxKey) = cust
        .agg(count(lit(1)), max($"c_custkey".cast("long")))
        .as[(Long, Long)].head()
      assert(n % 10 == 0, s"$sf: NTILE/cutpoint rank identity needs 10 | n, got $n")
      assert(n < Relational.SketchExactAccuracy,
        s"$sf: exact-mode capacity exceeded ($n)")
      assert(maxKey < 100000L, s"$sf: custkey $maxKey overflows the tiebreak radix")
    }
  }

  test("q56's exact-mode cutpoints reproduce q35's NTILE deciles row-for-row") {
    // the per-ROW claim behind the aggregate oracle: at exact accuracy,
    // every single customer lands in the same decile the global sort
    // would assign
    val viaSort = graft.Tables(spark, sfDir, "customer")
      .select($"c_custkey", ntile(10).over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"c_acctbal", $"c_custkey")).as("decile"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaCuts = Relational
      .sketchDeciles(spark, sfDir, Relational.SketchExactAccuracy)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(viaCuts == viaSort, {
      val diff = viaCuts.collect {
        case (k, d) if viaSort(k) != d => s"$k: cut=$d sort=${viaSort(k)}"
      }
      s"${diff.size} rows disagree: ${diff.take(5).mkString(", ")}"
    })
  }

  test("q56 at sketch accuracy keeps the GK decile envelope: ±1, few rows off") {
    // the beyond-exact-mode contract a lake deployment relies on: with
    // rank error ≤ n/accuracy per cutpoint, a row can only cross the ONE
    // boundary it sits within error of (bucket width n/10 >> n/accuracy),
    // and at most 9 boundaries × 2·n/accuracy rows can flip at all
    val accuracy = 100 // x2's sketch-mode setting: 1% rank error
    val exact = graft.Tables(spark, sfDir, "customer")
      .select($"c_custkey", ntile(10).over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"c_acctbal", $"c_custkey")).as("decile"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val approx = Relational.sketchDeciles(spark, sfDir, accuracy)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(approx.keySet == exact.keySet)
    val n = exact.size
    val flipped = exact.count { case (k, d) => approx(k) != d }
    exact.foreach { case (k, d) =>
      assert(math.abs(approx(k) - d) <= 1,
        s"customer $k drifted >1 decile: exact $d vs sketch ${approx(k)}")
    }
    assert(flipped <= 18 * n / accuracy,
      s"$flipped of $n rows flipped — beyond the 18n/accuracy envelope")
  }

  // ---------------------------------------------------------- x10/x11 KLL

  test("x10: KLL quantiles land within the library's normalized rank-error envelope") {
    val eps = graft.functions.KllQuantilesAgg.normalizedRankError(Sketches.KllK)
    val approx = graft.SparkEntry.queries("x10_kll_length_quantiles")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val byLang = graft.Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull)
      .select($"lang", size(split(trim($"text"), "\\s+")).cast("long").as("n"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(approx.keySet == byLang.keySet)
    // KLL guarantee (99% confidence, deterministic at fixture n where
    // the sketch stays exact): returned value's rank within eps*n of the
    // target rank, plus 1 for discreteness at tiny n
    def rankOk(sorted: Array[Long], v: Long, q: Double): Boolean = {
      val n = sorted.length
      val lo = sorted.count(_ < v)
      val hi = sorted.count(_ <= v)
      val target = math.ceil(q * n)
      val tol = eps * n + 1
      assert(hi > lo, s"KLL value $v does not occur in the data")
      target >= lo + 1 - tol && target <= hi + tol
    }
    byLang.foreach { case (lang, sorted) =>
      val (p50, p90) = approx(lang)
      assert(rankOk(sorted, p50, 0.5), s"$lang p50=$p50 outside KLL rank bound")
      assert(rankOk(sorted, p90, 0.9), s"$lang p90=$p90 outside KLL rank bound")
    }
  }

  test("x11: exact-mode KLL equals the ceil(q*n)-rank item; capacity precondition holds per driver SF") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory).foreach { dir =>
        val maxLangDocs = graft.Tables(spark, dir, "documents")
          .filter($"text".isNotNull)
          .groupBy($"lang").agg(count(lit(1)).as("n"))
          .agg(max($"n")).as[Long].head()
        assert(maxLangDocs < Sketches.KllExactK,
          s"$dir: a language holds $maxLangDocs docs >= KllExactK " +
            s"(${Sketches.KllExactK}) — x11's KLL sketch would compact " +
            "and its rank-identity oracle becomes invalid; register x11 " +
            "rows-only before the driver runs CORRECTNESS")
      }
    // rank identity at the test SF: the full sketch path (update,
    // cross-exchange serialize/heapify, merge, INCLUSIVE eval) returns
    // exactly the item at 1-based rank ceil(q*n) of each group's sorted
    // order — t11's discrete quantile, what the DuckDB oracle replays
    val got = graft.SparkEntry.queries("x11_kll_exact_mode_quantiles")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val byLang = graft.Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull)
      .select($"lang", size(split(trim($"text"), "\\s+")).cast("long").as("n"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (lang, sorted) =>
      val n = sorted.length
      def at(q: Double): Long = sorted(math.ceil(q * n).toInt - 1)
      assert(got(lang) == ((n.toLong, at(0.5), at(0.9))),
        s"$lang: ${got(lang)} != exact (n=$n, ${at(0.5)}, ${at(0.9)})")
    }
  }

  test("x12: the shard-merge scans only the stored artifact, equals x11, and is merge-order invariant") {
    import spark.implicits._
    val rootPath = Sketches.kllShardsRoot(spark, sfDir)

    // the rollup's scan set is the artifact alone — no document row
    val merged = graft.SparkEntry.queries("x12_kll_shard_merge")(spark, sfDir)
    val scanned = merged.inputFiles.toSeq
    assert(scanned.nonEmpty && scanned.forall(_.contains("kllshards_")),
      s"shard merge scanned outside the artifact: ${scanned.take(3)}")

    // stored-merge ≡ the one-pass exact-mode twin, row-for-row
    val viaRows = graft.SparkEntry.queries("x11_kll_exact_mode_quantiles")(
      spark, sfDir).collect().map(_.toString).toSeq
    assert(merged.collect().map(_.toString).toSeq == viaRows,
      "merging stored shard sketches diverged from the one-pass aggregate")

    // merge-order invariance, driver-side: permuting the shard merge
    // order changes nothing (below capacity the merge is exact; above
    // it KLL's envelope is order-independent — here we pin exactness)
    val perLang = spark.read.parquet(rootPath)
      .select($"lang", $"sk").as[(String, Array[Byte])].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(perLang.values.exists(_.size > 1),
      "fixture lost multi-shard languages — the merge path is vacuous")
    perLang.foreach { case (lang, sketches) =>
      def mergeAll(order: Seq[Array[Byte]]): Seq[Long] = {
        val buf = org.apache.datasketches.kll.KllLongsSketch
          .newHeapInstance(Sketches.KllExactK)
        order.foreach(b => buf.merge(
          org.apache.datasketches.kll.KllLongsSketch.heapify(
            org.apache.datasketches.memory.Memory.wrap(b))))
        Seq(0.1, 0.5, 0.9).map(q => buf.getQuantile(q,
          org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE))
      }
      val fwd = mergeAll(sketches)
      assert(mergeAll(sketches.reverse) == fwd &&
        mergeAll(sketches.indices.sortBy(i => (i * 7) % sketches.size)
          .map(sketches)) == fwd,
        s"$lang: merge order changed the quantiles")
    }
  }
}
