package graft.operators

import graft.SparkTestBase

/** Pins the scale-critical physical-plan properties PLANS.md documents,
  * so a refactor that silently degrades a plan fails in `sbt test`
  * instead of surfacing as a bench regression:
  *  - no CartesianProduct anywhere;
  *  - BroadcastNestedLoopJoin only in the three deliberate bounded ones
  *    (d5 block pairs, s1 exact baseline, s2 centroid cross);
  *  - column pruning reaches the scan for narrow projections;
  *  - binary payload columns never cross an exchange (m1).
  */
class PlanAuditSpec extends SparkTestBase {

  // graft.eagerRelease=false keeps queries fully lazy so the audit sees
  // the complete pipeline plan (the production path eagerly checkpoints
  // persisting queries to release their caches, which would hide the
  // upstream stages behind a checkpoint scan — see graft.Materialize)
  private def planOf(name: String): String = {
    spark.conf.set("graft.eagerRelease", "false")
    try graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString
    finally {
      spark.conf.set("graft.eagerRelease", "true")
      spark.catalog.clearCache() // drop the un-released lazy persists
    }
  }

  private val DeliberateNestedLoops = Set(
    "d5_embedding_cosine_pairs", "s1_cosine_topk", "s2_ivf_ann_topk",
    // d8 reuses d5's block-pair join as its edge source
    "d8_semantic_clusters",
    // x4's pair join is over the T-row per-event-type sketch aggregate
    // (T = dimension cardinality), bounded by construction
    "x4_theta_user_overlap",
    // t16 crosses the 1-ROW vocabulary-total scalar onto the token
    // stream (broadcast) — O(n·1) by construction
    "t16_unigram_surprisal",
    // t17 crosses the 1-ROW (N, avgdl) scalar onto the per-(doc,term)
    // tf rows (broadcast) — same shape as t16's scalar cross
    "t17_bm25_retrieval",
    // s4's anchor cross is nPlanes (6) broadcast rows against the corpus
    // — O(n·planes) by construction; the candidate join itself is
    // bucket-keyed (hash join), never all-pairs
    "s4_lsh_ann_topk",
    // s5's codebook cross is nAnchors (16) broadcast rows against the
    // corpus — the O(N·K·M) PQ encode; the ADC join is equi-keyed on
    // (subspace, code) with the tiny query table broadcast
    "s5_pq_adc_topk",
    // s6 composes s2's centroid cross and s5's codebook cross — both
    // tiny broadcast sides by construction
    "s6_ivfpq_topk",
    // t21 crosses the CARDINALITY-sized source/lang marginal frames
    // (plus the 1-row total) to build the full contingency grid —
    // O(sources·langs) by construction
    "t21_chi2_source_lang",
    // p8/e3 cross the 1-ROW sqrt-mass total onto the cardinality-sized
    // source histogram — same shape as t16's scalar cross
    "p8_temperature_mix", "e3_curation_pipeline",
    // p10 crosses the 1-ROW n_sources scalar onto the doc frame; x5
    // crosses the 1-ROW global sketch onto the 5-row probe frame —
    // both the t16 scalar-cross shape
    "p10_curriculum_interleave", "x5_cms_type_counts",
    // s7's coarse pass crosses the nQueries (10) broadcast PREFIX rows
    // against the corpus — the s1 all-pairs shape deliberately run on
    // 1/8 of the vector bytes; the refine joins are equi-keyed
    "s7_matryoshka_topk",
    // s8 reuses s4's anchor cross (nPlanes=6 broadcast rows against the
    // corpus — O(n·planes) bucket assignment by construction); the
    // candidate join itself is (label, bucket)-equi-keyed
    "s8_knn_join",
    // x6's pair join is x4's shape: the T-row per-event-type sketch
    // frame joined to itself under a non-equi type predicate — bounded
    // by dimension cardinality
    "x6_theta_exclusive_users",
    // x8 reuses the same T-row sketch pair join
    "x8_theta_jaccard",
    // q54 crosses the 1-ROW max-ts split point onto the event scan —
    // the t16 scalar-cross shape
    "q54_incremental_rollup",
    // t24 crosses the 1-ROW corpus-total scalar onto the vocab-sized
    // per-source counts — the t16 scalar-cross shape
    "t24_source_drift",
    // q56 crosses the 1-ROW GK-cutpoint frame onto the customer scan —
    // the t16 scalar-cross shape (that broadcast replacing the global
    // sort is the query's entire point)
    "q56_sketch_decile_cutpoints",
    // t25 crosses the 1-ROW training-totals scalar onto the vocab-sized
    // count frame — the t16 scalar-cross shape
    "t25_quality_classifier",
    // s9 is s1's deliberate bounded all-pairs baseline (10 broadcast
    // queries against the FILTERED candidate stream) — the pre-filter
    // semi-join is the query's point; the cross is the proof kernel
    "s9_filtered_ann",
    // e4 embeds t25's scalar cross (its quality stage runs the
    // registered t25 function verbatim)
    "e4_crawl_pipeline",
    // s10's vector side crosses the 1-ROW query vector onto the corpus
    // (broadcast — the t16 scalar-cross shape) and its text side embeds
    // t17's (N, avgdl) scalar cross; the fusion join itself is an
    // equi-keyed full outer over two <= 20-row rank lists
    "s10_rrf_fusion",
    // t28 crosses the 1-ROW unigram-total and bigram-total scalars onto
    // the vocab-sized bigram counts — two t16 scalar crosses; the
    // unigram joins themselves are equi-keyed broadcasts
    "t28_pmi_bigrams",
    // s11's per-round centroid cross is k=8 broadcast rows against the
    // stationary vector scan — the s2 centroid-cross shape; the update
    // aggregate is (cid, dim)-equi-keyed
    "s11_kmeans_train",
    // e5 embeds s11's centroid crosses (training + the final posting
    // assignment); the quantization join is vec_id-equi-keyed
    "e5_index_build",
    // p13 crosses the 1-ROW corpus-token-total scalar onto the
    // bucket-sized prefix frame — the t16/p8 scalar-cross shape
    "p13_budget_select",
    // d22 crosses the 1-ROW doc-count scalar onto the (doc, term) tf
    // frame to scale idf — the t16 scalar-cross shape; the dot-product
    // join itself is shingle-equi-keyed and df-capped
    "d22_tfidf_cosine_pairs",
    // d23 reuses d5/d8's deliberate bounded block-pair join as its
    // cluster edge source; everything downstream is cluster-equi-keyed
    "d23_semdedup_keeper",
    // d24 reuses s4/s8's anchor cross (bands·r broadcast rows against
    // the corpus — O(n·bands·r) signature assignment by construction);
    // the candidate join itself is (band, signature)-equi-keyed and the
    // keeper tail is cluster-equi-keyed
    "d24_banded_semdedup",
    // d26 is d24's auto-sized edge source — the same anchor cross
    "d26_banded_auto_pairs",
    // d27 composes d26's auto-sized edge source with the keeper tail —
    // the only nested loop is the bands·r anchor cross (pinned exactly
    // below in the dedicated d27 test); candidates are (band,
    // signature)-equi-keyed, the keeper is cluster-equi-keyed
    "d27_auto_semdedup_keeper",
    // e6 crosses the 1-ROW top-language argmax onto the 1-row corpus
    // aggregate — a 1×1 scalar cross
    "e6_release_manifest",
    // g8 crosses the 1-ROW cap-accounting aggregate onto its 50-row
    // top list — the t16 scalar-cross shape ("no silent caps")
    "g8_item_similarity",
    // d25 reuses d24's anchor cross (bands·r broadcast rows against
    // corpus and batch — O(n·bands·r) signature assignment by
    // construction); the probe join itself is (band, signature)-keyed
    "d25_incremental_semdedup",
    // s12 reuses s2's centroid cross (cells broadcast rows against the
    // Q-row query batch); the rerank join is cell-equi-keyed over the
    // statically pruned postings scan
    "s12_ivf_index_topk",
    // s13 serves the same probe over the APPENDED index root — identical
    // plan shape (staging/append happen outside the served plan)
    "s13_ivf_index_append")

  // join-heavy / scan-heavy representatives; auditing all 70 would add
  // minutes of planning time for little extra signal
  private val Audited = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q4_nation_revenue",
    "q17_top_orders_global", "q18_suppliers_in_big_nations",
    "q26_followup_events_range_join", "q27_asof_last_order_before_event",
    "q28_salted_skew_agg", "q29_lang_pivot",
    "d1_exact_dedup", "d2_ngram_jaccard_pairs", "d4_minhash_lsh_pairs",
    "d5_embedding_cosine_pairs", "d6_decontamination", "d9_passage_dedup",
    "d10_winnowed_dups", "s1_cosine_topk", "s2_ivf_ann_topk",
    "t2_token_counts", "t12_salient_terms", "t13_pii_scrub",
    "m1_binary_metadata", "p3_shard_packing",
    "d11_bloom_incremental_dedup", "p4_quality_weighted_sample",
    "x1_hll_distinct_users", "d12_minhash_incremental",
    "e1_training_pipeline", "x3_frequent_tokens", "x4_theta_user_overlap",
    "q30_above_brand_avg", "q31_variant_props",
    "q32_measure_unpivot", "q33_rolling_month_spend", "q34_exact_moments",
    "q35_balance_deciles", "s3_int8_quantize", "q36_not_in_big_spenders",
    "q37_daily_gapfill", "q38_nullsafe_join", "q39_supplier_roster",
    "t15_sliding_chunks", "q40_grouping_sets", "k5_dsv2_convert",
    "t16_unigram_surprisal", "d13_minhash_oracle_twin",
    "t17_bm25_retrieval", "s4_lsh_ann_topk", "d14_duplicate_spans",
    "d15_span_scrub", "q43_lateral_topn", "p6_seeded_shuffle",
    "e2_dedup_pipeline", "s5_pq_adc_topk", "s6_ivfpq_topk",
    "q44_scd2_merge", "q45_funnel_stages", "p7_zorder_key",
    "q46_exact_percentiles", "t19_bigram_lm_perplexity",
    "d16_contamination_score", "t20_zipf_slope", "t21_chi2_source_lang",
    "p8_temperature_mix", "q47_running_distinct_types",
    "q48_nation_trade_flows", "p9_partition_pruned_read",
    "q49_window_topk_rewrite", "e3_curation_pipeline",
    "g2_triangle_copurchase", "q50_event_pattern_match",
    "q51_session_concurrency", "p10_curriculum_interleave",
    "x5_cms_type_counts", "t22_char_entropy", "p11_epoch_schedule",
    "s7_matryoshka_topk", "s8_knn_join", "x6_theta_exclusive_users",
    "q52_balance_distribution", "t23_readability", "q53_multiset_ops",
    "q54_incremental_rollup", "t24_source_drift",
    "q55_segment_order_stats", "q56_sketch_decile_cutpoints",
    "x7_gk_exact_mode_quantiles", "d17_url_dedup",
    "t25_quality_classifier", "t26_repetition_ratio",
    "q57_interpolated_series", "p12_bottomk_sample",
    "s9_filtered_ann", "e4_crawl_pipeline", "g3_bfs_hops",
    "q58_cdc_snapshot", "m5_perceptual_dedup",
    "x8_theta_jaccard", "q59_interpolated_percentiles",
    "d18_cluster_keeper", "d19_containment_pairs",
    "t27_mojibake_detect", "s10_rrf_fusion", "g5_kcore_peel",
    "q60_winsorized_stats", "g6_label_propagation",
    "q61_mad_outliers", "t28_pmi_bigrams", "x9_column_profile",
    "g7_hits_trade_graph", "d20_soft_dedup_weights", "s11_kmeans_train",
    "e5_index_build", "d21_fuzzy_decontamination", "t29_bpe_token_count",
    "g8_item_similarity", "p13_budget_select", "d22_tfidf_cosine_pairs",
    "q62_rolling_anomaly", "m6_frame_dedup", "q63_variant_extract",
    "q64_table_fingerprint", "t30_feature_hashing", "d23_semdedup_keeper",
    "e6_release_manifest", "d24_banded_semdedup", "p14_compact_small_files",
    "e7_release_diff", "m7_audio_segments", "q65_dpp_partition_prune",
    "q66_bloom_runtime_filter", "d25_incremental_semdedup",
    "p15_stratified_sample", "d26_banded_auto_pairs", "e8_lakehouse_scan",
    "q67_aqe_skew_join", "k9_ocr_triage", "d27_auto_semdedup_keeper",
    "s12_ivf_index_topk", "k10_ocr_lane_consume", "k11_unruled_tables",
    "s13_ivf_index_append")

  test("d27's production edge source has NO all-pairs stage: one anchor cross only") {
    // the d23/d5 quadratic block-pair join is a non-equi (blk_a <=
    // blk_b) nested loop; the production path must never contain it.
    // d27's edge frame is fully lazy (no checkpoints), so the whole
    // pipeline plan is visible: exactly ONE nested loop — the bands·r
    // anchor cross — and zero cartesians. 0.45 is d27/d26's pinned
    // threshold (D26Threshold).
    val prevEager = spark.conf.getOption("graft.eagerRelease")
    spark.conf.set("graft.eagerRelease", "false")
    try {
      val (pairs, bands, r) = Dedup.bandedCosinePairsAuto(spark, sfDir, 0.45)
      val plan = pairs.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), "d27 edges grew a cartesian")
      // the candidate join must be EQUI-keyed on (band, sg) — the
      // all-pairs block join would be a conditioned (<=) nested loop
      assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[band#"
        .r.findFirstIn(plan).isDefined,
        s"no (band, sg)-keyed candidate join in the d27 edge plan:\n${plan.take(800)}")
      val bnljLines = plan.linesIterator
        .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
      // exactly the bands·r anchor cross, instantiated once per side of
      // the bucket self-join (the optimizer dedups it at execution via
      // ReusedExchange); every instance must be an unconditioned Cross —
      // a conditioned (<=) nested loop would be the quadratic block join
      assert(bnljLines.size == 2 &&
        bnljLines.forall(l => l.contains("Cross") && !l.contains("<=")),
        s"d27 edges should carry only the ${bands}x$r anchor cross " +
          s"(2 plan instances), found:\n${bnljLines.mkString("\n")}")
    } finally {
      prevEager.fold(spark.conf.unset("graft.eagerRelease"))(
        spark.conf.set("graft.eagerRelease", _))
      spark.catalog.clearCache()
    }
  }

  test("no cartesian products; nested-loop joins only where deliberate") {
    Audited.foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian product")
      if (!DeliberateNestedLoops(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name grew an unplanned nested-loop join:\n${plan.take(800)}")
    }
  }

  test("narrow projections prune the parquet scan") {
    // t2 projects (doc_id, text): the documents scan must not read
    // lang/source/n_chars
    val t2 = planOf("t2_token_counts")
    val readSchema = "ReadSchema: ([^\\n]+)".r
      .findAllMatchIn(t2).map(_.group(1)).mkString(" ")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), t2.take(400))
    assert(!readSchema.contains("n_chars"),
      s"t2 reads columns it never uses: $readSchema")

    // q17's orders scan: top-k over (o_orderkey, o_totalprice [, custkey])
    val q17 = planOf("q17_top_orders_global")
    assert(!q17.contains("o_comment"), "q17 drags o_comment through the scan")
  }

  test("binary payloads stay below any exchange (m1)") {
    // m1 computes header metadata relationally; the payload column must
    // be consumed scan-side, with only derived narrow columns shuffled
    val plan = planOf("m1_binary_metadata")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(exchangeIdx >= 0, "m1 should end in a sort exchange")
    val aboveExchange = plan.substring(0, exchangeIdx)
    assert(!aboveExchange.contains("payload#"),
      s"m1 shuffles the raw binary payload:\n${plan.take(800)}")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(planOf("q17_top_orders_global").contains("TakeOrderedAndProject"))
    assert(planOf("q3_shipping_priority").contains("TakeOrderedAndProject"))
  }

  test("t17 top-k compiles to TakeOrderedAndProject and prunes the scan") {
    val p = planOf("t17_bm25_retrieval")
    assert(p.contains("TakeOrderedAndProject"),
      s"t17's limit(20) degraded to a global sort:\n${p.take(600)}")
    val readSchema = "ReadSchema: ([^\\n]+)".r
      .findAllMatchIn(p).map(_.group(1)).mkString(" ")
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"),
      s"t17 reads columns it never uses: $readSchema")
  }

  test("p5's global prefix sum is range-distributed, not a global window") {
    // ONE full-data range exchange (rangepartitioning on doc_id) feeding
    // the persisted intra frame; the intra-partition cumsum is a
    // mapPartitions pass over it (no Window.partitionBy(pid) second
    // exchange); the <=#partitions offsets broadcast back. Both
    // references to intra (totals agg + join left) must read the SAME
    // cached plan — distinct plan_ids among the REPARTITION_BY_COL range
    // exchanges == 1 — and go through InMemoryTableScan, so the corpus
    // is scanned and range-shuffled exactly once. The remaining
    // ENSURE_REQUIREMENTS range exchange is the final presentation sort.
    val p = planOf("p5_sequence_packing")
    assert(p.contains("rangepartitioning(doc_id"),
      s"p5 lost its range distribution:\n${p.take(600)}")
    assert(p.contains("BroadcastHashJoin"),
      s"p5's partition offsets should broadcast back:\n${p.take(600)}")
    val fullDataIds = raw"rangepartitioning\(doc_id[^\n]*REPARTITION_BY_COL, \[plan_id=(\d+)\]".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(fullDataIds.size == 1,
      s"p5's full-data range exchange should be one shared cached plan, got ids $fullDataIds")
    assert("InMemoryTableScan".r.findAllIn(p).size == 2,
      "p5's intra frame should be read from cache by BOTH branches")
  }

  test("t18's nfc expression runs inside whole-stage codegen") {
    // graft_nfc uses defineCodeGen — it must appear in a codegen'd
    // (*-marked) Project, not fall back to an interpreted projection.
    // Codegen stars only materialize in the FINAL adaptive plan, so run
    // the query (sf0.001) before reading it.
    val df = graft.SparkEntry.queries("t18_nfc_normalize")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_nfc"), s"t18 lost the native expression:\n${p.take(400)}")
    assert(p.linesIterator.exists(l =>
      l.contains("graft_nfc") && raw"\*\(\d+\) Project".r.findFirstIn(l).isDefined),
      s"graft_nfc fell out of whole-stage codegen:\n${p.take(800)}")
  }

  test("q41's custom top-k plan is two-phase with no window and no input sort") {
    // GroupTopKPartial must sit BELOW the hash exchange (map-side cut to
    // k rows per group before any shuffle), GroupTopKFinal above it; the
    // window operator must be absent, and the only Sort is the
    // presentation sort over the survivors (above GroupTopKFinal).
    val p = planOf("q41_grouptopk_orders")
    val iPartial = p.indexOf("GroupTopKPartial")
    val iExchange = p.indexOf("Exchange hashpartitioning(prio")
    val iFinal = p.indexOf("GroupTopKFinal")
    assert(iPartial >= 0 && iExchange >= 0 && iFinal >= 0,
      s"two-phase custom plan missing:\n${p.take(800)}")
    // plan text is top-down: final < exchange < partial
    assert(iFinal < iExchange && iExchange < iPartial,
      "partial phase must run below the exchange, final above it")
    assert(!p.contains("Window ["), "custom plan must not fall back to a window")
    val iSort = p.indexOf("Sort [")
    assert(iSort >= 0 && iSort < iFinal,
      "the only Sort must be the presentation sort over the k-per-group survivors")
    assert("Sort \\[".r.findAllIn(p).size == 1,
      "no input-side sort: the heap operator replaces it")
  }

  test("q42's recursion runs inside the engine as UnionLoop") {
    // WITH RECURSIVE must plan as Spark's native UnionLoop (iterations
    // execute frontier-sized inside the engine), never a driver-side
    // loop; the anchor's key filter must reach the scan, and the
    // aggregate over the loop output keeps its map-side partial.
    val p = planOf("q42_recursive_cte")
    assert(p.contains("UnionLoop"), s"q42 lost native recursion:\n${p.take(600)}")
    assert(p.contains("UnionLoopRef"), "recursive self-reference missing")
    assert(p.contains("partial_max"), "aggregate over the loop lost map-side partials")
  }

  test("q38 null-safe join stays a hash join, not a nested loop") {
    // EqualNullSafe is a sargable equi-key: the planner must keep a hash
    // join (coalesced key), never degrade to BroadcastNestedLoopJoin
    val p = planOf("q38_nullsafe_join")
    assert(p.contains("HashJoin"), s"q38 lost its hash join:\n${p.take(600)}")
  }

  test("q36 NOT IN plans the null-aware anti join, broadcast build side") {
    val p = planOf("q36_not_in_big_spenders")
    // BroadcastHashJoin ..., LeftAnti, BuildRight, true — the trailing
    // flag is isNullAwareAntiJoin: NOT IN's three-valued logic, not a
    // plain anti join
    assert(p.contains("LeftAnti, BuildRight, true"),
      s"q36 lost the null-aware anti join:\n${p.take(800)}")
  }

  test("q32 unpivot compiles to Expand — a narrow projection, no join/generator") {
    val p = planOf("q32_measure_unpivot")
    assert(p.contains("Expand"), s"q32 lost its Expand node:\n${p.take(600)}")
    assert(!p.contains("Join"), s"q32 grew a join:\n${p.take(600)}")
  }

  test("m2's heavy decode runs on >1 partition (round-robin before the codec)") {
    // the staged fixture can be one small parquet file; without the
    // explicit repartition the whole ImageIO decode would inherit ONE
    // input partition and serialize on a single core (VERDICT r5 #2)
    val p = planOf("m2_image_decode_meta")
    // user-specified repartition(n): AQE never coalesces it, so the
    // decode stage holds defaultParallelism partitions at any fixture
    // file count
    assert(p.contains("RoundRobinPartitioning"),
      s"m2 lost its pre-decode repartition:\n${p.take(800)}")
  }

  test("s3 quantization is narrow: no shuffle before the sort, pruned scan") {
    val p = planOf("s3_int8_quantize")
    // the only exchange is the presentation sort's range partitioning —
    // quantization itself must never move data
    assert(!p.contains("hashpartitioning"),
      s"s3 grew a hash shuffle:\n${p.take(800)}")
    val readSchema = "ReadSchema: ([^\\n]+)".r
      .findAllMatchIn(p).map(_.group(1)).mkString(" ")
    assert(!readSchema.contains("label"),
      s"s3 reads the unused label column: $readSchema")
  }

  test("q44 merge broadcasts the change keys; the dimension never hash-shuffles") {
    // SCD2's matched/unmatched split must be two BroadcastHashJoins
    // (LeftSemi + LeftAnti) against the small change-key set — at 100 TB
    // a hash exchange of the dimension here would dwarf the merge itself.
    // The only exchange beyond the broadcasts is the presentation sort.
    val p = planOf("q44_scd2_merge")
    assert(p.contains("LeftSemi, BuildRight"),
      s"q44 lost the broadcast semi join:\n${p.take(800)}")
    assert(p.contains("LeftAnti, BuildRight"),
      s"q44 lost the broadcast anti join:\n${p.take(800)}")
    assert(!p.contains("hashpartitioning"),
      s"q44 hash-shuffles the dimension:\n${p.take(800)}")
  }

  test("q45 funnel joins carry per-user aggregates, never raw events") {
    // each stage pre-aggregates min(ts) per user BEFORE joining — the
    // join inputs are HashAggregate outputs, so the shuffled volume is
    // O(users), not O(events)
    val p = planOf("q45_funnel_stages")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"q45 degraded to a non-broadcast join at fixture scale:\n${p.take(800)}")
    assert("HashAggregate".r.findAllIn(p).size >= 3,
      s"q45 lost its per-stage pre-aggregation:\n${p.take(800)}")
  }

  test("q56 buckets without sorting: no window, no data-order range exchange") {
    // the sketch-cutpoint path must never plan q35's shape — the only
    // range exchange allowed is the 10-row presentation sort on decile
    val p = planOf("q56_sketch_decile_cutpoints")
    assert(!p.contains("Window ["), s"q56 fell back to a window:\n${p.take(600)}")
    assert(!p.contains("rangepartitioning(v") && !p.contains("rangepartitioning(c_acctbal"),
      s"q56 range-exchanges the data order it exists to avoid:\n${p.take(800)}")
    assert(p.contains("rangepartitioning(decile"),
      s"q56 lost its presentation sort:\n${p.take(600)}")
  }

  test("p12's sampling window gets the two-phase WindowGroupLimit cut") {
    // the bottom-k sampler's scale claim IS the map-side cut: the
    // Partial group-limit must sit below the stratum exchange, Final
    // above it (plan text is top-down: Final < Exchange < Partial)
    val p = planOf("p12_bottomk_sample")
    val iFinal = p.indexOf("WindowGroupLimit")
    val iExchange = p.indexOf("Exchange hashpartitioning(source")
    val iPartial = p.lastIndexOf("WindowGroupLimit")
    assert(iFinal >= 0 && iExchange >= 0 && iPartial > iFinal,
      s"p12 lost the two-phase group limit:\n${p.take(800)}")
    assert(iFinal < iExchange && iExchange < iPartial,
      "the partial cut must run below the exchange, the final above it")
  }

  test("p15's constant-bound rank filter gets the two-phase WindowGroupLimit cut") {
    // the stratified sampler's scale claim is p12's: the rank filter
    // against the cross-stratum max quota must map-side cut BELOW the
    // stratum exchange before the per-stratum exact quotas apply
    val p = planOf("p15_stratified_sample")
    val iFinal = p.indexOf("WindowGroupLimit")
    val iExchange = p.indexOf("Exchange hashpartitioning(lang")
    val iPartial = p.lastIndexOf("WindowGroupLimit")
    assert(iFinal >= 0 && iExchange >= 0 && iPartial > iFinal,
      s"p15 lost the two-phase group limit:\n${p.take(800)}")
    assert(iFinal < iExchange && iExchange < iPartial,
      "the partial cut must run below the exchange, the final above it")
  }

  test("p7 z-order key stays in whole-stage codegen: one agg exchange + sort") {
    val p = planOf("p7_zorder_key")
    // the interleave is plain integer arithmetic over the aggregate's
    // output — no UDF/BatchEvalPython-style break, no extra exchange
    assert(!p.contains("BatchEval") && !p.contains("Invoke"),
      s"p7's zkey left codegen:\n${p.take(800)}")
    val hashEx = "hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"p7 should have exactly one agg exchange, saw $hashEx:\n${p.take(800)}")
  }
}
