package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant pins for the round-8 corpus-analytics additions (the DuckDB
  * oracle checks exact values; these pin the SEMANTIC contracts a value
  * hash can't express — cross-query consistency, monotonicity, bounds).
  */
class CorpusAnalyticsSpec extends SparkTestBase {

  import spark.implicits._

  test("d16 scores agree with d6's counts and flag exactly the >25% docs") {
    val d16 = graft.SparkEntry.queries("d16_contamination_score")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val d6 = graft.SparkEntry.queries("d6_decontamination")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d16.keySet == d6.keySet, "d16 and d6 must report the same train docs")
    d16.foreach { case (id, r) =>
      val (nGrams, nShared, frac, flagged) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
      assert(nShared == d6(id), s"doc $id: d16 n_shared $nShared != d6 ${d6(id)}")
      assert(nShared <= nGrams, s"doc $id: shared exceeds total")
      assert(frac >= 0.0 && frac <= 1.0, s"doc $id: overlap_frac $frac out of [0,1]")
      assert(flagged == (nShared * 4 > nGrams), s"doc $id: flag disagrees with 25% rule")
    }
    // eval docs must be excluded from the train-side report
    assert(d16.keys.forall(_ % 7 != 0), "eval docs leaked into the report")
  }

  test("t20 fits a negative Zipf slope per language over tie-broken ranks") {
    val rows = graft.SparkEntry.queries("t20_zipf_slope")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, nRanks, slope) = (r.getString(0), r.getLong(1), r.getDouble(2))
      assert(nRanks >= 2 && nRanks <= 100, s"$lang: n_ranks $nRanks out of range")
      assert(slope < 0.0, s"$lang: frequency must fall with rank, slope was $slope")
    }
  }

  test("t21 chi-squared is non-negative with V in [0,1] and consistent dof") {
    val r = graft.SparkEntry.queries("t21_chi2_source_lang")(spark, sfDir)
      .collect().head
    val (nSrc, nLang, dof, chi2, v) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    assert(dof == (nSrc - 1) * (nLang - 1))
    assert(chi2 >= 0.0)
    assert(v >= 0.0 && v <= 1.0, s"Cramér's V $v out of [0,1]")
  }

  test("p8 fills every source's quota exactly and weights sum to 1") {
    val out = graft.SparkEntry.queries("p8_temperature_mix")(spark, sfDir)
    val bySource = out.groupBy($"source")
      .agg(count(lit(1)).as("picked"), first($"quota").as("quota"),
        first($"weight").as("weight"), first($"n_docs").as("n_docs"))
      .collect()
    bySource.foreach { r =>
      val (picked, quota, nDocs) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(picked == math.min(quota, nDocs),
        s"${r.getString(0)}: picked $picked != min(quota $quota, n_docs $nDocs)")
    }
    val wsum = bySource.map(_.getDouble(3)).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum, not ~1")
    // temperature property: weight per doc decreases with source size —
    // sqrt dampening means smaller sources get MORE than proportional share
    val props = bySource.map(r => (r.getLong(4), r.getDouble(3) / r.getLong(4)))
    props.sortBy(_._1).sliding(2).foreach {
      case Array((nA, shareA), (nB, shareB)) =>
        if (nA < nB)
          assert(shareA >= shareB,
            s"per-doc share must not grow with source size: $nA->$shareA, $nB->$shareB")
      case _ =>
    }
  }

  test("q47 running distinct count is per-user monotone and lands on the exact distinct total") {
    val out = graft.SparkEntry.queries("q47_running_distinct_types")(spark, sfDir)
    // monotone non-decreasing along each user's timeline (output is
    // already ordered user-major, time-minor)
    val perUser = out.collect().groupBy(_.getLong(1))
    perUser.foreach { case (u, rows) =>
      val counts = rows.map(_.getLong(3))
      assert(counts.zip(counts.tail).forall { case (a, b) => b >= a },
        s"user $u: running count decreased")
      val distinctTypes = rows.map(_.getString(2)).distinct.length
      assert(counts.last == distinctTypes,
        s"user $u: final count ${counts.last} != distinct types $distinctTypes")
      assert(counts.head == 1L, s"user $u: first event must count 1 type")
    }
  }

  test("p10 interleaves sources round-robin with quality-descending ranks") {
    val rows = graft.SparkEntry.queries("p10_curriculum_interleave")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // the fixture's 20 equal-sized sources make positions a permutation
    val pos = rows.map(_._4).sorted
    assert(pos.sameElements(rows.indices.map(_.toLong)),
      "equal-sized sources must fill every curriculum position")
    // the first n_sources positions are each source's rank-1 doc, one per
    // source in source order
    val nSrc = rows.map(_._2).distinct.length
    val head = rows.sortBy(_._4).take(nSrc)
    assert(head.map(_._2).distinct.length == nSrc,
      "leading block must visit every source once")
    assert(head.forall(_._3 == 1L), "leading block must be the rank-1 docs")
    // within a source, rank order follows quality (n_chars desc, doc_id)
    val quality = graft.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val byRank = rs.sortBy(_._3).map(t => (quality(t._1), t._1))
      byRank.sliding(2).foreach {
        case Array((qa, ia), (qb, ib)) =>
          assert(qa > qb || (qa == qb && ia < ib),
            s"$src: rank order violates (n_chars desc, doc_id): " +
              s"($qa,$ia) before ($qb,$ib)")
        case _ =>
      }
    }
  }

  test("t22 entropy respects its bounds and matches a driver-side recompute") {
    val rows = graft.SparkEntry.queries("t22_char_entropy")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, distinct, h) =>
      assert(n >= distinct && distinct >= 1, s"doc $id: counts inconsistent")
      assert(h >= 0.0, s"doc $id: negative entropy $h")
      val cap = math.log(distinct.toDouble) / math.log(2.0)
      assert(h <= cap + 1e-6,
        s"doc $id: entropy $h exceeds log2(distinct)=$cap")
    }
    // independent recompute for the first 20 docs
    val texts = graft.Tables(spark, sfDir, "documents")
      .filter($"doc_id" < 20 && $"text".isNotNull)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = rows.filter(_._1 < 20).map(t => t._1 -> t._4).toMap
    texts.foreach { case (id, text) =>
      val counts = text.groupBy(identity).values.map(_.length.toDouble)
      val n = text.length.toDouble
      val expect = counts.map(c => -(c / n) * (math.log(c / n) / math.log(2.0))).sum
      assert(math.abs(got(id) - expect) < 1e-5,
        s"doc $id: entropy ${got(id)} != recomputed $expect")
    }
  }

  test("p11 epochs are distinct deterministic permutations of the corpus") {
    val rows = graft.SparkEntry.queries("p11_epoch_schedule")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val nDocs = graft.Tables(spark, sfDir, "documents").count()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0, 1, 2))
    byEpoch.foreach { case (e, rs) =>
      // every doc appears exactly once per epoch
      assert(rs.map(_._2).distinct.length == nDocs.toInt,
        s"epoch $e is not a permutation")
      // positions are contiguous 1..n within each shard
      rs.groupBy(_._3).foreach { case (sh, srows) =>
        val ps = srows.map(_._4).sorted
        assert(ps.sameElements((1L to ps.length.toLong)),
          s"epoch $e shard $sh: positions not contiguous")
      }
    }
    // epoch orders genuinely differ: some doc lands in different shards
    val shardsOf = rows.groupBy(_._2).view.mapValues(_.map(_._3).distinct.size)
    assert(shardsOf.values.exists(_ > 1),
      "epoch salting changed no doc's shard — orders are identical")
  }

  test("t23 readability matches a driver-side recompute") {
    val got = graft.SparkEntry.queries("t23_readability")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val texts = graft.Tables(spark, sfDir, "documents")
      .filter($"doc_id" < 25 && $"text".isNotNull)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val words = text.trim.split("\\s+", -1).length.toLong
      val sents = math.max(text.split("[.!?]+", -1).length - 1, 1).toLong
      val sylls = math.max(
        text.toLowerCase.split("[aeiouy]+", -1).length - 1, 1).toLong
      val flesch = BigDecimal(
        206.835 - 1.015 * (words.toDouble / sents)
          - 84.6 * (sylls.toDouble / words))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gw, gs, gy, gf) = got(id)
      assert((gw, gs, gy) == ((words, sents, sylls)),
        s"doc $id: counts ($gw,$gs,$gy) != ($words,$sents,$sylls)")
      assert(math.abs(gf - flesch) < 1e-9,
        s"doc $id: flesch $gf != $flesch")
    }
  }

  test("q52 tied balances share their distribution position") {
    val rows = graft.SparkEntry.queries("q52_balance_distribution")(spark, sfDir)
      .collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    rows.groupBy(t => (t._1, t._2)).foreach { case ((seg, bal), ties) =>
      assert(ties.map(_._3).distinct.length == 1 &&
        ties.map(_._4).distinct.length == 1,
        s"$seg/$bal: tied balances disagree on pct_rank/cume_dist")
    }
    // bounds: pct_rank in [0,1] starting at 0; cume_dist in (0,1]
    assert(rows.forall(t => t._3 >= 0.0 && t._3 <= 1.0))
    assert(rows.forall(t => t._4 > 0.0 && t._4 <= 1.0))
  }

  test("t24 KL drift is non-negative (Gibbs) and tokens reconcile") {
    val rows = graft.SparkEntry.queries("t24_source_drift")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, kl) =>
      assert(n > 0, s"$src: no tokens")
      // Gibbs' inequality: KL(P||Q) >= 0, zero only if P == Q
      assert(kl >= 0.0 && !kl.isNaN && !kl.isInfinite,
        s"$src: invalid divergence $kl")
    }
    // per-source token totals must sum to the corpus total
    val corpusTokens = graft.Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull)
      .select(explode(split(lower(trim($"text")), "\\s+")).as("t"))
      .filter(length($"t") >= 1).count()
    assert(rows.map(_._2).sum == corpusTokens,
      s"source totals ${rows.map(_._2).sum} != corpus $corpusTokens")
  }

  test("q54 delta-merge is indistinguishable from q20's direct rollup") {
    // the whole point of incremental maintenance: base+delta merge must
    // equal the full recompute, row for row
    val merged = graft.SparkEntry.queries("q54_incremental_rollup")(spark, sfDir)
      .collect().map(_.toSeq)
    val direct = graft.SparkEntry.queries("q20_hourly_event_rollup")(spark, sfDir)
      .collect().map(_.toSeq)
    assert(merged.sameElements(direct),
      "incremental merge diverged from the direct rollup")
  }

  test("p10 grouped prefix ranking is partition-count invariant") {
    val q = graft.SparkEntry.queries("p10_curriculum_interleave")
    val default = q(spark, sfDir).collect().map(_.toSeq)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val single = q(spark, sfDir).collect().map(_.toSeq)
      assert(single.sameElements(default),
        "partitioning changed the curriculum order")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("t26 repetition ratio matches a driver-side recompute") {
    val got = graft.SparkEntry.queries("t26_repetition_ratio")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docs = graft.Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull).select($"doc_id", $"text")
      .as[(Long, String)].collect()
    assert(got.keySet == docs.map(_._1).toSet)
    docs.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+")
      val grams = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      val nDup = counts.values.filter(_ > 1).sum
      val frac =
        if (grams.isEmpty) 0.0
        else BigDecimal(nDup.toDouble / grams.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == ((grams.size.toLong, nDup.toLong, frac)),
        s"doc $id: got ${got(id)}, recomputed ($grams.size, $nDup, $frac)")
    }
    // premise: the synthetic corpus genuinely contains repetitive docs,
    // so the signal discriminates
    assert(got.values.exists(_._3 > 0.0) && got.values.exists(_._3 < 0.2))
  }

  test("q57 passes observations through and interpolates strictly between neighbors") {
    val rows = graft.SparkEntry.queries("q57_interpolated_series")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getDouble(2), r.getBoolean(3)))
    // the fill must actually fire at fixture scale
    assert(rows.exists(!_._4), "no gaps — interpolation untested")
    rows.groupBy(_._1).foreach { case (tpe, series) =>
      val sorted = series.sortBy(_._2.toEpochDay)
      // spine is contiguous and edge days are observed by construction
      assert(sorted.head._4 && sorted.last._4, s"$tpe spine edge unobserved")
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1)._2.toEpochDay == w(0)._2.toEpochDay + 1,
          s"$tpe spine has a hole")
      }
      // every interpolated value lies within [prev obs, next obs]
      sorted.zipWithIndex.filter(!_._1._4).foreach { case ((_, _, v, _), i) =>
        val prev = sorted.take(i).reverse.find(_._4).get._3
        val next = sorted.drop(i + 1).find(_._4).get._3
        val (lo, hi) = (math.min(prev, next), math.max(prev, next))
        assert(v >= lo - 1e-6 && v <= hi + 1e-6,
          s"$tpe interpolated $v outside [$lo, $hi]")
      }
    }
  }

  test("p12 bottom-k sample is mergeable: shard-wise bottom-k re-truncates exactly") {
    // the KMV property the scale story rests on: bottom-k of the union
    // equals the re-truncated union of per-shard bottom-ks
    val full = graft.SparkEntry.queries("p12_bottomk_sample")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def md5Of(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft:7:$id".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val docs = graft.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val merged = docs
      .groupBy(_._2).toSeq.flatMap { case (src, ds) =>
        // two hash-disjoint shards, bottom-10 each, merged, re-cut to 10
        val (s1, s2) = ds.map(_._1).partition(_ % 2 == 0)
        val b1 = s1.sortBy(id => (md5Of(id), id)).take(10)
        val b2 = s2.sortBy(id => (md5Of(id), id)).take(10)
        (b1 ++ b2).sortBy(id => (md5Of(id), id)).take(10)
          .zipWithIndex.map { case (id, i) => (src, (i + 1).toLong, id) }
      }
    assert(full.toSet == merged.toSet,
      "shard-wise bottom-k merge diverged from the global sample")
  }

  test("t25 classifier separates its training classes (and is a real model)") {
    // the closed-form NB log-odds model must actually LEARN the
    // curated-vs-crawl separation it was trained on: curated sources
    // score higher on average and pass the keep gate more often. (Not a
    // tautology — a broken weight formula, a dropped bias, or a
    // mis-joined weight table all collapse the separation.)
    val scores = graft.SparkEntry.queries("t25_quality_classifier")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    val srcOf = graft.Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull).select($"doc_id", $"source")
      .as[(Long, String)].collect().toMap
    val (curated, crawl) = scores.partition { case (id, _) =>
      Set("src0", "src1")(srcOf(id))
    }
    assert(curated.nonEmpty && crawl.nonEmpty)
    val meanCur = curated.values.map(_._1).sum / curated.size
    val meanCrawl = crawl.values.map(_._1).sum / crawl.size
    assert(meanCur > meanCrawl,
      s"model failed to separate: curated mean $meanCur <= crawl mean $meanCrawl")
    val keepCur = curated.values.count(_._2).toDouble / curated.size
    val keepCrawl = crawl.values.count(_._2).toDouble / crawl.size
    assert(keepCur > keepCrawl,
      s"keep gate inverted: curated $keepCur <= crawl $keepCrawl")
  }

  test("t27 premise: the fixture corpus is free of every artifact class it plants") {
    import spark.implicits._
    // the planting scheme is only sound if the raw text never contains
    // the artifact codepoints natively (the t18 ASCII-premise pattern);
    // if a fixture vintage ever ships non-ASCII text this must fail
    // before the oracle silently absorbs the miscount
    val bad = Seq(195, 65533, 133, 146, 168, 169)
      .map(cp => s"position(chr($cp) in text) > 0").mkString(" OR ")
    val n = graft.Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull).filter(expr(bad)).count()
    assert(n == 0L, s"$n fixture docs already contain artifact codepoints")
  }

  test("t27 counters equal the planted counts per residue class") {
    val rows = graft.SparkEntry.queries("t27_mojibake_detect")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (moji, repl, c1) = (id % 4) match {
        case 1 => (2L, 0L, 0L)
        case 2 => (0L, 2L, 0L)
        case 3 => (0L, 0L, 2L)
        case _ => (0L, 0L, 0L)
      }
      assert(r.getAs[Long]("n_moji") == moji
        && r.getAs[Long]("n_repl") == repl
        && r.getAs[Long]("n_c1") == c1,
        s"doc $id counters off: $r")
      assert(r.getAs[Boolean]("flagged") == (id % 4 != 0))
    }
  }

  test("s10 RRF output fuses both modalities with the exact 1/(60+rank) arithmetic") {
    val rows = graft.SparkEntry.queries("s10_rrf_fusion")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // descending fused score, each row from at least one component list
    val scores = rows.map(_.getAs[Double]("rrf"))
    assert(scores.sameElements(scores.sortBy(-_)))
    rows.foreach { r =>
      val tr = Option(r.getAs[Integer]("text_rank")).map(_.toInt)
      val vr = Option(r.getAs[Integer]("vec_rank")).map(_.toInt)
      assert(tr.nonEmpty || vr.nonEmpty, s"row with no provenance: $r")
      val expect = tr.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vr.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") -
        BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12,
        s"rrf arithmetic drifted: $r vs $expect")
    }
    // fusion is real only if both retrievers contribute somewhere
    assert(rows.exists(_.getAs[Integer]("text_rank") != null)
      && rows.exists(_.getAs[Integer]("vec_rank") != null),
      "one modality never reached the fused top-k")
  }

  test("q60 winsorization matches a driver-side recompute") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q60_winsorized_stats")(spark, sfDir)
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val raw = graft.Tables(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_extendedprice")
      .as[(String, Double)].collect().groupBy(_._1)
    def pct(sorted: Array[Double], q: Double): Double = {
      val rank = q * (sorted.length - 1)
      val lo = math.floor(rank).toInt
      val hi = math.ceil(rank).toInt
      sorted(lo) + (rank - lo) * (sorted(hi) - sorted(lo))
    }
    raw.foreach { case (flag, rows) =>
      val vs = rows.map(_._2).sorted
      val lo = BigDecimal(pct(vs, 0.05)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      val hi = BigDecimal(pct(vs, 0.95)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      val dec = vs.map(v => BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      val clipped = dec.map(v => v.max(lo).min(hi))
      val r = got(flag)
      assert(r.getAs[Long]("n") == vs.length)
      assert(r.getAs[Long]("n_clip_lo") == dec.count(_ < lo).toLong, s"$flag clip_lo")
      assert(r.getAs[Long]("n_clip_hi") == dec.count(_ > hi).toLong, s"$flag clip_hi")
      val mean = BigDecimal(clipped.sum.toDouble / vs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("winsor_mean") - mean) < 1e-9,
        s"$flag winsor mean ${r.getAs[Double]("winsor_mean")} vs $mean")
      // the clip band is the 5% tails: each side clips ~5% of rows
      val frac = r.getAs[Long]("n_clip_lo").toDouble / vs.length
      assert(frac > 0.0 && frac <= 0.06, s"$flag lo clip fraction $frac")
    }
  }

  test("q61 MAD outliers match a driver-side recompute") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q61_mad_outliers")(spark, sfDir)
      .collect().map(r => r.getAs[String]("etype") -> r).toMap
    val raw = graft.Tables(spark, sfDir, "events")
      .select($"event_type", $"value")
      .as[(String, Double)].collect().groupBy(_._1)
    def pct(sorted: Array[Double], q: Double): Double = {
      val rank = q * (sorted.length - 1)
      val lo = math.floor(rank).toInt
      val hi = math.ceil(rank).toInt
      sorted(lo) + (rank - lo) * (sorted(hi) - sorted(lo))
    }
    def dec4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(got.keySet == raw.keySet)
    raw.foreach { case (seg, rows) =>
      val ps = rows.map(t => dec4(t._2))
      val med = dec4(pct(ps.map(_.toDouble).sorted, 0.5))
      val devs = ps.map(p => (p - med).abs)
      val mad = dec4(pct(devs.map(_.toDouble).sorted, 0.5))
      val nOut = devs.count(_ > mad * 3).toLong
      val r = got(seg)
      assert(r.getAs[Long]("n") == ps.length.toLong, s"$seg n")
      assert(math.abs(r.getAs[Double]("med") - med.toDouble) < 1e-9, s"$seg med")
      assert(math.abs(r.getAs[Double]("mad") - mad.toDouble) < 1e-9, s"$seg mad")
      assert(r.getAs[Long]("n_outliers") == nOut, s"$seg outliers")
      // the screen is a robust TAIL cut: it must flag something at
      // fixture scale but never a majority (3·MAD ≈ 2σ-equivalent)
      assert(nOut < ps.length / 2, s"$seg flags a majority")
    }
    assert(got.values.map(_.getAs[Long]("n_outliers")).sum > 0,
      "no segment flagged anything — the threshold is not a real screen")
  }

  test("t28 PMI matches a driver-side recompute and is the true top-30 cut") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("t28_pmi_bigrams")(spark, sfDir).collect()
    assert(got.length == 30)
    val texts = graft.Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull).select($"text").as[String].collect()
    val uni = collection.mutable.Map.empty[String, Long]
    val big = collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val toks = t.trim.split("\\s+")
      toks.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1L)
      toks.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p(0), p(1)); big(k) = big.getOrElse(k, 0L) + 1L
      }
    }
    val n1 = uni.values.sum.toDouble
    val n2 = big.values.sum.toDouble
    def pmi(w1: String, w2: String, c2: Long): Double = {
      val v = math.log((c2 / n2) / ((uni(w1) / n1) * (uni(w2) / n1)))
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = big.iterator.filter(_._2 >= 5L)
      .map { case ((w1, w2), c2) => (w1, w2, c2, pmi(w1, w2, c2)) }
      .toSeq.sortBy { case (w1, w2, _, p) => (-p, w1, w2) }.take(30)
    got.zip(expected).foreach { case (r, (w1, w2, c2, p)) =>
      assert(r.getString(0) == w1 && r.getString(1) == w2,
        s"pair mismatch: (${r.getString(0)},${r.getString(1)}) vs ($w1,$w2)")
      assert(r.getLong(2) == c2, s"($w1,$w2) count")
      assert(math.abs(r.getDouble(3) - p) < 1e-9, s"($w1,$w2) pmi")
    }
    // association is real: the top pair must beat independence (pmi > 0)
    assert(got.head.getDouble(3) > 0.0, "top collocation is not associated")
  }

  test("x9 profile matches a driver-side recompute of every metric") {
    val rows = graft.Tables(spark, sfDir, "documents").collect()
    val got = graft.SparkEntry.queries("x9_column_profile")(spark, sfDir)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    assert(got.keySet == cols.toSet)
    cols.foreach { c =>
      val vs = rows.map(_.getAs[Any](c))
      val nonNull = vs.filter(_ != null)
      val r = got(c)
      assert(r.getAs[Long]("n_rows") == rows.length.toLong, s"$c n_rows")
      assert(r.getAs[Long]("n_null") == (vs.length - nonNull.length).toLong,
        s"$c n_null")
      assert(r.getAs[Long]("n_distinct") == nonNull.distinct.length.toLong,
        s"$c n_distinct")
      // min/max are computed in the COLUMN's type, rendered as strings
      val (mn, mx) = nonNull.head match {
        case _: Long =>
          val l = nonNull.map(_.asInstanceOf[Long])
          (l.min.toString, l.max.toString)
        case _: String =>
          val s = nonNull.map(_.asInstanceOf[String])
          (s.min, s.max)
      }
      assert(r.getAs[String]("min_val") == mn, s"$c min")
      assert(r.getAs[String]("max_val") == mx, s"$c max")
    }
  }

  test("t29 piece counts match java-regex recompute; planted branches fire") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("t29_bpe_token_count")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val pat = java.util.regex.Pattern.compile(
      "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+")
    def pieces(t: String): Seq[String] = {
      val m = pat.matcher(t); val b = Seq.newBuilder[String]
      while (m.find()) b += m.group(); b.result()
    }
    val docs = graft.Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    docs.foreach { case (id, text) =>
      val t = (id % 4) match {
        case 1 => text + " don't stop"
        case 2 => text + " v2.1 costs 9,99"
        case 3 => text + " end... ok?!"
        case _ => text
      }
      val ps = pieces(t)
      val r = got(id)
      assert(r.getAs[Long]("n_pieces") == ps.length.toLong, s"doc $id pieces")
      assert(r.getAs[Long]("n_distinct_pieces") == ps.distinct.length.toLong,
        s"doc $id distinct")
      // branch premises: the ASCII corpus has no digits or punctuation
      // of its own (t18's premise), so the planted residues are the ONLY
      // sources — each class fires exactly where planted
      (id % 4) match {
        case 0 => assert(r.getAs[Long]("n_num") == 0 &&
          r.getAs[Long]("n_punct") == 0, s"doc $id: clean doc has artifacts")
        case 1 => assert(r.getAs[Long]("n_punct") == 1, s"doc $id apostrophe")
        case 2 => assert(r.getAs[Long]("n_num") == 4, s"doc $id digit runs")
        case 3 => assert(r.getAs[Long]("n_punct") == 2, s"doc $id punct runs")
      }
    }
  }

  test("g8 equals a driver-side co-purchase Jaccard rebuild (capped universe)") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("g8_item_similarity")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val li = graft.Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
    val ord = graft.Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val cp = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_suppkey").distinct()
      .as[(Long, Long)].collect()
    val byC = cp.groupBy(_._1).filter(_._2.length <= 64)
    val bySupp = byC.values.flatten.groupBy(_._2).map {
      case (p, es) => p -> es.map(_._1).toSet }
    val pairs = for {
      a <- bySupp.keys.toSeq; b <- bySupp.keys.toSeq
      if a < b
      common = (bySupp(a) & bySupp(b)).size if common > 0
    } yield {
      val j = BigDecimal(common.toDouble /
        (bySupp(a).size + bySupp(b).size - common))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, common.toLong, j)
    }
    val expect = pairs.sortBy { case (a, b, _, j) => (-j, a, b) }.take(50)
    assert(got.toSeq == expect, "g8 disagrees with the driver rebuild")
    assert(got.forall { case (_, _, c, j) => c > 0 && j > 0.0 && j <= 1.0 })
  }

  test("p13 budget prefix is greedy-maximal: fits B, next bucket would not") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("p13_budget_select")(spark, sfDir)
      .collect()
      .map(r => (r.getDouble(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_toks"), r.getAs[Long]("cum_toks")))
    assert(got.nonEmpty, "empty selection — budget smaller than best bucket?")
    // recompute the bucket table driver-side
    val docs = graft.Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull).select($"text").as[String].collect()
    val buckets = docs.map { t =>
      val n = t.trim.split("\\s+").length.toLong
      val c = t.count(_ != ' ').toLong
      val qb = BigDecimal(c.toDouble / n)
        .setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
      (qb, n)
    }.groupBy(_._1).map { case (qb, xs) =>
      (qb, xs.length.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy(-_._1)
    val total = buckets.map(_._3).sum.toDouble
    val cums = buckets.scanLeft(0L)(_ + _._3).tail
    val expect = buckets.zip(cums).takeWhile(_._2 <= total / 4.0)
      .map { case ((qb, nd, nt), cum) => (qb, nd, nt, cum) }
    assert(got.toSeq == expect, "p13 disagrees with the driver rebuild")
    // greedy maximality: the selection fills the budget up to the next
    // bucket — one more bucket would overshoot
    val cutIdx = expect.length
    assert(cutIdx == buckets.length ||
      cums(cutIdx) > total / 4.0, "selection stopped early")
    assert(got.last._4 <= (total / 4.0).toLong)
  }

  test("q62 rolling z-scores match a driver recompute and the screen fires") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q62_rolling_anomaly")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(2), r.getDouble(4), r.getBoolean(5))).toMap
    val daily = graft.Tables(spark, sfDir, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum($"value".cast("decimal(18,4)")).as("total"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getDecimal(2)))
      .groupBy(_._1)
    var expectFlagged = 0
    daily.foreach { case (etype, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.indices.foreach { i =>
        val win = sorted.slice(math.max(0, i - 7), i)
        if (win.length == 7) {
          val s1 = win.map(x => BigDecimal(x._3)).sum
          val s2 = win.map(x => BigDecimal(x._3) * BigDecimal(x._3)).sum
          val mu = s1.toDouble / 7.0
          val sd = math.sqrt((s2.toDouble - s1.toDouble * s1.toDouble / 7.0) / 6.0)
          val x = BigDecimal(sorted(i)._3).toDouble
          val z = BigDecimal((x - mu) / sd)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          val (gx, gz, gf) = got((etype, sorted(i)._2))
          assert(math.abs(gx - x) < 1e-9, s"$etype ${sorted(i)._2} total")
          assert(math.abs(gz - z) < 1e-9, s"$etype ${sorted(i)._2} z: $gz vs $z")
          assert(gf == (math.abs(z) > 2.0), s"$etype ${sorted(i)._2} flag")
          if (gf) expectFlagged += 1
        } else
          assert(!got.contains((etype, sorted(i)._2)),
            s"$etype ${sorted(i)._2} scored with only ${win.length} prior days")
      }
    }
    assert(expectFlagged > 0, "no anomaly on the fixture — the screen is inert")
  }

  test("q63 variant path agrees with the string-JSON path on every aggregate") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q63_variant_extract")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // the pre-variant extraction (q14's get_json_object) must see the
    // identical values — a variant codec bug would split the two paths
    val legacy = graft.Tables(spark, sfDir, "events")
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)), count($"k"), sum($"k"), min($"k"), max($"k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == legacy, "variant and string-JSON extraction disagree")
  }

  test("q64 fingerprint matches a driver md5 rebuild and detects a row flip") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q64_table_fingerprint")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def fp28(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 7), 16)
    }
    val docs = graft.Tables(spark, sfDir, "documents").collect()
    def canon(r: org.apache.spark.sql.Row): String =
      s"${r.getAs[Long]("doc_id")}|${Option(r.getAs[String]("text")).getOrElse("<null>")}|" +
        s"${r.getAs[String]("lang")}|${r.getAs[String]("source")}|${r.getAs[Long]("n_chars")}"
    val sums = docs.map(r => fp28(canon(r)))
    assert(got("documents") == ((docs.length.toLong, sums.sum)),
      "documents fingerprint diverges from the driver rebuild")
    // sensitivity: flipping ONE row's text must change the checksum
    val flipped = sums.sum - fp28(canon(docs.head)) +
      fp28(canon(docs.head) + "x")
    assert(flipped != sums.sum, "fingerprint blind to a row edit")
  }

  test("t30 bucket loads match a driver md5 rebuild and collisions are real") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("t30_feature_hashing")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def fp28(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 7), 16)
    }
    val texts = graft.Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    texts.foreach { case (id, t) =>
      val w = t.trim.split("\\s+")
      val grams = (0 to w.length - 2).map(i => s"${w(i)} ${w(i + 1)}").distinct
      val loads = grams.map(g => fp28(g) % 1024L).groupBy(identity)
        .map(_._2.size.toLong)
      val expect =
        if (grams.isEmpty) (0L, 0L, 0L, 0L)
        else (grams.size.toLong, loads.size.toLong,
          grams.size.toLong - loads.size, loads.max)
      assert(got(id) == expect, s"doc $id feature-hash accounting")
    }
    // the hashing trick's cost is real on this corpus: some doc pays a
    // slot collision (≈ birthday at ~99 grams into 1024 buckets)
    assert(got.values.map(_._3).sum > 0, "no collisions — bucket fn suspect")
  }

  test("e6 manifest agrees with the operators it summarizes") {
    import spark.implicits._
    val m = graft.SparkEntry.queries("e6_release_manifest")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // checksum line == q64's documents fingerprint (a consumer verifies
    // their copy against exactly this value)
    val q64 = graft.SparkEntry.queries("q64_table_fingerprint")(spark, sfDir)
      .collect().find(_.getString(0) == "documents").get
    assert(m("checksum") == q64.getLong(2).toString, "manifest checksum drifts from q64")
    assert(m("n_docs") == q64.getLong(1).toString)
    // distinct-text accounting == d1's dedup output cardinality
    val d1 = graft.SparkEntry.queries("d1_exact_dedup")(spark, sfDir).count()
    assert(m("n_distinct_texts").toLong == d1,
      s"manifest distinct ${m("n_distinct_texts")} vs d1 $d1")
    // totals recompute
    val docs = graft.Tables(spark, sfDir, "documents").collect()
    val toks = docs.flatMap(r => Option(r.getAs[String]("text")))
      .map(_.trim.split("\\s+").length.toLong).sum
    assert(m("total_tokens").toLong == toks)
    assert(m("n_langs").toLong ==
      docs.map(_.getAs[String]("lang")).distinct.length.toLong)
    assert(m.keySet.size == 9)
  }

  test("e7 diff classes are all non-empty and partition both releases exactly") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("e7_release_diff")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("added", "removed", "modified", "unchanged"),
      s"a diff class went empty: ${rows.keySet}")
    // the four classes partition the KEY UNION of the two releases —
    // recomputed from the residue arithmetic that derives them
    val ids = graft.Tables(spark, sfDir, "documents")
      .select($"doc_id").as[Long].collect()
    val v1 = ids.filter(_ % 13 != 3).toSet
    val v2 = ids.filter(_ % 11 != 7).toSet
    assert(rows("added") == (v2 -- v1).size.toLong)
    assert(rows("removed") == (v1 -- v2).size.toLong)
    val both = (v1 intersect v2)
    // modified = revised docs present in both releases WITH text (a
    // NULL-text doc revises to itself — fp unchanged)
    val texts = graft.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val modified = both.count(id => id % 9 == 4 && texts(id).nonEmpty).toLong
    assert(rows("modified") == modified)
    assert(rows("unchanged") == both.size - modified)
  }

  test("m7 segments agree with a driver-side recompute of the PCM islands") {
    val got = graft.SparkEntry.queries("m7_audio_segments")(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(got.nonEmpty)
    // non-degenerate: segmentation must actually split (some clip has
    // >1 segment) and some clip must carry silence (voiced < n)
    assert(got.exists(_._2._1 > 1), "no clip segmented into >1 run")
    got.foreach { case (id, (nSeg, nVoiced, longest)) =>
      val n = ((id % 3) + 1).toInt * 100
      val voiced = (0 until n).map(i =>
        math.abs(((id * 31 + i * 7) % 2003) - 1001) >= 500)
      val runs = voiced.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) if acc.nonEmpty && acc.head == 0 => acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      assert(nSeg == runs.length.toLong, s"doc $id segment count")
      assert(nVoiced == voiced.count(identity).toLong, s"doc $id voiced total")
      assert(longest == (if (runs.isEmpty) 0L else runs.max.toLong), s"doc $id longest")
    }
  }
}
