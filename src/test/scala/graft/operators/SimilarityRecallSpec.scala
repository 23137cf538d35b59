package graft.operators

import graft.SparkTestBase

/** The recall/correctness check Similarity's scaladoc promises for s2.
  *
  * Note on this corpus: the fixture embeddings are isotropic-random (no
  * cluster structure — measured top-5 same-label fraction ≈ 0.08, intra-
  * label mean cosine ≈ 0), which is the worst case for ANY coarse
  * quantizer: expected recall with nProbe of C cells is ≈ nProbe/C plus
  * the own-cell bonus. So the strong pin here is EXACTNESS of the
  * probe-restricted search against an independent driver-side
  * reimplementation; the recall floor is calibrated to the corpus, and
  * probing all cells must reproduce brute force exactly.
  */
class SimilarityRecallSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  private def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.select("query_id", "rank", "cand_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

  test("s2 exactly equals exact search restricted to the probed cells") {
    // Independent reimplementation on the driver: per-label mean centroids,
    // L2-nearest nProbe cells (ties by label), exact cosine rerank inside,
    // cosine rounded to 6dp with cand_id tiebreak — the same contract s2
    // declares, computed a completely different way.
    val rows = graft.Tables(spark, dir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val nProbe = 2; val k = 5

    val centroids = rows.groupBy(_._2).view.mapValues { members =>
      val dim = members.head._3.length
      val c = new Array[Double](dim)
      members.foreach(m => (0 until dim).foreach(i => c(i) += m._3(i)))
      (0 until dim).foreach(i => c(i) /= members.size)
      c
    }.toMap

    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    val expected = rows.filter(_._1 < 10).map { case (qid, _, qv) =>
      val probed = centroids.toSeq
        .map { case (cell, c) => (l2(qv, c), cell) }
        .sortBy(identity).take(nProbe).map(_._2).toSet
      val cands = rows.filter(r => probed.contains(r._2) && r._1 != qid)
        .map(r => (cosine(qv, r._3), r._1))
        .sortBy { case (cos, id) => (-cos, id) }
        .take(k).map(_._2).toSeq
      qid -> cands
    }.toMap

    val got = topk(Similarity.ivfTopK(spark, dir, nQueries = 10, nProbe = nProbe, k = k))
    assert(got == expected)
  }

  test("s2 recall@5 vs exact s1 clears the corpus-calibrated floor") {
    val exact = topk(Similarity.specs.find(_.name == "s1_cosine_topk").get.fn(spark, dir))
    val ivf = topk(Similarity.ivfTopK(spark, dir, nQueries = 10, nProbe = 2, k = 5))
    assert(exact.size == 10 && ivf.size == 10)
    val recalls = exact.map { case (q, truth) =>
      ivf.getOrElse(q, Seq.empty).toSet.intersect(truth.toSet).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // measured 0.32 on this structure-free corpus with nProbe 2/10 — the
    // floor catches regressions (e.g. probing the wrong cells → ~0.1)
    // without asserting structure the data doesn't have.
    assert(mean >= 0.2, s"mean recall@5 = $mean (per-query: $recalls)")
  }

  test("s5 PQ codes map each codebook anchor to itself") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // an anchor's distance to its own subvector is exactly 0 in every
    // subspace, so its code must be its own id (ties impossible on this
    // duplicate-free corpus) — the cheapest end-to-end pin that encode's
    // argmin and slicing are wired right
    val codes = Similarity
      .pqSubDistances(spark, dir, nAnchors = 16, nSub = 8, subDim = 8)
      .groupBy($"vec_id", $"j")
      .agg(min(struct($"d", $"m")).getField("m").as("code"))
      .filter($"vec_id" < 16)
      .collect()
    assert(codes.length == 16 * 8)
    codes.foreach { r =>
      assert(r.getAs[Long]("code") == r.getAs[Long]("vec_id"),
        s"anchor ${r.getAs[Long]("vec_id")} subspace ${r.get(1)} " +
          s"coded to ${r.getAs[Long]("code")}")
    }
  }

  test("s5 PQ+refine recall@5 vs exact s1 clears the corpus floor") {
    val exact = topk(Similarity.specs.find(_.name == "s1_cosine_topk").get.fn(spark, dir))
    val pq = topk(Similarity.pqTopK(spark, dir))
    assert(exact.size == 10 && pq.size == 10)
    val recalls = exact.map { case (q, truth) =>
      pq.getOrElse(q, Seq.empty).toSet.intersect(truth.toSet).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.15, s"mean recall@5 = $mean (per-query: $recalls)")
  }

  test("s4 exactly equals exact search restricted to sign-LSH bucket mates") {
    // Independent driver-side reimplementation of the s4 contract:
    // anchors = first 6 vectors, bit_p = [dot(v, anchor_p) >= 0] with the
    // dot folded LEFT in index order (the engine contract that keeps the
    // sign deterministic), bucket = sum of 2^p, candidates = same-bucket,
    // exact cosine rerank with 6dp round and cand_id tiebreak.
    val rows = graft.Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dotLeftFold(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = dotLeftFold(a, b)
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val anchors = rows.filter(_._1 < 6).sortBy(_._1).map(_._2)
    val bucketOf = rows.map { case (id, v) =>
      id -> anchors.zipWithIndex.map { case (a, p) =>
        if (dotLeftFold(v, a) >= 0) 1L << p else 0L
      }.sum
    }.toMap
    val expected = rows.filter(_._1 < 10).map { case (qid, qv) =>
      val cands = rows
        .filter(r => r._1 != qid && bucketOf(r._1) == bucketOf(qid))
        .map(r => (cosine(qv, r._2), r._1))
        .sortBy { case (cos, id) => (-cos, id) }
        .take(5).map(_._2).toSeq
      qid -> cands
    }.toMap
    val got = topk(Similarity.lshTopK(spark, dir, nPlanes = 6, nQueries = 10, k = 5))
    assert(got == expected)
  }

  test("raising nProbe to the full cell count makes IVF exact (sanity)") {
    val cells = graft.Tables(spark, dir, "embeddings")
      .select("label").distinct().count().toInt
    val exact = topk(Similarity.specs.find(_.name == "s1_cosine_topk").get.fn(spark, dir))
    val full = topk(Similarity.ivfTopK(spark, dir, nQueries = 10, nProbe = cells, k = 5))
    assert(full == exact) // probing every cell IS brute force
  }

  test("s7 matryoshka recall@5 vs exact s1 clears the corpus floor") {
    val exact = topk(Similarity.specs.find(_.name == "s1_cosine_topk").get.fn(spark, dir))
    val mrl = topk(Similarity.matryoshkaTopK(spark, dir))
    assert(exact.size == 10 && mrl.size == 10)
    val recalls = exact.map { case (q, truth) =>
      mrl.getOrElse(q, Seq.empty).toSet.intersect(truth.toSet).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // structure-free corpus: an 8-of-64-dim prefix carries 1/8 of the
    // (iid) signal, so the 50-of-500 cut retains a modest but clearly
    // non-random share of the true top-5 (random 50-cut would land
    // recall ≈ 0.1); the floor catches wiring regressions (wrong slice,
    // wrong cut side) without asserting structure the data doesn't have
    assert(mean >= 0.15, s"mean recall@5 = $mean (per-query: $recalls)")
  }

  test("widening the s7 cut to the corpus makes it exact (sanity)") {
    val exact = topk(Similarity.specs.find(_.name == "s1_cosine_topk").get.fn(spark, dir))
    val n = graft.Tables(spark, dir, "embeddings").count().toInt
    val full = topk(Similarity.matryoshkaTopK(spark, dir, cut = n))
    assert(full == exact) // a corpus-wide cut IS brute force
  }

  test("s15 binary-quant recall@5 vs exact s1 clears the corpus floor") {
    val exact = topk(Similarity.specs.find(_.name == "s1_cosine_topk").get.fn(spark, dir))
    val bq = topk(Similarity.binaryQuantTopK(spark, dir))
    assert(exact.size == 10 && bq.size == 10)
    val recalls = exact.map { case (q, truth) =>
      bq.getOrElse(q, Seq.empty).toSet.intersect(truth.toSet).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // sign bits keep ~all angular information a 64-dim isotropic corpus
    // has (measured 0.68 on this fixture vs ≈0.1 for a random 50-cut);
    // the floor sits below the deterministic measurement but far above
    // chance, catching packing/popcount/cut-side regressions
    assert(mean >= 0.5, s"mean recall@5 = $mean (per-query: $recalls)")
  }

  test("widening the s15 cut to the corpus makes it exact (sanity)") {
    val exact = topk(Similarity.specs.find(_.name == "s1_cosine_topk").get.fn(spark, dir))
    val n = graft.Tables(spark, dir, "embeddings").count().toInt
    val full = topk(Similarity.binaryQuantTopK(spark, dir, cut = n))
    assert(full == exact) // a corpus-wide Hamming cut IS brute force
  }

  test("s8 knn-join equals a driver-side block-and-rerank reimplementation") {
    // independent rebuild of the whole contract: anchor-dot sign buckets,
    // (label, bucket) blocking, exact cosine rerank, 6-dp round with
    // cand_id tiebreak, top-3 — computed with plain Scala collections
    val rows = graft.Tables(spark, dir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val anchors = rows.filter(_._1 < 6).sortBy(_._1).map(_._3)
    def bucket(v: Array[Double]): Long =
      anchors.zipWithIndex.map { case (a, p) =>
        if (v.zip(a).map { case (x, y) => x * y }.sum >= 0) 1L << p else 0L
      }.sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val blocks = rows.groupBy(v => (v._2, bucket(v._3)))
    val expect = blocks.values.toSeq.flatMap { mates =>
      mates.toSeq.flatMap { case (q, _, qv) =>
        mates.filter(_._1 != q)
          .map { case (c, _, cv) => (q, c, cos(qv, cv)) }
          .sortBy { case (_, c, s) => (-s, c) }
          .take(3).zipWithIndex
          .map { case ((_, c, s), i) => (q, i + 1, c, s) }
      }
    }.toSet
    val got = Similarity.knnJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expect, "bulk knn-join disagrees with the driver rebuild")
  }

  test("s8 neighbours are symmetric-blocked: at most k, never self") {
    val rows = Similarity.knnJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length <= 3, s"query $q has ${rs.length} neighbours")
      assert(rs.map(_._2).sorted.sameElements(1 to rs.length),
        s"query $q ranks not contiguous")
      assert(rs.forall(_._3 != q), s"query $q retrieved itself")
    }
  }

  test("s11 equals a driver-side Lloyd run and the training really moves") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("s11_kmeans_train")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3)))
      .toMap
    val grid = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
      .map { case (id, e) =>
        id -> e.map(x => math.floor(x.toDouble * 1000000.0).toLong)
      }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cent: Map[Long, Array[Long]] =
      grid.take(8).zipWithIndex.map { case ((_, g), i) => i.toLong -> g }.toMap
    var assigned = Map.empty[Long, Long]
    def wcss(a: Map[Long, Long], c: Map[Long, Array[Long]]): BigInt =
      a.iterator.map { case (v, cid) =>
        BigInt(d2(grid.find(_._1 == v).get._2, c(cid))) }.sum
    var lastWcss: Option[BigInt] = None
    (1 to 2).foreach { _ =>
      assigned = grid.map { case (id, g) =>
        id -> cent.toSeq.map { case (cid, cg) => (d2(g, cg), cid) }.min._2
      }.toMap
      // Lloyd monotonicity: each new assignment can only improve the
      // objective measured against the centroids it assigned to
      val w = wcss(assigned, cent)
      lastWcss.foreach(prev => assert(w <= prev,
        s"assignment step raised WCSS: $prev -> $w"))
      cent = assigned.groupBy(_._2).map { case (cid, ms) =>
        val gs = ms.keys.map(v => grid.find(_._1 == v).get._2).toSeq
        cid -> Array.tabulate(gs.head.length)(d =>
          math.floor(gs.map(_(d)).sum.toDouble / gs.size).toLong)
      }
      lastWcss = Some(wcss(assigned, cent))
    }
    val expect = cent.map { case (cid, cg) =>
      val n = assigned.count(_._2 == cid).toLong
      val fp = {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(cg.mkString(",").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }
      cid -> (n, fp, cg.sum)
    }
    assert(got == expect, {
      val diff = got.keySet ++ expect.keySet
      s"clusters disagree: ${diff.filter(k => got.get(k) != expect.get(k)).take(3)}"
    })
    // the trainer is not a no-op: centroids moved off their seeds and
    // more than one cluster captured members
    val seeds = grid.take(8).map(_._2)
    assert(cent.exists { case (cid, cg) =>
      !seeds(cid.toInt).sameElements(cg) }, "no centroid moved")
    assert(got.count(_._2._1 > 0L) > 1, "training collapsed to one cluster")
  }

  test("e5's index accounts for every vector exactly once, cells from s11") {
    val e5 = graft.SparkEntry.queries("e5_index_build")(spark, dir).collect()
    val s11 = graft.SparkEntry.queries("s11_kmeans_train")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val nVecs = graft.Tables(spark, dir, "embeddings").count()
    assert(e5.map(_.getAs[Long]("n_vecs")).sum == nVecs,
      "posting lists lose or double-count vectors")
    assert(e5.map(_.getLong(0)).toSet.subsetOf(s11),
      "e5 assigned to a cell s11 never trained")
    e5.foreach { r =>
      assert(r.getAs[Long]("total_dist") >= 0L)
      assert(r.getAs[Long]("n_saturated") >= r.getAs[Long]("n_vecs"),
        // every vector saturates at least its own max|x| coordinate
        s"cell ${r.getLong(0)}: fewer saturated coords than vectors")
      assert(r.getAs[Double]("avg_scale") > 0.0)
    }
  }
}
