package graft.operators

import graft.SparkTestBase

/** The recall contract d24's scaladoc promises (VERDICT r9 #1): the
  * multi-band sign-LSH edge source must recover the exact d5 pair graph
  * to a MEASURED floor, and everything it does emit must be verifiably
  * correct (candidates are exact-cosine-verified, so banded edges are a
  * strict subset of the exact graph — precision 1.0 by construction,
  * recall is the quantity under test). Floors sit just under the
  * measured values (sf0.001: 94% edges / 96% labels; sf0.01: 98% / 98%)
  * so a regression in the banding layout fails loudly while run-to-run
  * determinism (everything here is seed-free) keeps them exact.
  */
class BandedSemanticDedupSpec extends SparkTestBase {

  private val Threshold = 0.4
  private val Bands = 10
  private val RowsPerBand = 3

  private def edgeSets(dir: String): (Set[(Long, Long)], Set[(Long, Long)]) = {
    val exact = Dedup.cosinePairs(spark, dir, Threshold)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.bandedCosinePairs(spark, dir, Threshold, Bands, RowsPerBand)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (exact, banded)
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    val sf = dir.split("/").last

    test(s"$sf: banded edges are a subset of the exact graph (precision 1.0)") {
      val (exact, banded) = edgeSets(dir)
      assert(exact.nonEmpty, "corpus must contain near-dup pairs (non-vacuous)")
      val phantom = banded -- exact
      assert(phantom.isEmpty,
        s"banding emitted ${phantom.size} pairs the exact verifier rejects: ${phantom.take(5)}")
    }

    test(s"$sf: banded edge recall >= 0.9 vs the exact d5 graph") {
      val (exact, banded) = edgeSets(dir)
      val recall = banded.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.9,
        s"edge recall $recall below floor: ${(exact -- banded).take(5)} missed")
    }

    test(s"$sf: CC cluster labels agree with the exact-edge clustering on >= 95% of labeled vertices") {
      import org.apache.spark.sql.functions.col
      def labelsOf(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        Dedup.connectedComponents(spark, pairs)._1.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exactLab = labelsOf(Dedup.cosinePairs(spark, dir, Threshold)
        .select(col("a_id"), col("b_id")))
      val bandedLab = labelsOf(
        Dedup.bandedCosinePairs(spark, dir, Threshold, Bands, RowsPerBand)
          .select(col("a_id"), col("b_id")))
      // over the vertices the EXACT graph labels (banded singletons fall
      // back to self-labels in the keeper; absent here)
      val agree = exactLab.count { case (v, l) => bandedLab.getOrElse(v, v) == l }
      val frac = agree.toDouble / exactLab.size
      assert(frac >= 0.95, s"cluster-label agreement $frac below floor")
    }
  }

  test("keeper invariants: exactly one keep per cluster, and it is the farthest member") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.SparkEntry.queries("d24_banded_semdedup")(spark, dir).collect()
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      val keeps = rows.filter(_.getBoolean(3))
      assert(keeps.length == 1, s"cluster $cid has ${keeps.length} keepers")
      val maxDist = rows.map(_.getLong(2)).max
      assert(keeps.head.getLong(2) == maxDist,
        s"cluster $cid keeper is not the farthest member")
    }
    // and the roster result covers the whole corpus (singletons included)
    assert(out.length == graft.Tables(spark, dir, "embeddings").count())
  }

  test("auto-sizing derives the roster pin (10 bands x 3 planes) at the driver SF") {
    val (_, bands, r) =
      Dedup.bandedCosinePairsAuto(spark, "/root/testdata/sf0.01", Threshold)
    assert((bands, r) == ((Bands, RowsPerBand)),
      s"auto sizing drifted from the pinned oracle shape: ($bands, $r)")
  }

  test("autoShape: d26's generated-oracle shape, LSH monotonicity, anchor guard") {
    // the pure rule (round 12): d26's oracle is generated for
    // autoShape(500, 0.45) — pin that shape, and the d24 pin beside it
    assert(Dedup.autoShape(500L, 0.45) == ((9, 3)))
    assert(Dedup.autoShape(500L, 0.4) == ((10, 3)))
    // r grows with log n (block occupancy stays ~constant)
    assert(Dedup.autoShape(5000L, 0.4)._2 > 3)
    // at fixed r, a lower threshold (lower p1) needs MORE bands for the
    // same recall floor
    val loose = Dedup.autoShape(500L, 0.3)._1
    val tight = Dedup.autoShape(500L, 0.6)._1
    assert(loose > tight || tight == 8, // 8 is the floor
      s"band count not monotone in threshold: $loose vs $tight")
    // the auto entry point refuses a corpus smaller than its anchor
    // demand instead of silently capping (the sf10 56%-recall lesson):
    // at n=50 (sf0.001) an adversarially loose threshold demands more
    // anchors than the corpus has vectors
    assertThrows[IllegalArgumentException] {
      Dedup.bandedCosinePairsAuto(spark, "/root/testdata/sf0.001", -0.99)
    }
  }
}
