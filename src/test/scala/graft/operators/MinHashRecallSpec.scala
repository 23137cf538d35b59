package graft.operators

import graft.SparkTestBase

/** The recall check MinHashDedup's scaladoc promises: d4's banded LSH
  * candidates must contain every exact high-Jaccard pair that d2's
  * inverted-index join finds. With 8 seeded hash tables, a pair at
  * jaccard 0.5 collides in ≥1 band with p = 1-(1-0.5)^8 ≈ 0.996, and
  * approxSimilarityJoin reranks candidates with the exact set distance —
  * so recall on true ≥0.5 pairs should be total on this corpus.
  */
class MinHashRecallSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01" // 500 docs: dup clusters exist

  test("d4 LSH candidates contain every exact d2 pair with jaccard >= 0.5") {
    val d2 = Dedup.specs.find(_.name == "d2_ngram_jaccard_pairs").get
      .fn(spark, dir)
    val exactHigh = d2.filter("jaccard >= 0.5")
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exactHigh.nonEmpty, "corpus must contain high-jaccard pairs (non-vacuous)")

    val d4 = MinHashDedup.minhashPairs(spark, dir, threshold = 0.5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val missed = exactHigh -- d4
    assert(missed.isEmpty,
      s"LSH missed ${missed.size}/${exactHigh.size} exact pairs: ${missed.take(5)}")
  }

  test("d4 estimated distances agree with d2 exact jaccard on shared pairs") {
    val d2 = Dedup.specs.find(_.name == "d2_ngram_jaccard_pairs").get
      .fn(spark, dir)
      .select("a_id", "b_id", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val d4 = MinHashDedup.minhashPairs(spark, dir, threshold = 0.5)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))

    // approxSimilarityJoin's jaccard_dist is the exact distance on the
    // hashed shingle sets: 1 - dist must match d2's jaccard closely
    // (not exactly: d2 caps hot-shingle df and hashing can collide).
    val shared = d4.flatMap { case (pair, dist) => d2.get(pair).map(j => (j, 1.0 - dist)) }
    assert(shared.nonEmpty)
    shared.foreach { case (exact, estimated) =>
      assert(math.abs(exact - estimated) < 0.05, s"exact=$exact est=$estimated")
    }
  }
}
