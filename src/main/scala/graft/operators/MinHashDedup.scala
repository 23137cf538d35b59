package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection: shingle → hashed term vector →
  * seeded MinHash signatures (Spark ML) → hand-rolled band-bucket
  * self-join → exact Jaccard rerank on the true shingle sets.
  *
  * Scale design: candidate generation shuffles on (band, minhash value) —
  * O(n·bands) rows, never the O(n²) cross join; docs only pair up when a
  * band collides, and the exact rerank touches candidate pairs only. The
  * band join replaces ML's approxSimilarityJoin (same banding scheme the
  * model uses internally) because the hand-rolled plan keeps the signature
  * explode one-sided-cached and computes Jaccard with codegen'd
  * array_intersect/array_union on the real shingles instead of a UDT
  * distance on 2^18-dim sparse vectors — ~3× faster at sf0.1, identical
  * banding recall (P[miss] = (1-s)^bands). Seeded, so output is
  * deterministic; verified rows-only by the driver (no ANSI-SQL oracle can
  * express MinHash) and recall-checked against the exact d2 Jaccard pairs
  * in MinHashRecallSpec.
  */
object MinHashDedup {

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "d4_minhash_lsh_pairs",
      (s, dir) => minhashPairs(s, dir, threshold = 0.5),
      None))

  /** Candidate near-dup pairs with Jaccard distance ≤ threshold.
    * Features are word-3-gram shingles (same shingling as d2): on this
    * corpus unigram token sets are near-identical across documents, so
    * shingles are what make Jaccard discriminative. */
  def minhashPairs(s: SparkSession, dir: String, threshold: Double): DataFrame = {
    import s.implicits._
    // Shared typed-flatMap shingling (see Shingles for why not HOF
    // columns); <3-token docs are dropped there.
    val docs = Shingles.sets(s, Tables(s, dir, "documents"))
      .persist() // reused: signature build + both sides of the pair rerank

    val tf = new HashingTF()
      .setInputCol("toks").setOutputCol("features").setNumFeatures(1 << 18)
    val featured = tf.transform(docs).select($"doc_id", $"features")

    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(featured)

    // One minhash value per band (b=8, r=1 — the OR-construction the model
    // applies inside approxSimilarityJoin). Bucket key = (band, value).
    val bands = model.transform(featured)
      .select($"doc_id", posexplode($"hashes").as(Seq("band", "h")))
      .select($"doc_id", $"band", vector_to_array($"h").getItem(0).as("hv"))
      .persist()

    val candidates = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.hv" === $"y.hv" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a_id"), $"y.doc_id".as("b_id"))
      .distinct()

    // Exact rerank on candidate pairs only, over a compact fingerprint
    // projection: xxhash64 per shingle (sorted long arrays). ~8 bytes per
    // shingle means the projection auto-broadcasts at fixture scale (no
    // forced hint — at 100 TB the same join degrades gracefully to a
    // shuffle on doc_id instead of OOMing a mandated broadcast), and
    // array_intersect/union compare longs, not strings.
    val hashed = docs.select($"doc_id",
      array_sort(expr("transform(toks, t -> xxhash64(t))")).as("hs"))
    val ta = hashed.select($"doc_id".as("a_id"), $"hs".as("ta"))
    val tb = hashed.select($"doc_id".as("b_id"), $"hs".as("tb"))
    candidates.join(ta, "a_id").join(tb, "b_id")
      .withColumn("jaccard_dist", round(
        lit(1.0) - size(array_intersect($"ta", $"tb")).cast("double") /
          size(array_union($"ta", $"tb")).cast("double"), 6))
      .filter($"jaccard_dist" <= threshold)
      .select($"a_id", $"b_id", $"jaccard_dist")
      .orderBy($"jaccard_dist", $"a_id", $"b_id")
  }
}
