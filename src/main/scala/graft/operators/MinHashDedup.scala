package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection via Spark ML (banded MinHash:
  * shingle → hashed term vector → minhash signatures → band-bucket join).
  *
  * Scale design: `approxSimilarityJoin` shuffles on (band, bucket-hash) —
  * candidate generation is O(n·bands), never the O(n²) cross join. Seeded,
  * so the output is deterministic; verified rows-only by the driver (no
  * ANSI-SQL oracle can express MinHash) and recall-checked against the
  * exact d2 Jaccard pairs in MinHashRecallSpec.
  */
object MinHashDedup {

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "d4_minhash_lsh_pairs",
      (s, dir) => minhashPairs(s, dir, threshold = 0.5),
      None))

  /** Candidate near-dup pairs with estimated Jaccard distance ≤ threshold.
    * Features are word-3-gram shingles (same shingling as d2): on this
    * corpus unigram token sets are near-identical across documents, so
    * shingles are what make Jaccard discriminative. */
  def minhashPairs(s: SparkSession, dir: String, threshold: Double): DataFrame = {
    import s.implicits._
    // <3-token docs shingle to null (guard needed under ANSI mode, where
    // sequence(0, size-3) would index w[-1]) and are filtered out.
    val docs = Tables(s, dir, "documents")
      .withColumn("w", split(trim($"text"), "\\s+"))
      .withColumn("toks", when(size($"w") >= 3, array_distinct(expr(
        "transform(sequence(0, size(w) - 3), " +
          "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))))
      .filter(size($"toks") > 0)

    val tf = new HashingTF()
      .setInputCol("toks").setOutputCol("features").setNumFeatures(1 << 18)
    val featured = tf.transform(docs).select($"doc_id", $"features")
      .persist() // feeds fit() AND both approxSimilarityJoin sides

    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(featured)

    model.approxSimilarityJoin(featured, featured, threshold, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("a_id"),
        col("datasetB.doc_id").as("b_id"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"))
      .filter($"a_id" < $"b_id")
      .orderBy($"jaccard_dist", $"a_id", $"b_id")
  }
}
