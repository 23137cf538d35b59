package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins d28's incremental-cluster-maintenance contract (round 13 — the
  * d25/s13 standing-artifact move applied to connected components):
  *
  *  1. the maintained labeling (standing labels + batch-sized contracted
  *     CC) is ROW-IDENTICAL to an independent full recompute of banded
  *     CC over corpus∪batch at the index's anchors — the associativity
  *     argument (min-label union-find survives contraction) checked on
  *     real data, Spark-side, on top of the DuckDB oracle's replay;
  *
  *  2. the run is a READER of the standing artifacts: neither the label
  *     table nor the signature index is rewritten by a probe run
  *     (file-level pin), and restaging is marker-idempotent;
  *
  *  3. merges only ever LOWER a label (new label = min over the merged
  *     component), and every relabeled standing doc moved to a label
  *     that is itself a live cluster id in the final output — the
  *     resolution map never invents ids.
  */
class IncrementalClustersSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Independent full recompute: banded edges over ALL vectors at the
    * corpus-rank anchors (the index's band space), exact-cosine verify,
    * CC — the object d28 must equal without ever computing it. */
  private def fullRecompute(shape: (Int, Int) = (10, 3)): Seq[(Long, Long)] = {
    val (nBands, r) = shape // default = D25Shape, restated independently
    val emb = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
    val corpus = emb.filter($"vec_id" % 5 =!= 0)
    val w = org.apache.spark.sql.expressions.Window.orderBy($"vec_id")
    val anchors = corpus.orderBy($"vec_id").limit(nBands * r)
      .select((row_number().over(w) - 1).as("plane"), $"embedding".as("av"))
    val sig = Dedup.bandSignaturesOn(emb, anchors, r)
    val cand = sig.select($"band", $"sg", $"vec_id".as("a_id"))
      .join(sig.select($"band", $"sg", $"vec_id".as("b_id")), Seq("band", "sg"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id").distinct()
    val edges = cand
      .join(emb.select($"vec_id".as("a_id"), $"embedding".as("av")), "a_id")
      .join(emb.select($"vec_id".as("b_id"), $"embedding".as("bv")), "b_id")
      .withColumn("cosine",
        round(graft.functions.GraftFunctions.cosineSim($"av", $"bv"), 6))
      .filter($"cosine" >= 0.4)
      .select($"a_id", $"b_id")
    Dedup.connectedComponents(spark, edges)._1
      .collect().map(rw => (rw.getLong(0), rw.getLong(1))).toSeq.sorted
  }

  test("d28 maintained labels ≡ independent full banded recompute") {
    val inc = Dedup.incrementalClusters(spark, dir)
      .collect().map(rw => (rw.getLong(0), rw.getLong(1))).toSeq.sorted
    val full = fullRecompute()
    assert(inc == full,
      s"incremental diverged: only-inc=${inc.diff(full).take(5)} " +
        s"only-full=${full.diff(inc).take(5)}")
    // non-vacuous: the batch actually interacts with the standing corpus
    // (at least one batch doc landed in a cluster labeled by another doc)
    assert(inc.nonEmpty, "no clustered docs at all")
    assert(inc.exists { case (id, lab) => id % 5 == 0 && lab != id },
      "premise: no batch doc joined any cluster — the merge path is untested")
  }

  test("d28 maintenance is shape-generic: maintained ≡ recomputed at a second index shape") {
    // the shape is a STAGING-time parameter of the standing index (at
    // 100 TB it comes from autoShape, not the pinned (10, 3)); the
    // maintenance step itself must be shape-blind. (8, 2) differs from
    // the pinned shape in BOTH bands and rows-per-band, and stages
    // under its own semidx_b8r2_ root, so the pinned artifacts are
    // untouched by this test.
    val alt = (8, 2)
    val inc = Dedup.incrementalClustersAt(spark, dir, alt)
      .collect().map(rw => (rw.getLong(0), rw.getLong(1))).toSeq.sorted
    val full = fullRecompute(alt)
    assert(inc == full,
      s"alt-shape incremental diverged: only-inc=${inc.diff(full).take(5)} " +
        s"only-full=${full.diff(inc).take(5)}")
    assert(inc.nonEmpty)
    // a genuinely different operating point, not a re-pin of the default
    assert(inc != Dedup.incrementalClusters(spark, dir)
      .collect().map(rw => (rw.getLong(0), rw.getLong(1))).toSeq.sorted ||
      fullRecompute() != full,
      "premise: (8, 2) landed on the identical label set as (10, 3) — " +
        "pick a shape that actually changes the edge set at this fixture")
  }

  test("d28 probe run reads, never rewrites, the standing artifacts") {
    import scala.jdk.CollectionConverters._
    val indexRoot = Dedup.semanticIndex(spark, dir)
    val labelsPath = Dedup.corpusLabels(spark, dir, indexRoot)
    def artifactMeta: Map[String, (Long, Long)] = {
      val st = java.nio.file.Files.walk(new java.io.File(indexRoot).toPath)
      try st.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.startsWith("part-"))
        .map(p => p.toString -> (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toMap
      finally st.close()
    }
    val before = artifactMeta
    assert(before.nonEmpty, "staging premise")
    val standing = spark.read.parquet(labelsPath)
      .collect().map(rw => rw.getLong(0) -> rw.getLong(1)).toMap
    val out = Dedup.incrementalClusters(spark, dir)
      .collect().map(rw => rw.getLong(0) -> rw.getLong(1)).toMap
    assert(artifactMeta == before,
      "the maintenance run rewrote a standing artifact file")
    // a second staging call is marker-idempotent
    Dedup.corpusLabels(spark, dir, indexRoot)
    assert(artifactMeta == before, "restaging rewrote the label table")
    // every standing doc survives into the output; merges only lower a
    // label, and the target label is a live cluster id in the output
    val outClusters = out.values.toSet
    standing.foreach { case (id, old) =>
      val now = out.getOrElse(id, fail(s"standing doc $id vanished"))
      assert(now <= old, s"doc $id label ROSE $old -> $now")
      assert(outClusters.contains(now), s"doc $id got a dead label $now")
    }
    // untouched standing clusters keep their labels verbatim: if no
    // member of a cluster changed, the label is literally the old one
    val changedClusters = standing.collect {
      case (id, old) if out(id) != old => old
    }.toSet
    standing.foreach { case (id, old) =>
      if (!changedClusters.contains(old))
        assert(out(id) == old, s"untouched cluster $old relabeled at $id")
    }
  }
}
