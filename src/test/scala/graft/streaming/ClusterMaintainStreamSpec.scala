package graft.streaming

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Pins st17's contract: cluster maintenance as a stream over the
  * standing d25/d28 artifacts.
  *
  *  1. stream ≡ one-shot: the finalized label table equals d28's
  *     single-step maintenance row for row — min-label union-find is
  *     independent of edge arrival order (the associativity that also
  *     lets the batch-replay DuckDB oracle cover the streaming path);
  *  2. the run is genuinely incremental (≥2 data micro-batches), and
  *     TRIGGER-SLICING INVARIANT: re-running at 1 file per trigger
  *     (4 data batches) lands on identical labels;
  *  3. the standing artifacts (signature index, label table) are read,
  *     never written, by the stream;
  *  4. non-vacuity: at least one final cluster contains batch docs
  *     from DIFFERENT inbox files — the cross-micro-batch merge path
  *     (batch₂ doc linking through a batch₁ doc's accumulated
  *     signatures) is actually exercised at this fixture.
  */
class ClusterMaintainStreamSpec extends SparkTestBase {

  import spark.implicits._

  private def labelRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("st17 stream ≡ d28 one-shot; multi-batch; slicing-invariant; artifacts untouched") {
    val indexRoot = new java.io.File(Dedup.semanticIndex(spark, sfDir))
    Dedup.corpusLabels(spark, sfDir, indexRoot.getAbsolutePath)
    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(indexRoot).map(f =>
        f.getAbsolutePath -> (f.length(), f.lastModified())).toMap
    }
    val before = snapshot()

    val streamed = labelRows(StreamQueries.clusterMaintainCatchUp(spark, sfDir))
    val dataBatches = StreamQueries.lastRunProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 2,
      s"expected >= 2 data micro-batches, got $dataBatches")

    val oneShot = labelRows(Dedup.incrementalClusters(spark, sfDir))
    assert(streamed == oneShot,
      s"stream diverged from one-shot: ${streamed.diff(oneShot).take(5)} " +
        s"vs ${oneShot.diff(streamed).take(5)}")
    assert(streamed.nonEmpty)

    assert(snapshot() == before,
      "the stream modified a standing artifact")

    // trigger-slicing invariance: one file per trigger → 4 data batches,
    // identical finalized labels
    val knob = "graft.stream.filesPerTrigger"
    val prev = sys.props.get(knob)
    sys.props(knob) = "1"
    try {
      val fine = labelRows(StreamQueries.clusterMaintainCatchUp(spark, sfDir))
      assert(StreamQueries.lastRunProgress.count(_.numInputRows > 0) >= 4,
        "1-file-per-trigger run did not split into 4 data batches")
      assert(fine == streamed, "labels depend on micro-batch slicing")
    } finally prev match {
      case Some(v) => sys.props(knob) = v
      case None    => sys.props.remove(knob); ()
    }

    // cross-micro-batch merging actually happened: a final cluster spans
    // batch docs from different inbox files (the ranged 4-file staging
    // puts them in different micro-batches at 1 file/trigger)
    val fileOf = spark.read
      .parquet(StreamQueries.stagedBatchVectorInbox(spark, sfDir))
      .select($"vec_id", input_file_name().as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val crossFile = streamed.filter(_._1 % 5 == 0).groupBy(_._2).exists {
      case (_, members) => members.map(m => fileOf(m._1)).distinct.size >= 2
    }
    assert(crossFile,
      "premise: no cluster spans batch docs from different inbox files — " +
        "the cross-micro-batch merge path went unexercised")
  }
}
