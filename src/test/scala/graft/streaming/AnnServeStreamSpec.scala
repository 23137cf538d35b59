package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Pins st16's contract: ANN serving as a stream over the STANDING
  * s12 IVF index.
  *
  *  1. stream ≡ batch: the finalized foreachBatch sink equals the
  *     one-shot batch probe of the same query slice, row for row —
  *     micro-batch slicing cannot perturb per-query top-k (queries
  *     share no state), which is also why the DuckDB oracle (a batch
  *     replay) covers the streaming path.
  *  2. the serve is genuinely incremental: the run processes the inbox
  *     in MULTIPLE micro-batches (each appending its own probe
  *     results), not one degenerate batch.
  *  3. the index is a standing artifact: serving leaves the index
  *     directory byte-untouched (no rewrite, no append — s13 owns
  *     appends).
  *
  * Per-batch postings pruning is pinned at IvfIndexSpec on the SHARED
  * serving core (Similarity.ivfProbeIndex) — st16 calls that exact
  * function per micro-batch. */
class AnnServeStreamSpec extends SparkTestBase {

  import spark.implicits._

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))

  test("st16 stream serve ≡ batch probe; multi-batch; index untouched") {
    val root = new java.io.File(Similarity.ivfIndex(spark, sfDir))
    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).map(f => f.getAbsolutePath -> (f.length(), f.lastModified()))
        .toMap
    }
    val before = snapshot()

    val streamed = StreamQueries.annServeCatchUp(spark, sfDir)
      .collect().map(key).toSeq

    // 1. parity with the one-shot batch probe of the same slice
    val queries = Tables(spark, sfDir, "embeddings")
      .filter($"vec_id" % 5 === 2)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val batch = Similarity
      .ivfProbeIndex(queries, root.getAbsolutePath, nProbe = 2, k = 5)
      .orderBy($"query_id", $"rank")
      .collect().map(key).toSeq
    assert(streamed == batch,
      s"stream diverged from batch probe: ${streamed.diff(batch).take(5)} " +
        s"vs ${batch.diff(streamed).take(5)}")
    val nQueries = queries.count()
    assert(streamed.map(_._1).distinct.size == nQueries &&
      streamed.size == nQueries * 5,
      s"expected $nQueries queries x top-5, got ${streamed.size} rows")

    // 2. the inbox really arrived in multiple data batches
    val dataBatches = StreamQueries.lastRunProgress
      .count(_.numInputRows > 0)
    assert(dataBatches >= 2,
      s"expected >= 2 data micro-batches, got $dataBatches")

    // 3. serving never mutated the standing index
    assert(snapshot() == before, "serving modified the standing index")
  }
}
