package graft.streaming

import graft.SparkTestBase
import graft.operators.{Lakehouse, Mixing}

/** Pins st22's exactly-once contract: every data commit carries the
  * writer's txn action (appId, batchId), the crash replay of the last
  * delivery (same rows, same batchId — Spark's documented foreachBatch
  * re-execution shape) is SKIPPED by the check-first idempotence gate,
  * the commit log is version-identical across the replay, and the net
  * state answers exactly like a direct standing∪delta scan. Value-level
  * lost/duplicated rows are pinned by st22's base-table oracle. */
class IdempotentIngestStreamSpec extends SparkTestBase {

  private val dir = sfDir

  test("replayed last batch is skipped via the txn high-water; log unchanged; state matches a direct scan") {
    import spark.implicits._

    val result = StreamQueries.occIngestIdempotent(spark, dir)
      .collect().map(_.toString).toSeq

    assert(StreamQueries.lastIdemSkips == 1,
      "exactly the one injected replay should have been skipped")
    assert(StreamQueries.lastIdemCommits >= 2,
      "the live run should have landed at least two data commits")

    val run = new java.io.File(StreamQueries.lastIdemRunDir)
    val commitsDir = new java.io.File(run, "commits")
    val versions = Lakehouse.occVersions(commitsDir)
    assert(versions == versions.indices.toSeq,
      s"commit log not contiguous: $versions")
    assert(versions.size == 1 + StreamQueries.lastIdemCommits,
      s"log should be bootstrap + data commits only, got $versions")

    // every data commit carries the writer's txn stamp, batchIds are
    // strictly increasing, and the high-water lookup sees the max
    val stamps = versions.drop(1).map { v =>
      val r = spark.read.parquet(
          Lakehouse.occCommitFile(commitsDir, v).getAbsolutePath)
        .select($"app", $"txn").distinct()
        .as[(String, Long)].collect()
      assert(r.length == 1, s"commit v$v should carry one txn stamp")
      r.head
    }
    assert(stamps.forall(_._1 == "st22_ingest"),
      s"unexpected txn appIds: ${stamps.map(_._1).distinct}")
    val ids = stamps.map(_._2)
    assert(ids == ids.sorted && ids.distinct == ids,
      s"batch ids should be strictly increasing: $ids")
    assert(Lakehouse.occLastTxn(spark, run, "st22_ingest") == ids.max,
      "txn high-water lookup disagrees with the log")

    // a batchId at (or below) the high-water would be skipped; the
    // NEXT id would not — the gate is a comparison, not a freeze
    assert(Lakehouse.occLastTxn(spark, run, "st22_ingest") >= ids.max)
    assert(Lakehouse.occLastTxn(spark, run, "some-other-writer") == -1L)

    // parity with a direct standing ∪ streamed-delta scan
    val (pLo, pHi, sLo, sHi) = Mixing.e9Box(dir)
    val standing = new java.io.File(
      new java.io.File(Lakehouse.zincManifestRoot(spark, dir)), "standing")
    val direct = Mixing.flagAgg(
      spark.read.parquet(standing.getAbsolutePath,
          new java.io.File(run, "delta").getAbsolutePath)
        .filter($"l_partkey".between(pLo, pHi) &&
          $"l_suppkey".between(sLo, sHi)))
      .collect().map(_.toString).toSeq
    assert(result == direct,
      "idempotent-ingest net state diverged from the direct scan")
  }
}
