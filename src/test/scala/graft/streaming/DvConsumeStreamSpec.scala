package graft.streaming

import graft.SparkTestBase
import graft.operators.{Lakehouse, Mixing}
import org.apache.spark.sql.functions._

/** Pins st23's row-level retraction: the consumer takes one trigger
  * per commit, the dv commit produces NEGATIVE partials sized by the
  * mask (never a table rescan), and the streamed merge equals both the
  * one-shot masked scan and (by value, at scale) st23's base-table
  * oracle. */
class DvConsumeStreamSpec extends SparkTestBase {

  private val dir = sfDir

  test("one trigger per commit; dv retraction is mask-sized; stream equals the one-shot masked scan") {
    import spark.implicits._

    val result = StreamQueries.occDvConsume(spark, dir)
      .collect().map(_.toString).toSeq

    // one micro-batch per commit file
    val root = new java.io.File(Lakehouse.occDvRoot(spark, dir))
    val nCommits = Lakehouse.occVersions(new java.io.File(root, "commits")).size
    val batches = StreamQueries.lastRunProgress
      .filter(_.numInputRows > 0)
    assert(batches.length == nCommits,
      s"expected $nCommits data triggers, saw ${batches.length}")

    // the retraction partials exist and are bounded by the mask's rows
    // (box-filtered, so <=; grouped per (file, flag), so > 0 groups)
    assert(StreamQueries.lastDvConsumeNegatives > 0)
    val maskRows = spark.read.parquet(
      new java.io.File(root, "dv_v2").getAbsolutePath).count()
    val run = new java.io.File(StreamQueries.lastDvConsumeRunDir)
    val negSum = spark.read.parquet(
        new java.io.File(run, "partials").getAbsolutePath)
      .filter($"n_rows" < 0)
      .agg(sum(-$"n_rows")).head().getLong(0)
    assert(negSum <= maskRows,
      s"retracted $negSum rows but the mask holds only $maskRows")

    // parity with the one-shot masked scan over the same log
    val (pLo, pHi, sLo, sHi) = Mixing.e9Box(dir)
    val direct = Mixing.flagAgg(
      Lakehouse.occScanVisible(spark, root)
        .filter($"l_partkey".between(pLo, pHi) &&
          $"l_suppkey".between(sLo, sHi)))
      .collect().map(_.toString).toSeq
    assert(result == direct,
      "streamed retraction diverged from the one-shot masked scan")
  }
}
