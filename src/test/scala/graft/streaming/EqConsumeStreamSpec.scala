package graft.streaming

import graft.SparkTestBase
import graft.operators.{Lakehouse, Mixing}
import org.apache.spark.sql.functions._

/** Pins st24's equality-delete consumption: the consumer takes one
  * trigger per commit, the eqdel commit produces NEGATIVE partials that
  * name ONLY below-sequence files (the re-insert, committed above the
  * delete, is never retracted), retraction cost is key-match-sized
  * (never a rescan of folded files), and the streamed merge equals the
  * one-shot sequence-scoped scan ([[Lakehouse.occScanEq]]) and (by value,
  * at scale) st24's base-table oracle. */
class EqConsumeStreamSpec extends SparkTestBase {

  private val dir = sfDir

  test("one trigger per commit; eqdel retraction is below-sequence only and key-match-sized; stream equals the one-shot eq scan") {
    import spark.implicits._

    val result = StreamQueries.occEqConsume(spark, dir)
      .collect().map(_.toString).toSeq

    // one micro-batch per commit file
    val root = new java.io.File(Lakehouse.occEqRoot(spark, dir))
    val log = Lakehouse.occLogWithVersions(spark, root)
    val nCommits = Lakehouse.occVersions(new java.io.File(root, "commits")).size
    val batches = StreamQueries.lastRunProgress
      .filter(_.numInputRows > 0)
    assert(batches.length == nCommits,
      s"expected $nCommits data triggers, saw ${batches.length}")

    // negative partials exist and name ONLY below-sequence (v0) files —
    // a negative keyed to a post-delete (v2) file would mean the
    // re-insert was retracted
    assert(StreamQueries.lastEqConsumeNegatives > 0)
    val run = new java.io.File(StreamQueries.lastEqConsumeRunDir)
    val partials = spark.read.parquet(
      new java.io.File(run, "partials").getAbsolutePath)
    val belowFiles = log
      .filter($"action" === "add" && $"version" < 1)
      .select(regexp_replace($"file", "^file:/+", "/").as("file"))
      .as[String].collect().toSet
    val negFiles = partials.filter($"n_rows" < 0)
      .select($"file").distinct().as[String].collect().toSet
    assert(negFiles.nonEmpty && negFiles.subsetOf(belowFiles),
      s"retraction partials name non-below-sequence files: " +
        s"${(negFiles -- belowFiles).take(3)}")

    // retraction equals the standing slice's key-matching rows exactly:
    // the cost is the masked rows, never a rescan of everything folded
    val keyMatch = spark.read.parquet(belowFiles.toSeq.sorted: _*)
      .filter($"l_suppkey" % 13 === 5).count()
    val negSum = partials.filter($"n_rows" < 0)
      .agg(sum(-$"n_rows")).head().getLong(0)
    assert(negSum == keyMatch,
      s"retracted $negSum rows, standing key-matching rows = $keyMatch")

    // parity with the one-shot sequence-scoped scan over the same log
    val direct = Mixing.flagAgg(
      Lakehouse.occScanEq(spark, root, Seq("l_suppkey")))
      .collect().map(_.toString).toSeq
    assert(result == direct,
      "streamed eqdel retraction diverged from the one-shot eq scan")
  }

  test("st25: checkpoint bootstrap streams only the tail, retracts the pending delete at bootstrap, and equals the full replay") {
    import spark.implicits._
    val full = StreamQueries.occEqConsume(spark, dir)
      .collect().map(_.toString).toSeq
    val boot = StreamQueries.occEqBootstrapConsume(spark, dir)
      .collect().map(_.toString).toSeq
    assert(boot == full,
      "checkpoint-bootstrapped consumption diverged from full replay")
    // only the post-checkpoint commit streamed (cp sits at v1, head v2)
    assert(StreamQueries.lastEqBootTriggers == 1,
      s"expected 1 tail trigger, saw ${StreamQueries.lastEqBootTriggers}")
    // the pending delete retracted at bootstrap: negatives exist and
    // name only snapshot (below-sequence) files
    assert(StreamQueries.lastEqBootNegatives > 0)
    val root = new java.io.File(Lakehouse.occEqRoot(spark, dir))
    val belowFiles = Lakehouse.occLogWithVersions(spark, root)
      .filter($"action" === "add" && $"version" < 1)
      .select(regexp_replace($"file", "^file:/+", "/").as("file"))
      .as[String].collect().toSet
    val negFiles = spark.read.parquet(new java.io.File(
        new java.io.File(StreamQueries.lastEqBootRunDir), "partials")
      .getAbsolutePath)
      .filter($"n_rows" < 0)
      .select($"file").distinct().as[String].collect().toSet
    assert(negFiles.nonEmpty && negFiles.subsetOf(belowFiles),
      s"bootstrap retraction named non-snapshot files: ${(negFiles -- belowFiles).take(3)}")
  }
}
