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

  test("overlapping equality deletes retract a shared key once, not once per DELETE") {
    import spark.implicits._
    // synthetic log: one file, two eqdel commits whose KEY SETS overlap
    // on one row — the batch scan anti-joins the distinct()ed key UNION
    // (row dropped once); the streamed fold must net the second
    // delete's already-retracted keys or it over-retracts (ADVICE r15)
    val root = java.nio.file.Files.createTempDirectory("eqoverlap_").toFile
    root.deleteOnExit()
    val a = new java.io.File(root, "a").getAbsolutePath
    Seq((1L, "A", 1.0, 10.0), (2L, "A", 2.0, 20.0), (3L, "A", 3.0, 30.0))
      .toDF("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      .coalesce(1).write.parquet(a)
    Lakehouse.occCommit(spark, root,
      Seq((a, 3L, 0L, 0L, 0L, 0L)), snapshotVersion = -1)
    def eqdel(name: String, keys: Seq[Long]): String = {
      val d = new java.io.File(root, name)
      keys.toDF("l_orderkey").coalesce(1).write.parquet(d.getAbsolutePath)
      d.getAbsolutePath
    }
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      eqDeletes = Seq(eqdel("d1", Seq(1L))))          // masks key 1
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 1,
      eqDeletes = Seq(eqdel("d2", Seq(1L, 2L))))      // overlaps on 1
    val streamed = StreamQueries.occEqConsume(spark, dir, Some(root))
      .collect().map(_.toString).toSeq
    val direct = Mixing.flagAgg(
      Lakehouse.occScanEq(spark, root, Seq("l_orderkey")))
      .collect().map(_.toString).toSeq
    assert(streamed == direct,
      s"overlapping eqdels double-retracted: $streamed vs $direct")
    // exactly 2 distinct rows retracted (keys 1 and 2), never 3
    val negSum = spark.read.parquet(new java.io.File(
        new java.io.File(StreamQueries.lastEqConsumeRunDir), "partials")
      .getAbsolutePath)
      .filter($"n_rows" < 0).agg(sum(-$"n_rows")).head().getLong(0)
    assert(negSum == 2, s"retracted $negSum rows, key union holds 2")
  }
}
