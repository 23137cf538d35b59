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

  test("overlapping dv sidecars on one file retract a shared row once, not once per DELETE") {
    import spark.implicits._
    // synthetic log: one in-box file, two DELETE commits whose masks
    // OVERLAP on one row — the batch scan anti-joins the sidecar
    // union (row dropped once); the streamed fold must net the second
    // commit's already-retracted position or it over-retracts
    val (pLo, _, sLo, _) = Mixing.e9Box(dir)
    val root = java.nio.file.Files.createTempDirectory("dvoverlap_").toFile
    root.deleteOnExit()
    val a = new java.io.File(root, "a").getAbsolutePath
    Seq((1L, pLo, sLo, "A", 1.0, 10.0), (2L, pLo, sLo, "A", 2.0, 20.0),
        (3L, pLo, sLo, "A", 3.0, 30.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
        "l_quantity", "l_extendedprice")
      .coalesce(1).write.parquet(a)
    Lakehouse.occCommit(spark, root,
      Seq((a, 3L, pLo, pLo, sLo, sLo)), snapshotVersion = -1)
    def sidecar(name: String, keys: Seq[Long]): String = {
      val d = new java.io.File(root, name)
      spark.read.parquet(a)
        .select(col("_metadata.file_path").as("file"),
          col("_metadata.row_index").as("pos"), $"l_orderkey")
        .filter($"l_orderkey".isin(keys: _*))
        .select($"file", $"pos")
        .coalesce(1).write.parquet(d.getAbsolutePath)
      d.getAbsolutePath
    }
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      dvs = Seq((a, sidecar("dv1", Seq(1L)))))           // masks row 1
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 1,
      dvs = Seq((a, sidecar("dv2", Seq(1L, 2L)))))       // overlaps on 1
    val streamed = StreamQueries.occDvConsume(spark, dir, Some(root))
      .collect().map(_.toString).toSeq
    val direct = Mixing.flagAgg(Lakehouse.occScanVisible(spark, root))
      .collect().map(_.toString).toSeq
    assert(streamed == direct,
      s"overlapping masks double-retracted: $streamed vs $direct")
    // exactly 2 distinct rows retracted (1 and 2), never 3
    val negSum = spark.read.parquet(new java.io.File(
        new java.io.File(StreamQueries.lastDvConsumeRunDir), "partials")
      .getAbsolutePath)
      .filter($"n_rows" < 0).agg(sum(-$"n_rows")).head().getLong(0)
    assert(negSum == 2, s"retracted $negSum rows, union holds 2")
  }
}
