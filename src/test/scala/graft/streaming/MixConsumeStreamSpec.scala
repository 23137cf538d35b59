package graft.streaming

import graft.SparkTestBase
import graft.operators.{Lakehouse, Mixing}
import org.apache.spark.sql.functions._

/** Pins st26's mixed-flavor consumption: one trigger per commit, the
  * total retraction equals the OVERLAP-NETTED union of both masks (a
  * naive sum-of-masks fold double-retracts the rows hit by both), and
  * the streamed merge equals the one-shot unified scan
  * ([[Lakehouse.occScanAll]]). */
class MixConsumeStreamSpec extends SparkTestBase {

  private val dir = sfDir

  test("one trigger per commit; retraction equals the netted union of both masks; stream equals the unified scan") {
    import spark.implicits._

    val result = StreamQueries.occMixConsume(spark, dir)
      .collect().map(_.toString).toSeq

    val root = new java.io.File(Lakehouse.occMixRoot(spark, dir))
    val nCommits = Lakehouse.occVersions(new java.io.File(root, "commits")).size
    val batches = StreamQueries.lastRunProgress
      .filter(_.numInputRows > 0)
    assert(batches.length == nCommits,
      s"expected $nCommits data triggers, saw ${batches.length}")

    // total retraction = |dv-masked| + |key-matched standing rows NOT
    // already dv-masked| — the union, each overlap row counted once
    assert(StreamQueries.lastMixConsumeNegatives > 0)
    val log = Lakehouse.occLogWithVersions(spark, root)
    val standing = log
      .filter($"action" === "add" && $"version" === 0)
      .select($"file").as[String].collect().toSeq.sorted
    val dvMasked = spark.read.parquet(
      new java.io.File(root, "dv_v1").getAbsolutePath).count()
    val keyOnly = spark.read.parquet(standing: _*)
      .filter($"l_suppkey" % 13 === 5 && $"l_orderkey" % 97 =!= 0)
      .count()
    // the hazard must be EXERCISED: rows hit by BOTH masks exist (5 at
    // sf0.001, 362 at sf0.1), so a sum-of-masks fold WOULD over-retract
    val overlap = spark.read.parquet(standing: _*)
      .filter($"l_suppkey" % 13 === 5 && $"l_orderkey" % 97 === 0)
      .count()
    assert(overlap > 0, "fixture lost the both-masks overlap — the " +
      "double-retraction hazard is no longer exercised")
    val run = new java.io.File(StreamQueries.lastMixConsumeRunDir)
    val negSum = spark.read.parquet(
        new java.io.File(run, "partials").getAbsolutePath)
      .filter($"n_rows" < 0)
      .agg(sum(-$"n_rows")).head().getLong(0)
    assert(negSum == dvMasked + keyOnly,
      s"retracted $negSum rows; netted union = $dvMasked dv + $keyOnly " +
        "key-only — a mismatch means the overlap was double-retracted " +
        "or a mask was missed")

    // parity with the one-shot unified scan
    val direct = Mixing.flagAgg(
      Lakehouse.occScanAll(spark, root, Seq("l_suppkey")))
      .collect().map(_.toString).toSeq
    assert(result == direct,
      "streamed mixed-flavor retraction diverged from the unified scan")
  }

  test("overlapping equality deletes in the mixed fold retract a shared key once") {
    import spark.implicits._
    // synthetic mixed log: a dv mask on row 3 PLUS two eqdel commits
    // overlapping on key 1 — the unified scan intersects the flavor
    // masks and distinct()s the eqdel key union; the streamed fold must
    // net the second delete's already-retracted keys (ADVICE r15)
    val root = java.nio.file.Files.createTempDirectory("mixoverlap_").toFile
    root.deleteOnExit()
    val a = new java.io.File(root, "a").getAbsolutePath
    Seq((1L, "A", 1.0, 10.0), (2L, "A", 2.0, 20.0), (3L, "A", 3.0, 30.0),
        (4L, "A", 4.0, 40.0))
      .toDF("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      .coalesce(1).write.parquet(a)
    Lakehouse.occCommit(spark, root,
      Seq((a, 4L, 0L, 0L, 0L, 0L)), snapshotVersion = -1)
    val dv = new java.io.File(root, "dv1")
    spark.read.parquet(a)
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.row_index").as("pos"), $"l_orderkey")
      .filter($"l_orderkey" === 3L).select($"file", $"pos")
      .coalesce(1).write.parquet(dv.getAbsolutePath)
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 0,
      dvs = Seq((a, dv.getAbsolutePath)))             // masks row 3
    def eqdel(name: String, keys: Seq[Long]): String = {
      val d = new java.io.File(root, name)
      keys.toDF("l_orderkey").coalesce(1).write.parquet(d.getAbsolutePath)
      d.getAbsolutePath
    }
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 1,
      eqDeletes = Seq(eqdel("d1", Seq(1L))))          // masks key 1
    Lakehouse.occCommit(spark, root, Nil, snapshotVersion = 2,
      eqDeletes = Seq(eqdel("d2", Seq(1L, 2L))))      // overlaps on 1
    val streamed = StreamQueries.occMixConsume(spark, dir, Some(root))
      .collect().map(_.toString).toSeq
    val direct = Mixing.flagAgg(
      Lakehouse.occScanAll(spark, root, Seq("l_orderkey")))
      .collect().map(_.toString).toSeq
    assert(streamed == direct,
      s"overlapping eqdels double-retracted: $streamed vs $direct")
    // exactly 3 distinct rows retracted (keys 1, 2 and the dv'd row 3)
    val negSum = spark.read.parquet(new java.io.File(
        new java.io.File(StreamQueries.lastMixConsumeRunDir), "partials")
      .getAbsolutePath)
      .filter($"n_rows" < 0).agg(sum(-$"n_rows")).head().getLong(0)
    assert(negSum == 3, s"retracted $negSum rows, netted union holds 3")
  }
}
