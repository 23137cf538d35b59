package graft.streaming

import graft.SparkTestBase
import graft.operators.{Lakehouse, Mixing}

/** Pins st21's physical contract: the streaming ingest commits through
  * the OCC claim loop while a foreign writer lands mid-stream —
  * contiguous versions with the foreign commit OCCUPYING the contested
  * slot, at least one forced claim retry, the foreign file excluded
  * from the box plan (its rows sit outside the grid), the standing
  * layout untouched, and the streamed net state answering exactly like
  * a direct standing∪delta scan. Lost/duplicated batches under the
  * race are pinned by value through st21's base-table oracle. */
class OccIngestStreamSpec extends SparkTestBase {

  private val dir = sfDir

  test("foreign writer takes the contested slot; the stream retries, loses nothing, and the plan excludes the foreign file") {
    import spark.implicits._
    val standing = new java.io.File(
      new java.io.File(Lakehouse.zincManifestRoot(spark, dir)), "standing")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val before = walk(standing)
      .map(f => f.getAbsolutePath -> ((f.length(), f.lastModified()))).toMap

    val result = StreamQueries.occIngestCatchUp(spark, dir)
      .collect().map(_.toString).toSeq

    assert(StreamQueries.lastOccIngestRetries >= 1,
      "the injected race should force at least one claim retry")
    val run = new java.io.File(StreamQueries.lastOccIngestRunDir)
    val commitsDir = new java.io.File(run, "commits")
    val versions = Lakehouse.occVersions(commitsDir)
    assert(versions == versions.indices.toSeq,
      s"commit log not contiguous: $versions")
    assert(versions.size == 4,
      s"expected bootstrap + foreign + 2 data commits, got $versions")

    // locate the foreign commit and the raced data commit around it
    def filesOf(v: Int): Seq[String] = spark.read.parquet(
        Lakehouse.occCommitFile(commitsDir, v).getAbsolutePath)
      .filter($"action" === "add")
      .select($"file").as[String].collect().toSeq
    val foreignV = versions.filter(v => filesOf(v).exists(_.contains("/foreign/")))
    assert(foreignV.size == 1, s"exactly one foreign commit expected: $foreignV")
    assert(foreignV.head > 0 && foreignV.head < versions.last,
      s"the foreign commit should occupy a mid-log slot, got v${foreignV.head}")

    // the raced data commit landed AFTER the foreign one took its slot
    val dataVs = versions.filter(v => v > 0 && !foreignV.contains(v))
    assert(dataVs.exists(_ > foreignV.head),
      "the losing data commit should have retried past the foreign slot")

    assert(walk(standing).map(f =>
      f.getAbsolutePath -> ((f.length(), f.lastModified()))).toMap == before,
      "the ingest stream modified the standing layout")

    // parity with a direct standing ∪ streamed-delta scan; the foreign
    // file contributes nothing (outside the grid) and never enters the
    // box plan
    val (pLo, pHi, sLo, sHi) = Mixing.e9Box(dir)
    val planned = Lakehouse.occVisible(
        spark.read.parquet(commitsDir.getAbsolutePath))
      .filter($"pmax" >= pLo && $"pmin" <= pHi &&
        $"smax" >= sLo && $"smin" <= sHi)
      .select($"file").as[String].collect().toSeq
    assert(!planned.exists(_.contains("/foreign/")),
      "the out-of-grid foreign file leaked into the box plan")
    val direct = Mixing.flagAgg(
      spark.read.parquet(standing.getAbsolutePath,
          new java.io.File(run, "delta").getAbsolutePath)
        .filter($"l_partkey".between(pLo, pHi) &&
          $"l_suppkey".between(sLo, sHi)))
      .collect().map(_.toString).toSeq
    assert(result == direct,
      "OCC-streamed ingest diverged from the direct scan")
  }
}
