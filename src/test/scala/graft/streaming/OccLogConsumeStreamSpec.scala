package graft.streaming

import graft.SparkTestBase
import graft.operators.{Lakehouse, Mixing}

/** Pins st20's physical contract: the consumer bootstraps from the
  * CHECKPOINT (its partials exist before the stream starts), takes one
  * micro-batch per post-checkpoint commit — never replaying versions
  * the checkpoint covers — records exactly the staged rewrites' four
  * victims as tombstones, never writes the log or table it reads, and
  * its tombstone-reconciled merge equals the batch net-state scan
  * (e20's read). Exactly-once ACROSS the snapshot boundary — including
  * the retraction of checkpoint-era files by tail removes — is pinned
  * by value through st20's DuckDB base-table oracle. */
class OccLogConsumeStreamSpec extends SparkTestBase {

  private val dir = sfDir

  test("bootstrap from checkpoint + one batch per tail commit; tombstones retract the rewrites' victims; merge equals the batch net-state scan") {
    import spark.implicits._
    val root = new java.io.File(Lakehouse.occRoot(spark, dir))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val before = walk(root)
      .map(f => f.getAbsolutePath -> ((f.length(), f.lastModified()))).toMap

    val result = StreamQueries.occLogConsume(spark, dir)
      .collect().map(_.toString).toSeq

    // one micro-batch per post-checkpoint commit (the staged log tails
    // v3..v6 past the v2 checkpoint) — the stream never replays the log
    val commitsDir = new java.io.File(root, "commits")
    val cpV = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(root, "_last_checkpoint").toPath)).trim.toInt
    val tail = Lakehouse.occVersions(commitsDir).count(_ > cpV)
    assert(tail == 4, s"staged log should tail 4 commits, found $tail")
    val dataBatches = StreamQueries.lastRunProgress
      .count(p => p.numInputRows > 0)
    assert(dataBatches == tail,
      s"expected one micro-batch per tail commit: $dataBatches for $tail")

    val after = walk(root)
      .map(f => f.getAbsolutePath -> ((f.length(), f.lastModified()))).toMap
    assert(after == before, "the consumer modified the table it reads")

    // the tombstone set is exactly the raced compactions' victim files
    val run = new java.io.File(StreamQueries.lastOccConsumeRunDir)
    val tombs = spark.read.parquet(
      new java.io.File(run, "tombstones").getAbsolutePath)
      .select($"file").as[String].collect().toSet
    val victims = spark.read.parquet(commitsDir.getAbsolutePath)
      .filter($"action" === "remove")
      .select($"file").as[String].collect().toSet
    assert(tombs == victims && victims.size == 4,
      s"tombstones $tombs should equal the 4 staged victims $victims")

    // merged partials ≡ the batch net-state scan (e20's plan) — the
    // partial keying really joined _metadata spelling to the manifest's
    val (pLo, pHi, sLo, sHi) = Mixing.e9Box(dir)
    val files = Lakehouse.occVisible(
      spark.read.parquet(commitsDir.getAbsolutePath))
      .filter($"pmax" >= pLo && $"pmin" <= pHi &&
        $"smax" >= sLo && $"smin" <= sHi)
      .select($"file").as[String].collect().toSeq.sorted
    val oneShot = Mixing.flagAgg(
      spark.read.parquet(files: _*)
        .filter($"l_partkey".between(pLo, pHi) &&
          $"l_suppkey".between(sLo, sHi)))
      .collect().map(_.toString).toSeq
    assert(result == oneShot,
      "streamed merge diverged from the batch net-state scan")
  }
}
