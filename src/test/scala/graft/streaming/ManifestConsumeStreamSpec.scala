package graft.streaming

import graft.SparkTestBase
import graft.operators.Mixing

/** Pins st19's physical contract: the consumer takes one micro-batch
  * per manifest commit file, never writes the table it reads (root
  * byte-identity), and its merged partials equal the one-shot
  * manifest-planned scan. Exactly-once value semantics are pinned by
  * st19's DuckDB oracle (double-consuming or dropping a commit changes
  * the sums). */
class ManifestConsumeStreamSpec extends SparkTestBase {

  private val dir = sfDir

  test("one micro-batch per commit; merged partials equal the batch scan; table untouched") {
    import spark.implicits._
    val root = new java.io.File(StreamQueries.stagedIngestRoot(spark, dir))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val before = walk(root)
      .map(f => f.getAbsolutePath -> ((f.length(), f.lastModified()))).toMap

    val result = StreamQueries.manifestConsumeCatchUp(spark, dir)
      .collect().map(_.toString).toSeq

    val commits = new java.io.File(root, "manifest").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(commits >= 3,
      s"staged log should carry >=3 commits (bootstrap + 2 batches), found $commits")
    val dataBatches = StreamQueries.lastRunProgress
      .count(p => p.numInputRows > 0)
    assert(dataBatches == commits,
      s"expected one micro-batch per commit file: $dataBatches batches for $commits commits")

    val after = walk(root)
      .map(f => f.getAbsolutePath -> ((f.length(), f.lastModified()))).toMap
    assert(after == before, "the consumer modified the table it reads")

    // merged partials ≡ the one-shot manifest-planned scan over the
    // same assembled table (plan all files from the log, same box)
    val (pLo, pHi, sLo, sHi) = Mixing.e9Box(dir)
    val files = spark.read.parquet(
      new java.io.File(root, "manifest").getAbsolutePath)
      .select($"file").as[String].collect().toSeq.sorted
    val oneShot = spark.read.parquet(files: _*)
      .filter($"l_partkey".between(pLo, pHi) &&
        $"l_suppkey".between(sLo, sHi))
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"),
        org.apache.spark.sql.functions.sum($"l_quantity"
          .cast("decimal(18,4)")).cast("double").as("sum_qty"),
        org.apache.spark.sql.functions.sum($"l_extendedprice"
          .cast("decimal(18,4)")).cast("double").as("sum_price"))
      .orderBy($"l_returnflag")
      .collect().map(_.toString).toSeq
    assert(result == oneShot,
      "incremental consumption diverged from the one-shot scan")
    info(s"$dataBatches batches over $commits commits, ${files.size} table files")
  }
}
