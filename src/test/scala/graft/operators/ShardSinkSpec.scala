package graft.operators

import graft.SparkTestBase

/** Proves the sharded sink's layout contract: p3's packed shards write as
  * one directory per shard with bounded per-file row counts, and the
  * round-trip preserves every row with the shard re-derivable from the
  * path — the parquet layout a training data loader consumes. */
class ShardSinkSpec extends SparkTestBase {

  test("writePackedShards: per-shard directories, bounded files, exact round-trip") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val packed = graft.SparkEntry.queries("p3_shard_packing")(spark, sfDir)

    Mixing.writePackedShards(packed, "shard", out, maxRecordsPerFile = 5)

    // layout: one directory per shard label
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard="))
    val expectedShards = packed.select($"shard").distinct().as[String].collect()
    assert(dirs.map(_.stripPrefix("shard=")).toSet == expectedShards.toSet)

    // bounded files: no parquet part exceeds the per-file row cap
    val back = spark.read.parquet(out)
    val perFile = back
      .select(org.apache.spark.sql.functions.input_file_name().as("f"))
      .groupBy($"f").count().as[(String, Long)].collect()
    assert(perFile.nonEmpty)
    assert(perFile.forall(_._2 <= 5), s"oversized file: ${perFile.maxBy(_._2)}")

    // exact round-trip (shard column restored from the partition path)
    val a = packed.orderBy($"doc_id").collect().map(_.toSeq.toVector).toVector
    val b = back.select(packed.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
      .orderBy($"doc_id").collect().map(_.toSeq.toVector).toVector
    assert(a == b)
  }
}
