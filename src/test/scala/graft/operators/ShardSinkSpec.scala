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

    // partition PRUNING: a filter on the partition column must reach the
    // scan as a PartitionFilter and cut the file listing to one shard's
    // directory — the property that lets a 100 TB loader read one shard
    // without listing-and-skipping the other thousands
    val oneShard = expectedShards.head
    val pruned = back.filter($"shard" === oneShard)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"),
      s"shard filter did not reach PartitionFilters:\n${plan.take(600)}")
    val scannedFiles = pruned
      .select(org.apache.spark.sql.functions.input_file_name().as("f"))
      .distinct().as[String].collect()
    assert(scannedFiles.nonEmpty &&
      scannedFiles.forall(_.contains(s"shard=$oneShard")),
      s"pruned scan still read other shards: ${scannedFiles.take(3).mkString(",")}")
  }
}
