package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** p9's layout contract: the lang-partitioned staging write produces a
  * directory-per-language layout, and the pruned read's physical plan
  * proves the pruning — `PartitionFilters` carries the lang predicate
  * (so only 1 of 5 language directories is opened) and `ReadSchema`
  * excludes the text column the aggregate never touches. The DuckDB
  * oracle already pins the VALUES; this pins the SCAN SHAPE, which is
  * the entire point of the operator at 100 TB. */
class PartitionedLayoutSpec extends SparkTestBase {

  import spark.implicits._

  test("staged layout is one directory per language with a marker") {
    val path = Mixing.partitionedCorpus(spark, sfDir)
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("lang=de", "lang=en", "lang=es", "lang=fr", "lang=zh")),
      s"unexpected layout: ${dirs.mkString(", ")}")
    assert(new java.io.File(path + ".staged").isFile, "fingerprint marker missing")
  }

  test("p9's plan prunes partitions at the scan and drops unused columns") {
    val plan = graft.SparkEntry.queries("p9_partition_pruned_read")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(plan).isDefined,
      s"lang predicate did not reach PartitionFilters:\n${plan.take(800)}")
    val readSchema = "ReadSchema: ([^\\n]+)".r
      .findAllMatchIn(plan).map(_.group(1)).mkString(" ")
    assert(!readSchema.contains("text"),
      s"p9 reads the text column it never uses: $readSchema")
  }

  test("partitioned read equals the unpartitioned aggregate for every language") {
    val path = Mixing.partitionedCorpus(spark, sfDir)
    val part = spark.read.parquet(path)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val flat = graft.Tables(spark, sfDir, "documents")
      .groupBy($"lang", $"source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(part == flat, "layout changed the data")
  }
}
