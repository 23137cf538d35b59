package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins e14's merge-on-read DELETE contract: the sidecar is PURE
  * position (no data columns), staging it rewrites no layout byte, the
  * mask plans as a broadcast anti-join (the fact side never shuffles for
  * the delete), and applying the positions reproduces the logical
  * predicate row-for-row. Value semantics are pinned by e14's DuckDB
  * oracle (the predicate applied relationally over the base table). */
class DeletionVectorSpec extends SparkTestBase {

  private val dir = sfDir

  test("the sidecar is positional only and staging touches no layout byte") {
    val lay = new java.io.File(Mixing.zorderedLineitem(spark, dir))
    val before = lay.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    val dv = spark.read.parquet(Lakehouse.deletionVector(spark, dir))
    assert(dv.columns.toSet == Set("file", "pos"),
      s"DV must carry pure position, got ${dv.columns.mkString(",")}")
    assert(dv.count() > 0, "fixture predicate deleted nothing — degenerate")
    val after = lay.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    assert(after == before, "DV staging modified the data layout")
    // every referenced file is a live layout file, every pos in range
    val layFiles = lay.listFiles().map(_.getAbsolutePath).toSet
    val badFile = dv.select("file").distinct().collect().map(_.getString(0))
      .filterNot(f => layFiles.contains(f.stripPrefix("file://").stripPrefix("file:")))
    assert(badFile.isEmpty, s"DV references unknown files: ${badFile.take(3).mkString(",")}")
  }

  test("positional masking reproduces the logical delete through a broadcast anti-join") {
    import spark.implicits._
    val lay = Mixing.zorderedLineitem(spark, dir)
    val dv = spark.read.parquet(Lakehouse.deletionVector(spark, dir))
    val masked = spark.read.parquet(lay)
      .withColumn("file", col("_metadata.file_path"))
      .withColumn("pos", col("_metadata.row_index"))
      .join(broadcast(dv), Seq("file", "pos"), "left_anti")
    val plan = masked.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"mask should plan as broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "the delete mask forced a fact-side shuffle")
    // position ≡ predicate: the masked scan is exactly the logical
    // survivor set (counts here; the value hash is e14's oracle row)
    val logical = spark.read.parquet(lay)
      .filter($"l_orderkey" % 97 =!= 0)
    assert(masked.count() == logical.count(),
      "positional mask and logical predicate disagree on survivors")
    val total = spark.read.parquet(lay).count()
    assert(masked.count() + dv.count() == total,
      "deleted + surviving != total — positions misattributed or duplicated")
  }
}
