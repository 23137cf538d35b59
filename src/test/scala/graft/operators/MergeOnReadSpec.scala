package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pins e18's merge-on-read physics: the standing layout is
  * byte-identical across the MERGE apply (updates/inserts never rewrite
  * or reshuffle the fact side), the DV holds exactly the matched old
  * versions, the append holds exactly the batch, and the masked read
  * equals the relational MERGE computed from scratch. */
class MergeOnReadSpec extends SparkTestBase {

  private val dir = sfDir

  test("standing bytes untouched; DV = matched versions; append = batch; masked read = relational merge") {
    import spark.implicits._
    val root = new java.io.File(Lakehouse.mergeRoot(spark, dir))
    val standingDir = new java.io.File(root, "standing")

    def sig(d: java.io.File): Map[String, (Long, Long)] =
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    val before = sig(standingDir)

    val table = Tables(spark, dir, "lineitem")
    val updKeys = table.filter($"l_orderkey" % 7 === 3)
      .select($"l_orderkey", $"l_linenumber").distinct()
    val nMatched = table
      .join(broadcast(updKeys), Seq("l_orderkey", "l_linenumber"),
        "left_semi").count()
    val nInserts = table.filter($"l_orderkey" % 97 === 0)
      .select($"l_orderkey", $"l_linenumber").distinct().count()

    val dv = spark.read.parquet(new java.io.File(root, "dv").getAbsolutePath)
    assert(dv.columns.sorted.toSeq == Seq("file", "pos"),
      "the DV must be pure position — no data columns")
    assert(dv.count() == nMatched,
      s"DV should mask exactly the matched versions ($nMatched), got ${dv.count()}")
    // every DV position points into a STANDING file, never the append
    val dvFiles = dv.select("file").distinct().as[String].collect()
    assert(dvFiles.forall(_.contains("/standing/")), dvFiles.take(3).mkString(","))

    val append = spark.read.parquet(
      new java.io.File(root, "append").getAbsolutePath)
    assert(append.count() == updKeys.count() + nInserts,
      "append must carry one row image per batch key (updates + inserts)")

    // the masked read replayed against a from-scratch relational MERGE
    val masked = spark.read.parquet(standingDir.getAbsolutePath,
      new java.io.File(root, "append").getAbsolutePath)
      .withColumn("file", col("_metadata.file_path"))
      .withColumn("pos", col("_metadata.row_index"))
      .join(broadcast(dv), Seq("file", "pos"), "left_anti")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,4)")).as("q"))
      .orderBy($"l_returnflag")
      .collect().map(_.toString).toSeq
    // replay the MIN-folded one-image-per-key batch semantics
    def images(df: org.apache.spark.sql.DataFrame, bump: Double) =
      df.groupBy($"l_orderkey", $"l_linenumber")
        .agg(min($"l_returnflag").as("l_returnflag"),
          (min($"l_quantity") + bump).as("l_quantity"))
        .select($"l_returnflag", $"l_quantity")
    val relational = table
      .join(broadcast(updKeys), Seq("l_orderkey", "l_linenumber"),
        "left_anti")
      .select($"l_returnflag", $"l_quantity")
      .unionByName(images(table.filter($"l_orderkey" % 7 === 3), 50))
      .unionByName(images(table.filter($"l_orderkey" % 97 === 0), 0))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,4)")).as("q"))
      .orderBy($"l_returnflag")
      .collect().map(_.toString).toSeq
    assert(masked == relational,
      "merge-on-read state diverged from the relational MERGE")

    assert(sig(standingDir) == before,
      "the MERGE apply modified a standing file")
    // staging idempotence: a second call is a marker no-op
    assert(Lakehouse.mergeRoot(spark, dir) == root.getAbsolutePath)
    assert(sig(standingDir) == before)
  }

  test("the e18 plan broadcasts the DV and never shuffles the fact side for the mask") {
    val prevEager = spark.conf.getOption("graft.eagerRelease")
    spark.conf.set("graft.eagerRelease", "false")
    try {
      val df = Mixing.specs.find(_.name == "e18_merge_on_read").get
        .fn(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") &&
        plan.contains("LeftAnti"), plan.take(800))
    } finally prevEager match {
      case Some(v) => spark.conf.set("graft.eagerRelease", v)
      case None    => spark.conf.unset("graft.eagerRelease")
    }
  }
}
