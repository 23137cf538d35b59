package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The opt-in optimizer rule's contract ([[GroupTopKRewrite]]):
  *  - flag ON: the declarative row_number idiom plans as
  *    GroupTopKExec partial→final with NO WindowExec and no full sort
  *    of the input;
  *  - flag OFF (the default): the plan is untouched — WindowExec, no
  *    GroupTopKExec — because the rewrite loses on high-cardinality
  *    tiny groups and must never fire implicitly;
  *  - both plans produce the identical row set;
  *  - a query that still REFERENCES the row-number column is left
  *    alone even with the flag on (the operator cannot produce rn).
  */
class GroupTopKRewriteSpec extends SparkTestBase {

  import spark.implicits._

  private def declarativeTopK(k: Int) = {
    val orders = graft.Tables(spark, sfDir, "orders")
      .select($"o_orderpriority".as("prio"), $"o_orderkey", $"o_totalprice")
    val w = Window.partitionBy($"prio")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k).drop("rn")
  }

  private def withFlag[A](on: Boolean)(body: => A): A = {
    GroupTopK.ensureRewrite(spark)
    val prev = spark.conf.getOption("graft.topk.rewrite")
    spark.conf.set("graft.topk.rewrite", on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set("graft.topk.rewrite", v)
      case None    => spark.conf.unset("graft.topk.rewrite")
    }
  }

  test("flag on: the window idiom plans as GroupTopK partial/final, no WindowExec") {
    withFlag(true) {
      val plan = declarativeTopK(3).queryExecution.executedPlan.toString
      assert(plan.contains("GroupTopK"), s"rewrite did not fire:\n${plan.take(800)}")
      assert(!plan.contains("Window"), s"WindowExec survived the rewrite:\n${plan.take(800)}")
    }
  }

  test("flag off (default): the plan keeps its window form") {
    withFlag(false) {
      val plan = declarativeTopK(3).queryExecution.executedPlan.toString
      assert(plan.contains("Window"), s"window form missing:\n${plan.take(800)}")
      assert(!plan.contains("GroupTopK"), s"rewrite fired while disabled:\n${plan.take(800)}")
    }
  }

  test("rewritten and window plans emit the identical row set") {
    val expected = withFlag(false) {
      declarativeTopK(5).collect().map(_.toSeq).toSet
    }
    val got = withFlag(true) {
      val df = declarativeTopK(5)
      assert(df.queryExecution.executedPlan.toString.contains("GroupTopK"))
      df.collect().map(_.toSeq).toSet
    }
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("a downstream reference to rn blocks the rewrite") {
    withFlag(true) {
      val orders = graft.Tables(spark, sfDir, "orders")
        .select($"o_orderpriority".as("prio"), $"o_orderkey", $"o_totalprice")
      val w = Window.partitionBy($"prio")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      val keepsRn = orders.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"prio", $"rn")
      val plan = keepsRn.queryExecution.executedPlan.toString
      assert(!plan.contains("GroupTopK"),
        s"rewrite fired despite a live rn reference:\n${plan.take(800)}")
      assert(plan.contains("Window"))
    }
  }

  test("randomized tie-heavy frames: rewritten row set equals the window form (seeded)") {
    // heavy ties + a unique tiebreaker: the suite's total-order
    // convention, under which row_number's set is well-defined and the
    // heap must reproduce it exactly — 5 seeded shapes × 3 k values
    val rnd = new scala.util.Random(0x5eed8)
    (1 to 5).foreach { _ =>
      val nGroups = 1 + rnd.nextInt(6)
      val rows = (0 until 200 + rnd.nextInt(300)).map { i =>
        (rnd.nextInt(nGroups).toLong, rnd.nextInt(7).toDouble, i.toLong)
      }
      val df = rows.toDF("g", "v", "id")
      val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
      Seq(1, 3, 7).foreach { k =>
        val build = () => df.withColumn("rn", row_number().over(w))
          .filter($"rn" <= k).drop("rn")
        val expected = withFlag(false) { build().collect().map(_.toSeq).toSet }
        val got = withFlag(true) {
          val d = build()
          assert(d.queryExecution.executedPlan.toString.contains("GroupTopK"))
          d.collect().map(_.toSeq).toSet
        }
        assert(got == expected, s"mismatch at k=$k over $nGroups groups")
      }
    }
  }

  test("rank() is left on its window plan — only row_number rewrites") {
    // rank() <= k can emit MORE than k rows on ties; the operator's
    // bounded heap cannot express that, so the rule must not touch it
    withFlag(true) {
      val orders = graft.Tables(spark, sfDir, "orders")
        .select($"o_orderpriority".as("prio"), $"o_orderkey", $"o_totalprice")
      val w = Window.partitionBy($"prio")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      val df = orders.withColumn("rn", rank().over(w))
        .filter($"rn" <= 3).drop("rn")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("GroupTopK"),
        s"rewrite fired on rank():\n${plan.take(800)}")
      assert(plan.contains("Window"))
    }
  }

  test("rn = 1 (top-1 idiom) rewrites with k = 1") {
    withFlag(true) {
      val orders = graft.Tables(spark, sfDir, "orders")
        .select($"o_orderpriority".as("prio"), $"o_orderkey", $"o_totalprice")
      val w = Window.partitionBy($"prio")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      val df = orders.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1).drop("rn")
      assert(df.queryExecution.executedPlan.toString.contains("GroupTopK"))
      val perGroup = df.groupBy($"prio").count().collect()
      assert(perGroup.nonEmpty && perGroup.forall(_.getLong(1) == 1L))
    }
  }
}
