package graft.operators

import graft.{SparkTestBase, Tables}

/** Proves the bucketed co-located join plan: same-bucketed fact tables
  * join with ZERO shuffle exchanges, and results match the plain join.
  */
class BucketingSpec extends SparkTestBase {

  test("same-bucketed tables join without any shuffle exchange") {
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_bucketed", "l_orderkey", 8)
    // capture the pre-test value so the restore can't leak a hardcoded
    // threshold into later suites (the DppBloomSpec conf-leak class)
    val prevThreshold =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      // bucketed plans only apply to sort-merge joins; disable broadcast
      // for the check (at real scale neither side would broadcast anyway)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"), // co-located: no shuffle on either side
        s"unexpected shuffle in bucketed join plan:\n${plan.take(1500)}")

      // parity with the unbucketed join
      val expected = li.join(o, "l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      prevThreshold match {
        case Some(v) =>
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("q68's executed join subtree is exchange-free (the staged pair co-locates)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec        => q +: flatten(q.plan)
      case other                    => other +: other.children.flatMap(flatten)
    }
    // audit the FULL pre-checkpoint plan (PlanAuditSpec's convention)
    val prevEager = spark.conf.getOption("graft.eagerRelease")
    spark.conf.set("graft.eagerRelease", "false")
    try {
      val df = Relational.specs
        .find(_.name == "q68_bucketed_colocated_join").get.fn(spark, sfDir)
      df.queryExecution.executedPlan // resolve inside the conf scope
      val nodes = flatten(df.queryExecution.executedPlan)
      val smj = nodes.collectFirst { case j: SortMergeJoinExec => j }
        .getOrElse(fail("q68 did not plan a sort-merge join"))
      val joinExchanges = flatten(smj).collect {
        case e: ShuffleExchangeLike => e
      }
      assert(joinExchanges.isEmpty,
        s"bucketed join subtree shuffles: ${joinExchanges.map(_.nodeName)}")
      // the groupBy AFTER the join still exchanges — co-location removes
      // the join's shuffles, not the aggregation's
      val allExchanges = nodes.collect { case e: ShuffleExchangeLike => e }
      assert(allExchanges.nonEmpty,
        "expected the post-join groupBy exchange in the full plan")
    } finally prevEager match {
      case Some(v) => spark.conf.set("graft.eagerRelease", v)
      case None    => spark.conf.unset("graft.eagerRelease")
    }
  }
}
