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
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
