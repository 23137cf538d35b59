package graft.plans

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom whole-operator plan (GroupTopKPlan → GroupTopKExec) must
  * produce exactly the window form's `row_number <= k` row set under a
  * total sort order — on the real fixture, on planted edges (group
  * smaller than k, duplicate sort values resolved by the tiebreaker,
  * null group keys), and regardless of input partitioning. q41 carries
  * the DuckDB oracle; this suite pins the semantics the oracle can't
  * reach (nulls, partitioning invariance, the extension hook).
  */
class GroupTopKSpec extends SparkTestBase {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    df.withColumn("rn", row_number().over(w)).filter($"rn" <= k).drop("rn")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"g", $"v".desc, $"id").collect().toSeq

  test("matches the window form on the orders fixture") {
    val orders = Tables(spark, sfDir, "orders")
      .select($"o_custkey".as("g"), $"o_orderkey".as("id"),
        $"o_totalprice".as("v"))
    val got = sortedRows(GroupTopK.topK(orders, Seq("g"),
      Seq("v" -> false, "id" -> true), 3))
    val want = sortedRows(windowForm(orders, 3))
    assert(got == want)
  }

  test("groups smaller than k keep every row; ties break on the tiebreaker") {
    // g=1 has 2 rows (< k=3); g=2 has 4 rows with one duplicated v, so
    // the kept set depends on the id tiebreaker: v=10 twice (ids 1,2)
    // and v=9,8 — top-3 by (v desc, id asc) = ids 1,2 then v=9
    val df = Seq(
      (1L, 1L, 5.0), (1L, 2L, 4.0),
      (2L, 1L, 10.0), (2L, 2L, 10.0), (2L, 3L, 9.0), (2L, 4L, 8.0)
    ).toDF("g", "id", "v")
    val got = sortedRows(GroupTopK.topK(df, Seq("g"),
      Seq("v" -> false, "id" -> true), 3))
    val want = sortedRows(windowForm(df, 3))
    assert(got == want)
    assert(got.count(_.getLong(0) == 1L) == 2, "undersized group truncated")
    assert(!got.exists(r => r.getLong(0) == 2L && r.getDouble(2) == 8.0),
      "worst row of the full group must be evicted")
  }

  test("null group keys form one group, like a window partition") {
    val df = Seq[(java.lang.Long, Long, Double)](
      (null, 1L, 3.0), (null, 2L, 2.0), (null, 3L, 1.0),
      (1L, 4L, 9.0)
    ).toDF("g", "id", "v")
    val got = GroupTopK.topK(df, Seq("g"), Seq("v" -> false, "id" -> true), 2)
      .collect()
    assert(got.count(_.isNullAt(0)) == 2,
      "null keys must share one group and truncate to k together")
    assert(got.count(!_.isNullAt(0)) == 1)
  }

  test("result set is invariant to input partitioning") {
    val df = Tables(spark, sfDir, "orders")
      .select($"o_custkey".as("g"), $"o_orderkey".as("id"),
        $"o_totalprice".as("v"))
    val one = sortedRows(GroupTopK.topK(df.coalesce(1), Seq("g"),
      Seq("v" -> false, "id" -> true), 2))
    val many = sortedRows(GroupTopK.topK(df.repartition(7, $"id"), Seq("g"),
      Seq("v" -> false, "id" -> true), 2))
    assert(one == many)
  }

  test("ascending order keeps the smallest rows") {
    val df = Seq((1L, 1L, 3.0), (1L, 2L, 1.0), (1L, 3L, 2.0)).toDF("g", "id", "v")
    val got = GroupTopK.topK(df, Seq("g"), Seq("v" -> true, "id" -> true), 2)
      .select($"v").collect().map(_.getDouble(0)).sorted.toSeq
    assert(got == Seq(1.0, 2.0))
  }

  test("GraftExtensions injects the planner strategy") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val strategies = org.apache.spark.sql.graft.Bridge.plannerStrategies(ext, spark)
    assert(strategies.exists(_.isInstanceOf[GroupTopKStrategy]),
      "extension hook must register GroupTopKStrategy")
  }
}
