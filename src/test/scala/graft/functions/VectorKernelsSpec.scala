package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Contracts of the DotProduct / L2SquaredDistance codegen kernels that
  * replaced the HOF chains in the ANN hot paths (s4/s7/s8 bucket and
  * coarse stages, s2/s6/s8 centroid probing): bit-identical to the HOF
  * fold they replaced, inside whole-stage codegen, same null contract
  * as graft_cosine. The oracle re-verification of s2/s4/s6/s7/s8 after
  * the swap is the end-to-end half of this pin.
  */
class VectorKernelsSpec extends SparkTestBase {

  import spark.implicits._

  private def seededVecs(n: Int, dim: Int) = {
    val rng = new scala.util.Random(11L)
    Seq.fill(n)((Array.fill(dim)(rng.nextFloat() * 2 - 1),
      Array.fill(dim)(rng.nextFloat() * 2 - 1))).toDF("a", "b")
  }

  test("graft_dot is bit-identical to the HOF fold on 200 seeded pairs") {
    val hof = expr(
      "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0 as double), (acc, v) -> acc + v)")
    val rows = seededVecs(200, 64)
      .select(GraftFunctions.dot($"a", $"b").as("native"), hof.as("hof"))
      .collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("graft_l2sq is bit-identical to the HOF fold, incl. the mixed-type pairing") {
    val hofFF = expr(
      "aggregate(zip_with(a, b, (x, y) -> (cast(x as double) - cast(y as double)) * " +
        "(cast(x as double) - cast(y as double))), " +
        "cast(0 as double), (acc, v) -> acc + v)")
    val rows = seededVecs(200, 64)
      .select(GraftFunctions.l2sq($"a", $"b").as("native"), hofFF.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // the s2/s8 probe pairing: float query vs double centroid
    val mixed = seededVecs(50, 16)
      .withColumn("bd", expr("transform(b, x -> cast(x as double))"))
    val got = mixed.select(GraftFunctions.l2sq($"a", $"bd").as("native"),
      expr("aggregate(zip_with(a, bd, (x, y) -> (cast(x as double) - y) * " +
        "(cast(x as double) - y)), cast(0 as double), (acc, v) -> acc + v)")
        .as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("both kernels run inside whole-stage codegen") {
    val df = seededVecs(4, 8).repartition(2)
      .select(GraftFunctions.dot($"a", $"b").as("d"),
        GraftFunctions.l2sq($"a", $"b").as("l"))
    assert(df.collect().forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_dot""".r.findFirstIn(plan).isDefined, plan)
    assert(plan.contains("graft_l2sq"), plan)
  }

  test("null contract matches graft_cosine: input, mismatch, element") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (None, Some(Array(1f, 2f))),
      (Some(Array(1f, 2f, 3f)), Some(Array(1f, 2f)))
    ).toDF("a", "b")
    Seq(GraftFunctions.dot($"a", $"b"), GraftFunctions.l2sq($"a", $"b"))
      .foreach { k =>
        val out = df.select(k).collect()
        assert(!out(0).isNullAt(0))
        assert(out(1).isNullAt(0))
        assert(out(2).isNullAt(0))
      }
  }
}
