package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The native CosineSimilarity expression's contract: bit-identical to
  * the HOF (zip_with/aggregate) form it replaced, inside whole-stage
  * codegen (not CodegenFallback), correct null semantics, and SQL
  * registration through GraftExtensions.
  */
class CosineExpressionSpec extends SparkTestBase {

  import spark.implicits._

  private val hofCosine =
    expr("aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0 as double), (acc, v) -> acc + v)") /
      (sqrt(expr("aggregate(transform(a, x -> cast(x as double) * cast(x as double)), " +
        "cast(0 as double), (acc, v) -> acc + v)")) *
        sqrt(expr("aggregate(transform(b, x -> cast(x as double) * cast(x as double)), " +
          "cast(0 as double), (acc, v) -> acc + v)")))

  private def seededVecs(n: Int, dim: Int) = {
    val rng = new scala.util.Random(7L)
    Seq.fill(n)((Array.fill(dim)(rng.nextFloat() * 2 - 1),
      Array.fill(dim)(rng.nextFloat() * 2 - 1))).toDF("a", "b")
  }

  test("bit-identical to the HOF form on 200 seeded random vector pairs") {
    val df = seededVecs(200, 64)
      .select(GraftFunctions.cosineSim($"a", $"b").as("native"), hofCosine.as("hof"))
    val rows = df.collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    // repartition defeats ConvertToLocalRelation so the projection really
    // executes in a codegen stage instead of being constant-folded;
    // collect first so AQE finalizes the plan before inspecting it
    val df = seededVecs(4, 8).repartition(2)
      .select(GraftFunctions.cosineSim($"a", $"b").as("c"))
    assert(df.collect().forall(r => !r.isNullAt(0) && !r.getDouble(0).isNaN))
    val plan = df.queryExecution.executedPlan.toString
    // AQE's compact rendering marks codegen stages with "*(n)"; a
    // CodegenFallback expression would force a plain (unstarred) Project
    assert("""\*\(\d+\) Project \[graft_cosine""".r.findFirstIn(plan).isDefined, plan)
  }

  test("null contract: null input, length mismatch, null element -> null") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),       // ok
      (None, Some(Array(1f, 2f))),                       // null input
      (Some(Array(1f, 2f, 3f)), Some(Array(1f, 2f)))     // length mismatch
    ).toDF("a", "b")
    val out = df.select(GraftFunctions.cosineSim($"a", $"b")).collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
    // null element
    val withNullElem = spark.sql(
      "SELECT array(cast(1.0 as float), cast(null as float)) AS a, " +
        "array(cast(1.0 as float), cast(2.0 as float)) AS b")
      .select(GraftFunctions.cosineSim($"a", $"b")).collect()
    assert(withNullElem(0).isNullAt(0))
  }

  test("GraftExtensions registers graft_cosine (resolvable + interpreted eval)") {
    // a live withExtensions session can't be built in the shared test JVM
    // (getOrCreate returns the existing session), so exercise the same
    // public path the session builder uses: inject, register into a
    // registry, look up, and eval interpreted (the non-codegen path).
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registry = org.apache.spark.sql.graft.Bridge.registerFunctions(
      ext, FunctionRegistry.builtin.clone())
    val vec = Literal.create(Array(1.0f, 0.0f), ArrayType(FloatType))
    val e = registry.lookupFunction(FunctionIdentifier("graft_cosine"), Seq(vec, vec))
    assert(e.isInstanceOf[CosineSimilarity])
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
    // the whole graft_* family resolves for SQL users
    val dot = registry.lookupFunction(FunctionIdentifier("graft_dot"), Seq(vec, vec))
    assert(dot.isInstanceOf[DotProduct])
    assert(math.abs(dot.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
    val l2 = registry.lookupFunction(FunctionIdentifier("graft_l2sq"), Seq(vec, vec))
    assert(l2.isInstanceOf[L2SquaredDistance])
    assert(l2.eval(null).asInstanceOf[Double] == 0.0)
    assert(registry.functionExists(FunctionIdentifier("graft_cms_estimate")))
    assert(registry.functionExists(FunctionIdentifier("graft_theta_diff")))
    assert(registry.functionExists(FunctionIdentifier("graft_nfc")))
  }
}
