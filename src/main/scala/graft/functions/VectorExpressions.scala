package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `Array[Float]` columns — the hot scalar of the similarity plane
  * (s1 brute force, s2 IVF rerank; reference corpus shape in
  * FIXTURES.md: 64-dim float embeddings).
  *
  * Why an Expression and not a HOF chain or a UDF (SURVEY §7.5 preference
  * order): Spark's higher-order functions (`zip_with`/`aggregate`) are
  * CodegenFallback — interpreted per row with per-element closure calls —
  * and a Scala UDF adds serialization at the boundary. This expression
  * participates in whole-stage codegen: `doGenCode` emits one fused Java
  * loop (dot product and both norms in a single pass over the unsafe
  * array data, no allocation). Semantics exactly match the HOF form and
  * the DuckDB oracle: accumulation in index order, double arithmetic,
  * `dot / (sqrt(na) * sqrt(nb))` — so swapping it into s1/s2 changes no
  * result bit. Null contract: null input, length mismatch, or a null
  * element → null (the zip_with form nulls the same way).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($b.numElements() != $n);
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final double $xv = (double) $a.getFloat($i);
         |    final double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv;
         |    $na += $xv * $xv;
         |    $nb += $yv * $yv;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API and SQL surfaces for the vector expressions. */
object GraftFunctions {

  /** Cosine similarity of two Array[Float] columns, whole-stage-codegen'd. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  private[functions] val cosineBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSimilarity(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_cosine expects 2 arguments, got ${other.size}")
  }

  private[functions] val cosineInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getCanonicalName, null, "graft_cosine")
}

/** SparkSessionExtensions hook: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`) registers
  * `graft_cosine(a, b)` for SQL users and the GroupTopK planner strategy
  * (graft.plans.GroupTopK — the Column API also self-registers the
  * strategy per session, so the extension is the deployment-config path).
  * The Column API (GraftFunctions.cosineSim) needs no registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      GraftFunctions.cosineInfo, GraftFunctions.cosineBuilder))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      NfcNormalize.info, NfcNormalize.builder))
    ext.injectPlannerStrategy(_ => new graft.plans.GroupTopKStrategy)
    // inert until graft.topk.rewrite=true (see GroupTopKRewrite scaladoc)
    ext.injectOptimizerRule(s => graft.plans.GroupTopKRewrite(s))
  }
}
