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

/** Dot product of two `Array[Float]` columns — the coarse-scoring
  * scalar of the ANN plane (s4/s8 sign-bucket assignment, s7's prefix
  * ranking). Same rationale as [[CosineSimilarity]]: the
  * `aggregate(zip_with(...))` HOF form these stages first shipped with
  * is CodegenFallback (interpreted per row, closure call per element);
  * this emits one fused codegen loop. Accumulation is index-order
  * double arithmetic — bit-identical to the HOF fold and the oracle's
  * list_sum/list_reduce, so the swap changes no result. Null contract
  * mirrors [[CosineSimilarity]]. */
case class DotProduct(left: Expression, right: Expression)
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
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($b.numElements() != $n);
         |double $dot = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between an `Array[Float]` vector and an
  * `Array[Float]` OR `Array[Double]` one (IVF centroids are exact
  * double means, query vectors float32 — the s2/s6/s8 probe pairing).
  * Same fused-loop/codegen rationale and index-order double semantics
  * as [[DotProduct]]. */
case class L2SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2sq"

  private def get(x: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => x.getFloat(i).toDouble
    case _         => x.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (tx, ty) = (elemType(left.dataType).get, elemType(right.dataType).get)
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = get(x, tx, i) - get(y, ty, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def accessor(v: String, t: DataType, i: String): String = t match {
      case FloatType => s"((double) $v.getFloat($i))"
      case _         => s"$v.getDouble($i)"
    }
    val (tx, ty) = (elemType(left.dataType).get, elemType(right.dataType).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($b.numElements() != $n);
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final double $d = ${accessor(a, tx, i)} - ${accessor(b, ty, i)};
         |    $acc += $d * $d;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API and SQL surfaces for the vector expressions. */
object GraftFunctions {

  /** Cosine similarity of two Array[Float] columns, whole-stage-codegen'd. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Dot product of two Array[Float] columns, whole-stage-codegen'd. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Squared L2 distance (array<float|double>), whole-stage-codegen'd. */
  def l2sq(a: Column, b: Column): Column =
    Bridge.column(L2SquaredDistance(Bridge.expression(a), Bridge.expression(b)))

  private[functions] def builder2(name: String,
      mk: (Expression, Expression) => Expression): Seq[Expression] => Expression = {
    case Seq(a, b) => mk(a, b)
    case other => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${other.size}")
  }

  private[functions] val cosineBuilder = builder2("graft_cosine", CosineSimilarity)
  private[functions] val cosineInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getCanonicalName, null, "graft_cosine")
  private[functions] val dotInfo = new ExpressionInfo(
    classOf[DotProduct].getCanonicalName, null, "graft_dot")
  private[functions] val l2sqInfo = new ExpressionInfo(
    classOf[L2SquaredDistance].getCanonicalName, null, "graft_l2sq")
  private[functions] val cmsInfo = new ExpressionInfo(
    classOf[CountMinEstimate].getCanonicalName, null, "graft_cms_estimate")
  private[functions] val thetaDiffInfo = new ExpressionInfo(
    classOf[ThetaDiffEstimate].getCanonicalName, null, "graft_theta_diff")
  private[functions] val thetaUnionInfo = new ExpressionInfo(
    classOf[ThetaUnionEstimate].getCanonicalName, null, "graft_theta_union")
}

/** SparkSessionExtensions hook: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`) registers
  * the full `graft_*` function family (cosine, dot, l2sq, nfc,
  * cms_estimate, theta_diff, theta_union) for SQL users and the GroupTopK planner strategy
  * (graft.plans.GroupTopK — the Column API also self-registers the
  * strategy per session, so the extension is the deployment-config path).
  * The Column API (GraftFunctions.cosineSim) needs no registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      GraftFunctions.cosineInfo, GraftFunctions.cosineBuilder))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      NfcNormalize.info, NfcNormalize.builder))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      GraftFunctions.dotInfo, GraftFunctions.builder2("graft_dot", DotProduct)))
    ext.injectFunction((FunctionIdentifier("graft_l2sq"),
      GraftFunctions.l2sqInfo,
      GraftFunctions.builder2("graft_l2sq", L2SquaredDistance)))
    ext.injectFunction((FunctionIdentifier("graft_cms_estimate"),
      GraftFunctions.cmsInfo,
      GraftFunctions.builder2("graft_cms_estimate", CountMinEstimate)))
    ext.injectFunction((FunctionIdentifier("graft_theta_diff"),
      GraftFunctions.thetaDiffInfo,
      GraftFunctions.builder2("graft_theta_diff", ThetaDiffEstimate)))
    ext.injectFunction((FunctionIdentifier("graft_theta_union"),
      GraftFunctions.thetaUnionInfo,
      GraftFunctions.builder2("graft_theta_union", ThetaUnionEstimate)))
    ext.injectPlannerStrategy(_ => new graft.plans.GroupTopKStrategy)
    // inert until graft.topk.rewrite=true (see GroupTopKRewrite scaladoc)
    ext.injectOptimizerRule(s => graft.plans.GroupTopKRewrite(s))
  }
}
