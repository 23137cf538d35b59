package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the text
  * plane's canonicalization primitive (t18). Two byte sequences can
  * render identically (é as U+00E9 vs e + U+0301) yet hash, compare,
  * dedup, and shingle differently; every dedup/fingerprint operator in
  * this engine is byte-keyed, so a corpus mixing composed and
  * decomposed forms MUST be canonicalized first or near-identical
  * documents land in different buckets. NFC (canonical composition,
  * UAX #15) is the normalization the oracle engine exposes
  * (`nfc_normalize`), so results are cross-checked engine-to-engine.
  *
  * Why an Expression, not a UDF (SURVEY §7.5 preference order): the
  * normalize call participates in whole-stage codegen via a static
  * helper — no serialization boundary, null propagation for free, and
  * the ALREADY-NORMALIZED fast path ([[NfcNormalize.nfc]] checks
  * `Normalizer.isNormalized` first) returns the input UTF8String with
  * zero allocation. ASCII — the overwhelming share of real corpora — is
  * always NFC, so the hot path is a scan, not a rewrite.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      in => s"graft.functions.NfcNormalize.nfc($in)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code. */
  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  private[functions] val builder: Seq[Expression] => Expression = {
    case Seq(c) => NfcNormalize(c)
    case other => throw new IllegalArgumentException(
      s"graft_nfc expects 1 argument, got ${other.size}")
  }

  private[functions] val info = new ExpressionInfo(
    classOf[NfcNormalize].getCanonicalName, null, "graft_nfc")
}

/** Column-API surface for the string expressions. */
object GraftStringFunctions {
  /** Unicode NFC canonical composition, whole-stage-codegen'd. */
  def nfc(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
