package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins graft_nfc: UAX #15 composition cases, the zero-alloc fast path,
  * codegen/interpreted agreement, null propagation, and the SQL
  * registration — t18 carries the cross-engine oracle; this covers the
  * unicode edges the ASCII fixture can't reach. */
class NfcNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private val combining = "́" // COMBINING ACUTE ACCENT
  private val composed = "é"  // é, the NFC form of e + U+0301

  private def nfcOf(s: String): String =
    Seq(s).toDF("s").select(GraftStringFunctions.nfc($"s")).head().getString(0)

  test("composes decomposed sequences and leaves leftover marks") {
    assert(nfcOf("e" + combining) == composed)
    // only the first mark composes; the rest stay as combining chars
    assert(nfcOf("e" + combining + combining) == composed + combining)
    assert(nfcOf("Cafe" + combining) == "Caf" + composed)
  }

  test("already-NFC input is returned verbatim (fast path)") {
    assert(nfcOf("plain ascii text") == "plain ascii text")
    assert(nfcOf(composed) == composed)
    assert(nfcOf("") == "")
  }

  test("decomposition round-trip: NFD input normalizes to the composed form") {
    val nfd = java.text.Normalizer.normalize("déjà vu", java.text.Normalizer.Form.NFD)
    assert(nfd.length > "déjà vu".length, "test premise: NFD decomposes")
    assert(nfcOf(nfd) == "déjà vu")
  }

  test("null propagates") {
    val got = Seq[(Integer, String)]((1, null)).toDF("id", "s")
      .select(GraftStringFunctions.nfc($"s")).head()
    assert(got.isNullAt(0))
  }

  test("interpreted eval agrees with the codegen path") {
    val in = "e" + combining + " x" * 3
    val expr = NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(in)))
    val interpreted = expr.eval(null).toString
    assert(interpreted == nfcOf(in),
      "Literal eval (interpreted) and the projected (codegen) path must agree")
  }

  test("graft_nfc registers for SQL via GraftExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registry = org.apache.spark.sql.graft.Bridge.registerFunctions(ext,
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    assert(registry.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nfc")))
  }
}
