package graft.kernel

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.ConvertKernel.convertOne

/** Text extraction from text-based PDFs (upgrades pdf from error-row to a
  * working parser for the Flate/plain-stream common case). Fixture PDFs
  * are assembled in-test: header + content stream(s) + text operators.
  */
class PdfParserSpec extends AnyFunSuite {

  private def deflate(s: String): Array[Byte] = {
    val d = new Deflater()
    d.setInput(s.getBytes(StandardCharsets.ISO_8859_1))
    d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def pdf(streams: Seq[(String, Boolean)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write("%PDF-1.4\n".getBytes(StandardCharsets.ISO_8859_1))
    streams.zipWithIndex.foreach { case ((content, compress), i) =>
      val payload =
        if (compress) deflate(content)
        else content.getBytes(StandardCharsets.ISO_8859_1)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      bos.write(
        s"${i + 4} 0 obj\n<< /Length ${payload.length}$filter >>\nstream\n"
          .getBytes(StandardCharsets.ISO_8859_1))
      bos.write(payload)
      bos.write("\nendstream\nendobj\n".getBytes(StandardCharsets.ISO_8859_1))
    }
    bos.write("%%EOF\n".getBytes(StandardCharsets.ISO_8859_1))
    bos.toByteArray
  }

  test("plain content stream: Tj runs with Td line breaks extract in order") {
    val content =
      "BT /F1 12 Tf 72 720 Td (Hello PDF world.) Tj 0 -14 Td (Second line.) Tj ET"
    val r = convertOne("doc.pdf", pdf(Seq(content -> false)))
    assert(r.error == null, String.valueOf(r.error))
    assert(r.filename == "doc")
    assert(r.markdown == "Hello PDF world.\nSecond line.")
  }

  test("FlateDecode stream, TJ arrays, escapes and hex strings decode") {
    val content =
      "BT [(Kerned \\(text\\)) -250 ( here)] TJ ET " +
        "BT <48692068657821> Tj ET"
    val r = convertOne("flate.pdf", pdf(Seq(content -> true)))
    assert(r.error == null, String.valueOf(r.error))
    // two BT blocks -> two markdown paragraphs
    assert(r.markdown == "Kerned (text) here\n\nHi hex!")
  }

  test("multiple streams concatenate in file order") {
    val r = convertOne("multi.pdf", pdf(Seq(
      "BT (Page one text.) Tj ET" -> true,
      "BT (Page two text.) Tj ET" -> false)))
    assert(r.error == null)
    assert(r.markdown == "Page one text.\n\nPage two text.")
  }

  test("image-only pdf (no text operators) is an honest error row") {
    val r = convertOne("scan.pdf", pdf(Seq("q 100 0 0 100 0 0 cm /Im0 Do Q" -> true)))
    assert(r.markdown == null)
    assert(r.error != null && r.error.contains("OCR"))
  }

  test("pdf with no streams at all is an error row, not a throw") {
    val r = convertOne("empty.pdf", "%PDF-1.4\n%%EOF".getBytes)
    assert(r.error != null)
  }

  test("octal escapes and nested parens in literal strings") {
    val content = "BT (A\\051B (nested) \\101) Tj ET"
    val r = convertOne("esc.pdf", pdf(Seq(content -> false)))
    assert(r.error == null)
    assert(r.markdown == "A)B (nested) A")
  }
}
