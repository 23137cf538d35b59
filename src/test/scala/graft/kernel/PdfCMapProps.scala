package graft.kernel

import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Prop, Properties}

import graft.kernel.ConvertKernel.convertOne

/** ScalaCheck round-trip for the ToUnicode CMap path: generate a random
  * code→string table, render it as a bfchar CMap inside a synthetic PDF,
  * show a hex string of those codes under the font, and assert the
  * extracted text is exactly the mapped concatenation. Pins the CMap
  * parser + 2-byte code grouping against inputs no hand-written fixture
  * covers.
  */
object PdfCMapProps extends Properties("PdfCMap") {

  // printable BMP chars that survive markdown trimming and JSON-ish escapes
  private val genTarget: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('€', 'ß', 'λ', '→', '中', 'é')))
      .map(_.take(3).mkString)

  // distinct 2-byte codes (avoid 0 to keep hex round numbers simple)
  private val genTable: Gen[Map[Int, String]] = for {
    n <- Gen.chooseNum(1, 12)
    codes <- Gen.pick(n, 1 to 0x2000)
    targets <- Gen.listOfN(n, genTarget)
  } yield codes.zip(targets).toMap

  private def pdfFor(table: Map[Int, String], codeSeq: Seq[Int]): Array[Byte] = {
    val bfchars = table.map { case (c, s) =>
      val dst = s.map(ch => f"${ch.toInt}%04X").mkString
      f"<$c%04X> <$dst>"
    }.mkString("\n")
    val cmap =
      s"""begincmap
         |1 begincodespacerange
         |<0000> <FFFF>
         |endcodespacerange
         |${table.size} beginbfchar
         |$bfchars
         |endbfchar
         |endcmap""".stripMargin
    val hex = codeSeq.map(c => f"$c%04X").mkString
    val content = s"BT /F1 10 Tf <$hex> Tj ET"
    def obj(num: Int, dict: String, stream: Option[String]): String = stream match {
      case None => s"$num 0 obj\n$dict\nendobj\n"
      case Some(s0) =>
        s"$num 0 obj\n<< /Length ${s0.length} >>\nstream\n$s0\nendstream\nendobj\n"
    }
    ("%PDF-1.4\n" +
      obj(1, "<< /Type /Page /Resources << /Font << /F1 2 0 R >> >> >>", None) +
      obj(2, "<< /Type /Font /Subtype /Type0 /BaseFont /P+F /ToUnicode 3 0 R >>", None) +
      obj(3, "", Some(cmap)) +
      obj(4, "", Some(content)) +
      "%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
  }

  property("random bfchar tables round-trip exactly through extraction") =
    Prop.forAll(genTable) { table =>
      val codes = table.keys.toSeq.sorted
      val expected = codes.map(table).mkString.trim
      val r = convertOne("prop.pdf", pdfFor(table, codes))
      if (expected.isEmpty) Prop(r.error != null) :| "empty text must error"
      else (Prop(r.error == null) :| s"error: ${r.error}") &&
        (Prop(r.markdown == expected) :| s"got '${r.markdown}' want '$expected'")
    }

  property("unmapped codes decode to the replacement char, mapped ones still exact") =
    Prop.forAll(genTable, Gen.chooseNum(0x3000, 0x3FFF)) { (table, unmapped) =>
      val codes = table.keys.toSeq.sorted
      val expected = (codes.map(table).mkString + "�").trim
      val r = convertOne("prop2.pdf", pdfFor(table, codes :+ unmapped))
      Prop(r.error == null && r.markdown == expected) :|
        s"got '${String.valueOf(r.markdown)}' want '$expected'"
    }
}
