package graft.kernel

import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Prop, Properties}

import graft.kernel.ConvertKernel.convertOne

/** ScalaCheck robustness invariants for the whole parse kernel: the
  * error-as-column contract (O16) says executors NEVER throw on data
  * errors, so `convertOne` over arbitrary bytes must always return a row —
  * either a parse result or an error row, never an exception. Exercised
  * against raw fuzz bytes and against structure-shaped fuzz (PDF-ish and
  * zip-ish prefixes that route to the structured parsers and then hit
  * garbage inside).
  */
object ParserRobustnessProps extends Properties("ParserRobustness") {

  private val genBytes: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  private val extensions =
    Seq("md", "csv", "html", "pdf", "docx", "pptx", "adoc", "bin")

  private def rowNotThrow(name: String, bytes: Array[Byte]): Prop = {
    val r = convertOne(name, bytes)
    // a result row always comes back: either content or an error, never both null
    Prop(r.markdown != null || r.error != null) :| s"no row for $name (${bytes.length} bytes)"
  }

  property("convertOne never throws on arbitrary bytes under any extension") =
    Prop.forAll(genBytes, Gen.oneOf(extensions)) { (bytes, ext) =>
      rowNotThrow(s"fuzz.$ext", bytes)
    }

  property("PDF parser never throws on %PDF-prefixed garbage") =
    Prop.forAll(genBytes) { bytes =>
      rowNotThrow("fuzz.pdf", "%PDF-1.4\n".getBytes(StandardCharsets.ISO_8859_1) ++ bytes)
    }

  property("PDF parser never throws on object-shaped garbage streams") =
    Prop.forAll(genBytes, Gen.chooseNum(1, 9)) { (bytes, n) =>
      val doc = ("%PDF-1.4\n" +
        s"$n 0 obj\n<< /Length ${bytes.length} /Filter /FlateDecode >>\nstream\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ bytes ++
        "\nendstream\nendobj\n%%EOF".getBytes(StandardCharsets.ISO_8859_1)
      rowNotThrow("fuzz.pdf", doc)
    }

  property("OOXML parsers never throw on zip-magic-prefixed garbage") =
    Prop.forAll(genBytes) { bytes =>
      // PK\x03\x04 routes to the zip classifier, then the entry walk hits junk
      rowNotThrow("fuzz.docx", Array[Byte]('P', 'K', 3, 4) ++ bytes)
    }
}
