package graft.ingest

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the detection/transcode plane (SURVEY §5.3.2).
  * Runs under sbt's native ScalaCheck integration (no scalatest bridge).
  */
object FormatDetectionProps extends Properties("FormatDetection") {

  private val genBytes: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 64)
    bytes <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  } yield bytes.toArray

  // Mix of realistic prefixes and raw noise, so magic branches get hit too.
  private val genContent: Gen[Array[Byte]] = Gen.frequency(
    5 -> genBytes,
    1 -> genBytes.map("%PDF".getBytes ++ _),
    1 -> genBytes.map("PK".getBytes ++ _),
    1 -> genBytes.map("ID3".getBytes ++ _),
    1 -> genBytes.map("RIFF".getBytes ++ _),
    1 -> genBytes.map("<html>".getBytes ++ _),
    1 -> genBytes.map("BM".getBytes ++ _))

  private val genFilename: Gen[String] = Gen.oneOf(
    Gen.const(null.asInstanceOf[String]),
    Gen.const(""),
    Gen.alphaNumStr.map(_.take(10)),
    for {
      stem <- Gen.alphaNumStr.map(s => if (s.isEmpty) "f" else s.take(8))
      ext <- Gen.oneOf("csv", "CSV", "md", "MD", "adoc", "html", "pdf", "bin", "", ".")
    } yield s"$stem.$ext")

  property("guessFormat is total: never throws, result is a known format or None") =
    Prop.forAll(genContent, genFilename) { (content, filename) =>
      val r = FormatDetection.guessFormat(content, filename)
      r.forall(FormatDetection.Formats.contains)
    }

  property("isSupported agrees with guessFormat.isDefined") =
    Prop.forAll(genContent, genFilename) { (content, filename) =>
      FormatDetection.isSupported(content, filename) ==
        FormatDetection.guessFormat(content, filename).isDefined
    }

  property("transcodeCsv is total and idempotent on its own output") =
    Prop.forAll(genBytes) { content =>
      val r = Transcode.transcodeCsv(content)
      // Either an error (with original bytes) or UTF-8 output that
      // re-transcodes to itself (UTF-8 decode succeeds first).
      r.error match {
        case Some(_) => r.utf8Bytes.sameElements(content)
        case None =>
          val again = Transcode.transcodeCsv(r.utf8Bytes)
          again.error.isEmpty && again.utf8Bytes.sameElements(r.utf8Bytes)
      }
    }

  property("utf-8 text always round-trips unchanged") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val r = Transcode.transcodeCsv(s.getBytes("UTF-8"))
      r.error.isEmpty && new String(r.utf8Bytes, "UTF-8") == s
    }
}
