package graft.kernel

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

import scala.collection.mutable.ArrayBuffer

import graft.kernel.DocModel._

/** Minimal pure-JVM PDF text extraction.
  *
  * Honest scope: extracts text runs from uncompressed or FlateDecode
  * content streams (the common case for text-based PDFs) — `BT..ET` blocks
  * with `Tj` / `TJ` / `'` string operators, PDF string escapes, and
  * `Td`/`TD`/`T*` line breaks. No layout model, no font/CMap decoding
  * beyond Latin-1, no OCR: an image-only (scanned) PDF yields no text and
  * reports the reference's error-row shape, pointing at the missing ML
  * models (Docling's layout/OCR stack, reference Dockerfile:45-51).
  */
object PdfParser extends FormatParser {

  def parse(name: String, bytes: Array[Byte]): Either[String, DocTree] = {
    try {
      val streams = contentStreams(bytes)
      val blocks = streams.flatMap(extractTextBlocks)
      if (blocks.isEmpty)
        Left("PDF has no extractable text (image-only PDFs need OCR models not available in this build)")
      else
        Right(DocTree(name, blocks.map(TextElement(_))))
    } catch {
      case e: Exception => Left(s"Invalid PDF: ${e.getMessage}")
    }
  }

  /** All stream payloads in file order, inflated when FlateDecode (or raw
    * when the preceding dict names no filter). Non-Flate filters are
    * skipped. */
  private[kernel] def contentStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = ArrayBuffer[Array[Byte]]()
    var from = 0
    while (from < raw.length) {
      val s = raw.indexOf("stream", from)
      if (s < 0) { from = raw.length }
      else {
        // dict immediately before the stream keyword
        val dictStart = raw.lastIndexOf("<<", s)
        val dict = if (dictStart >= 0) raw.substring(dictStart, s) else ""
        // payload starts after "stream" + EOL
        var p = s + "stream".length
        if (p < raw.length && raw.charAt(p) == '\r') p += 1
        if (p < raw.length && raw.charAt(p) == '\n') p += 1
        val e = raw.indexOf("endstream", p)
        if (e < 0) { from = raw.length }
        else {
          val payload = bytes.slice(p, e)
          val isFlate = dict.contains("/FlateDecode")
          val hasOtherFilter = dict.contains("/Filter") && !isFlate
          if (!hasOtherFilter) {
            val data = if (isFlate) inflate(payload) else Some(trimEol(payload))
            data.foreach(out += _)
          }
          from = e + "endstream".length
        }
      }
    }
    out.toSeq
  }

  private def trimEol(b: Array[Byte]): Array[Byte] = {
    var end = b.length
    while (end > 0 && (b(end - 1) == '\n' || b(end - 1) == '\r')) end -= 1
    b.take(end)
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && inf.needsDictionary()) return None
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  /** Text blocks from one content stream: each BT..ET block becomes one
    * block string; `Td`/`TD`/`T*` between shows break lines with \n. */
  private[kernel] def extractTextBlocks(stream: Array[Byte]): Seq[String] = {
    val src = new String(stream, StandardCharsets.ISO_8859_1)
    val blocks = ArrayBuffer[String]()
    var i = 0
    while (i < src.length) {
      val bt = indexOfToken(src, "BT", i)
      if (bt < 0) { i = src.length }
      else {
        val et = indexOfToken(src, "ET", bt + 2)
        val end = if (et < 0) src.length else et
        val text = extractFromBlock(src.substring(bt + 2, end))
        if (text.trim.nonEmpty) blocks += text.trim
        i = end + 2
      }
    }
    blocks.toSeq
  }

  private def indexOfToken(s: String, tok: String, from: Int): Int = {
    var i = s.indexOf(tok, from)
    while (i >= 0) {
      val before = i == 0 || !s.charAt(i - 1).isLetterOrDigit
      val after = i + tok.length >= s.length || !s.charAt(i + tok.length).isLetterOrDigit
      if (before && after) return i
      i = s.indexOf(tok, i + 1)
    }
    -1
  }

  /** Walk one BT block: collect literal strings fed to Tj/TJ/' and insert
    * newlines at Td/TD/T* operators that follow emitted text. */
  private def extractFromBlock(block: String): String = {
    val sb = new StringBuilder
    var i = 0
    var emitted = false
    def newline(): Unit = {
      if (emitted && sb.nonEmpty && !sb.endsWith("\n")) sb += '\n'
    }
    while (i < block.length) {
      block.charAt(i) match {
        case '(' =>
          val (s, next) = readLiteralString(block, i)
          sb ++= s
          emitted = true
          i = next
        case '<' if i + 1 < block.length && block.charAt(i + 1) != '<' =>
          val end = block.indexOf('>', i)
          if (end > 0) {
            sb ++= decodeHexString(block.substring(i + 1, end))
            emitted = true
            i = end + 1
          } else i += 1
        case 'T' if i + 1 < block.length &&
          (block.charAt(i + 1) == 'd' || block.charAt(i + 1) == 'D' || block.charAt(i + 1) == '*') =>
          newline(); i += 2
        case '\'' => newline(); i += 1
        case _ => i += 1
      }
    }
    sb.toString
  }

  private def readLiteralString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case '(' => sb += '('; i += 2
            case ')' => sb += ')'; i += 2
            case '\\' => sb += '\\'; i += 2
            case d if d >= '0' && d <= '7' =>
              var oct = 0
              var n = 0
              i += 1
              while (n < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                oct = oct * 8 + (s.charAt(i) - '0'); i += 1; n += 1
              }
              sb += oct.toChar
            case _ => i += 2 // unknown escape: drop backslash
          }
        case '(' => depth += 1; sb += '('; i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb += ')'
          i += 1
        case c => sb += c; i += 1
      }
    }
    (sb.toString, i)
  }

  private def decodeHexString(hex: String): String = {
    val clean = hex.filterNot(_.isWhitespace)
    val padded = if (clean.length % 2 == 1) clean + "0" else clean
    padded.grouped(2).flatMap { h =>
      try Some(Integer.parseInt(h, 16).toChar) catch { case _: Exception => None }
    }.mkString
  }
}
