package graft.kernel

import java.io.ByteArrayOutputStream
import java.nio.charset.{Charset, StandardCharsets}
import java.util.zip.Inflater

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import graft.kernel.DocModel._

/** Minimal pure-JVM PDF text extraction.
  *
  * Honest scope: extracts text runs from uncompressed or FlateDecode
  * content streams (the common case for text-based PDFs) — `BT..ET` blocks
  * with `Tj` / `TJ` / `'` string operators, PDF string escapes, and
  * `Td`/`TD`/`T*` line breaks. Fonts are resolved through the object
  * index: a font with a `/ToUnicode` CMap decodes through its
  * `bfchar`/`bfrange` mappings (so subset-embedded Type0/Identity-H fonts
  * — the typical LaTeX/Word output — extract real text);
  * `/WinAnsiEncoding` and `/MacRomanEncoding` decode through the matching
  * JVM charsets; an un-mapped non-identity encoding (Identity-H with no
  * ToUnicode, an indirect /Encoding object, a /Differences array) is
  * UNDECODABLE and fails the whole document with an honest error row
  * instead of emitting silently garbled text (the error-as-column
  * contract, reference service.py:141-150 handles these via Docling's
  * font stack). Embedded image XObjects referenced by `Do` operators are
  * extracted in stream order — /DCTDecode payloads ship as the embedded
  * JPEG, 8-bit Flate RGB/gray rasters (incl. the PNG row predictor) are
  * reconstructed — and splice into the images array like DOCX/PPTX media
  * (reference ships document pictures the same way, service.py:106-128);
  * codecs outside the JVM's reach (CCITT, JBIG2, JPX) omit the picture
  * rather than faking a placeholder. No layout model, no OCR: an
  * image-only (scanned) PDF yields no text and reports the reference's
  * error-row shape, pointing at the missing ML models (Docling's
  * layout/OCR stack, reference Dockerfile:45-51).
  *
  * Tables: runs positioned by `Tm`/`Td` within one BT block that form an
  * unambiguous grid (aligned x columns across ≥2 line bands, ≥2 columns,
  * ≥60% filled) reconstruct as TableElements — the no-ML answer to the
  * reference's headline table-extraction comparison (README.md:6-18);
  * see [[detectTable]] for the exact evidence bar.
  *
  * Approximations, documented: font resource names (`/F1`) are resolved
  * in one global namespace across all pages (per-page /Resources scoping
  * would need full page-tree traversal); object scanning is sequential —
  * stream payloads are sliced by the dict's direct-integer /Length when
  * present and verified, so only length-less or lying dicts fall back to
  * the `endstream` keyword scan that binary payloads could fake.
  */
object PdfParser extends FormatParser {

  def parse(name: String, bytes: Array[Byte]): Either[String, DocTree] = {
    try {
      val objs = parseObjects(bytes)
      // encrypted files reference /Encrypt from the trailer dict (or an
      // xref-stream object body); their strings and streams are
      // ciphertext, so fail with the honest cause instead of a confusing
      // no-text/garble error. Object BODIES and the trailer tail only —
      // decoded stream payloads can legitimately contain the bytes.
      val trailerTail = {
        val raw = new String(bytes, StandardCharsets.ISO_8859_1)
        val t = raw.lastIndexOf("trailer")
        if (t < 0) "" else raw.substring(t)
      }
      if (trailerTail.contains("/Encrypt") || objs.exists(_.body.contains("/Encrypt")))
        return Left("PDF is encrypted; decryption is not supported in this build")
      val (fonts, toUnicodeNums) = buildFonts(objs)
      val imagesByName = buildImages(objs)
      val streams = pageOrderedStreams(objs).getOrElse {
        // no page tree: every stream in FILE order (minimal/linearized
        // files, or producers without a parsable catalog); link
        // annotations need the page association, so none attach here
        val raw =
          if (objs.exists(_.data.isDefined))
            objs.filter(o => o.data.isDefined && !toUnicodeNums(o.num) &&
              ImageSubtype.findFirstIn(o.body).isEmpty &&
              FontType.findFirstIn(o.body).isEmpty)
              .flatMap(_.data)
          else contentStreams(bytes) // streams outside any obj wrapper
        raw.map(d => (d, Seq.empty[LinkRect]))
      }
      val undecodable = mutable.SortedSet[String]()
      val elements = streams.flatMap { case (s, links) =>
        extractElements(s, fonts, undecodable, imagesByName, links)
      }
      if (undecodable.nonEmpty)
        Left(s"PDF text uses font(s) ${undecodable.mkString(", ")} with a " +
          "non-identity encoding and no /ToUnicode CMap; cannot decode text reliably")
      else if (!elements.exists(e => e.isInstanceOf[TextElement] || e.isInstanceOf[TableElement]))
        Left("PDF has no extractable text (image-only PDFs need OCR models not available in this build)")
      else
        Right(DocTree(name, elements))
    } catch {
      case e: Exception => Left(s"Invalid PDF: ${e.getMessage}")
    }
  }

  // ---------------------------------------------------------------- objects

  /** One indirect object: number, body text (ISO-8859-1 view), the decoded
    * stream payload when the object carries a Flate/plain stream, and the
    * raw (undecoded) payload for other filters — e.g. /DCTDecode image
    * data, which IS the embedded JPEG byte-for-byte. */
  private[kernel] final case class PdfObject(num: Int, body: String,
                                             data: Option[Array[Byte]],
                                             raw: Option[Array[Byte]] = None)

  private val ObjStart = """(\d+)\s+\d+\s+obj\b""".r
  private val FontType = """/Type\s*/Font""".r
  private val Type0Subtype = """/Subtype\s*/Type0""".r
  private val ImageSubtype = """/Subtype\s*/Image""".r
  // direct-integer /Length only — "/Length 5 0 R" (indirect) is excluded,
  // and "/Length1" (embedded-font dicts) cannot match because \s+ follows
  private val DirectLen = """/Length\s+(\d+)(?!\s+\d+\s+R)""".r

  /** When the stream dict declares a direct-integer /Length, the payload
    * ends exactly `len` bytes after the data start — trust it when the
    * bytes there really are (whitespace +) `endstream`, so compressed
    * payloads that happen to contain the keyword bytes are not truncated.
    * Otherwise fall back to the first-keyword scan. Returns the payload
    * end offset, or -1 when no endstream can be found at all. */
  private def streamEnd(raw: String, p: Int, dict: String): Int = {
    DirectLen.findFirstMatchIn(dict).map(_.group(1).toInt) match {
      case Some(len) if p + len <= raw.length =>
        var q = p + len
        while (q < raw.length &&
          (raw.charAt(q) == '\r' || raw.charAt(q) == '\n' ||
            raw.charAt(q) == ' ' || raw.charAt(q) == '\t')) q += 1
        if (raw.startsWith("endstream", q)) p + len
        else raw.indexOf("endstream", p)
      case _ => raw.indexOf("endstream", p)
    }
  }

  /** Sequential scan of `N G obj .. endobj` wrappers. Stream payloads are
    * sliced by the dict's direct /Length when it checks out (see
    * [[streamEnd]]) — binary payloads containing 'endstream'/'endobj'
    * byte sequences no longer truncate, and the cursor advances past the
    * verified payload so phantom `N G obj` matches inside it are skipped.
    * For stream objects the recorded body is the dict alone (everything
    * the font/image/page regexes need precedes `stream`). */
  private[kernel] def parseObjects(bytes: Array[Byte]): Seq[PdfObject] = {
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = ArrayBuffer[PdfObject]()
    var cursor = 0
    for (m <- ObjStart.findAllMatchIn(raw) if m.start >= cursor) {
      val endObjNaive = raw.indexOf("endobj", m.end)
      val streamKw = raw.indexOf("stream", m.end)
      val hasStream = streamKw >= 0 && (endObjNaive < 0 || streamKw < endObjNaive)
      if (hasStream) {
        val dict = raw.substring(m.end, streamKw)
        var p = streamKw + "stream".length
        if (p < raw.length && raw.charAt(p) == '\r') p += 1
        if (p < raw.length && raw.charAt(p) == '\n') p += 1
        val e = streamEnd(raw, p, dict)
        if (e < 0) {
          out += PdfObject(m.group(1).toInt, dict, None, None)
          cursor = math.max(if (endObjNaive < 0) raw.length else endObjNaive + "endobj".length, m.end)
        } else {
          val payload = bytes.slice(p, e)
          val isFlate = dict.contains("/FlateDecode")
          val decoded =
            if (dict.contains("/Filter") && !isFlate) None
            else if (isFlate) inflate(payload) else Some(trimEol(payload))
          out += PdfObject(m.group(1).toInt, dict, decoded, Some(payload))
          val endObjReal = raw.indexOf("endobj", e)
          cursor = math.max(if (endObjReal < 0) e + "endstream".length
            else endObjReal + "endobj".length, m.end)
        }
      } else {
        val bodyEnd = if (endObjNaive < 0) raw.length else endObjNaive
        out += PdfObject(m.group(1).toInt, raw.substring(m.end, bodyEnd), None, None)
        cursor = math.max(bodyEnd + "endobj".length, m.end)
      }
    }
    out.toSeq
  }

  /** All stream payloads in file order — fallback for PDFs whose streams
    * are not wrapped in obj/endobj (synthetic/minimal files). */
  private[kernel] def contentStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = ArrayBuffer[Array[Byte]]()
    var from = 0
    while (from < raw.length) {
      val s = raw.indexOf("stream", from)
      if (s < 0) { from = raw.length }
      else {
        val dictStart = raw.lastIndexOf("<<", s)
        val dict = if (dictStart >= 0) raw.substring(dictStart, s) else ""
        var p = s + "stream".length
        if (p < raw.length && raw.charAt(p) == '\r') p += 1
        if (p < raw.length && raw.charAt(p) == '\n') p += 1
        val e = streamEnd(raw, p, dict)
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

  // ------------------------------------------------------------------ fonts

  /** How to turn a raw byte string shown under a font into text. */
  private sealed trait Dec
  private case object Latin1 extends Dec
  private final case class ByteCharset(cs: Charset) extends Dec
  private final case class CMapDec(cmap: CMap) extends Dec
  private case object Undecodable extends Dec

  private final case class FontInfo(baseName: String, dec: Dec)

  private val ToUniRef = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r
  private val NamedEnc = """/Encoding\s*/([A-Za-z0-9\-]+)""".r
  private val EncRef = """/Encoding\s+(\d+)\s+\d+\s+R""".r
  private val BaseFontRe = """/BaseFont\s*/([^\s/<>\[\]()]+)""".r
  private val FontDictRe = """/Font\s*<<([^>]*)>>""".r
  private val FontRefRe = """/([A-Za-z0-9._]+)\s+(\d+)\s+\d+\s+R""".r

  private def charsetOrLatin1(name: String): Dec =
    try ByteCharset(Charset.forName(name)) catch { case _: Exception => Latin1 }

  /** Font objects + the resource-name map (`/F1` → font), and the object
    * numbers of ToUnicode CMap streams (excluded from content scanning). */
  private def buildFonts(objs: Seq[PdfObject]): (Map[String, FontInfo], Set[Int]) = {
    val byNum = objs.map(o => o.num -> o).toMap
    val toUnicodeNums = mutable.Set[Int]()
    val fontByNum = objs.flatMap { o =>
      if (FontType.findFirstIn(o.body).isEmpty) None
      else {
        val base = BaseFontRe.findFirstMatchIn(o.body).map(_.group(1)).getOrElse("?")
        val cmap = ToUniRef.findFirstMatchIn(o.body).flatMap { m =>
          val n = m.group(1).toInt
          toUnicodeNums += n
          byNum.get(n).flatMap(_.data).flatMap(parseCMap)
        }
        val dec = cmap match {
          case Some(c) => CMapDec(c)
          case None =>
            val named = NamedEnc.findFirstMatchIn(o.body).map(_.group(1))
            val isType0 = Type0Subtype.findFirstIn(o.body).isDefined
            val hasEncRef = EncRef.findFirstIn(o.body).isDefined
            val hasDiff = o.body.contains("/Differences")
            named match {
              case Some("WinAnsiEncoding") if !hasDiff => charsetOrLatin1("windows-1252")
              case Some("MacRomanEncoding") if !hasDiff => charsetOrLatin1("x-MacRoman")
              case Some("StandardEncoding" | "PDFDocEncoding") if !hasDiff => Latin1
              case None if !isType0 && !hasEncRef && !hasDiff => Latin1 // builtin font encoding ≈ latin
              case _ => Undecodable // Identity-H/V, custom CMap ref, Differences
            }
        }
        Some(o.num -> FontInfo(base, dec))
      }
    }.toMap
    // resource name -> font, one global namespace (documented approximation)
    val byName = Map.newBuilder[String, FontInfo]
    for {
      o <- objs
      d <- FontDictRe.findAllMatchIn(o.body)
      r <- FontRefRe.findAllMatchIn(d.group(1))
      f <- fontByNum.get(r.group(2).toInt)
    } byName += r.group(1) -> f
    (byName.result(), toUnicodeNums.toSet)
  }

  // ------------------------------------------------------------- page order

  private val PagesRef = """/Pages\s+(\d+)\s+\d+\s+R""".r
  private val KidsRe = """/Kids\s*\[([^\]]*)\]""".r
  private val RefRe = """(\d+)\s+\d+\s+R""".r
  private val ContentsArr = """/Contents\s*\[([^\]]*)\]""".r
  private val ContentsRef = """/Contents\s+(\d+)\s+\d+\s+R""".r
  private val PageType = """/Type\s*/Page(?![a-zA-Z])""".r

  /** Content streams in PAGE order via the document catalog: /Root (or any
    * /Type /Pages root) → /Kids recursion → each page's /Contents (single
    * ref or array). Real producers frequently write objects out of page
    * order (incremental updates, linearization), so file order is only the
    * fallback. Returns None when no page tree resolves. */
  /** One /Subtype /Link annotation with a /URI action, rect normalized.
    * Rect coordinates are default-user-space; runs carry Tm/Td text-space
    * origins, which coincide for producers that don't transform the CTM
    * (the overwhelmingly common simple-document case this parser serves —
    * a transformed page silently skips link attachment, never mis-texts). */
  private[kernel] final case class LinkRect(x0: Double, y0: Double,
                                            x1: Double, y1: Double, uri: String)

  private val AnnotsArrRe = """/Annots\s*\[([^\]]*)\]""".r
  private val AnnotsRefRe = """/Annots\s+(\d+)\s+\d+\s+R""".r
  private val RectRe = """/Rect\s*\[\s*([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)""".r
  private val UriRe = """/URI\s*\(([^)]*)\)""".r
  private val ActionRefRe = """/A\s+(\d+)\s+\d+\s+R""".r

  /** Link annotations of one page: /Annots (inline array or indirect) →
    * /Subtype /Link objects → /Rect + /A /S /URI action (inline or
    * indirect). Non-URI actions (GoTo, named) are skipped. */
  private def pageLinks(p: PdfObject, byNum: Map[Int, PdfObject]): Seq[LinkRect] = {
    val annotRefs = AnnotsArrRe.findFirstMatchIn(p.body)
      .map(m => RefRe.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq)
      .orElse(AnnotsRefRe.findFirstMatchIn(p.body)
        .flatMap(m => byNum.get(m.group(1).toInt))
        .map(o => RefRe.findAllMatchIn(o.body).map(_.group(1).toInt).toSeq))
      .getOrElse(Seq.empty)
    annotRefs.flatMap(byNum.get)
      .filter(a => a.body.contains("/Subtype /Link") || a.body.contains("/Subtype/Link"))
      .flatMap { a =>
        val uri = UriRe.findFirstMatchIn(a.body).map(_.group(1))
          .orElse(ActionRefRe.findFirstMatchIn(a.body)
            .flatMap(m => byNum.get(m.group(1).toInt))
            .flatMap(o => UriRe.findFirstMatchIn(o.body).map(_.group(1))))
        for (u <- uri; r <- RectRe.findFirstMatchIn(a.body)) yield {
          val Seq(ax, ay, bx, by) = (1 to 4).map(i => r.group(i).toDouble)
          LinkRect(math.min(ax, bx), math.min(ay, by),
            math.max(ax, bx), math.max(ay, by), u)
        }
      }
  }

  /** Page objects in page-tree order (catalog → /Pages → /Kids walk,
    * cycle-guarded) — empty when the file has no parsable page tree.
    * Shared by [[pageOrderedStreams]] and [[ocrTriage]]. */
  private def pageObjects(objs: Seq[PdfObject],
                          byNum: Map[Int, PdfObject]): Seq[PdfObject] = {
    def pagesOf(num: Int, depth: Int): Seq[PdfObject] =
      if (depth > 32) Seq.empty // cycle guard
      else byNum.get(num).toSeq.flatMap { o =>
        if (PageType.findFirstIn(o.body).isDefined) Seq(o)
        else KidsRe.findFirstMatchIn(o.body).toSeq.flatMap(k =>
          RefRe.findAllMatchIn(k.group(1)).map(_.group(1).toInt).toSeq
            .flatMap(pagesOf(_, depth + 1)))
      }
    val rootPagesNum = objs.iterator
      .filter(o => o.body.contains("/Type /Catalog") || o.body.contains("/Type/Catalog"))
      .flatMap(o => PagesRef.findFirstMatchIn(o.body).map(_.group(1).toInt))
      .nextOption()
      .orElse(objs.find(o => o.body.contains("/Type /Pages") || o.body.contains("/Type/Pages"))
        .map(_.num))
    rootPagesNum.map(pagesOf(_, 0)).getOrElse(Seq.empty)
  }

  /** A page's /Contents stream refs (array or single form). */
  private def pageContentRefs(p: PdfObject): Seq[Int] =
    ContentsArr.findFirstMatchIn(p.body)
      .map(m => RefRe.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq)
      .orElse(ContentsRef.findFirstMatchIn(p.body).map(m => Seq(m.group(1).toInt)))
      .getOrElse(Seq.empty)

  private def pageOrderedStreams(objs: Seq[PdfObject]): Option[Seq[(Array[Byte], Seq[LinkRect])]] = {
    val byNum = objs.map(o => o.num -> o).toMap
    val pages = pageObjects(objs, byNum)
    if (pages.isEmpty) None
    else {
      val streams = pages.flatMap { p =>
        val links = pageLinks(p, byNum)
        pageContentRefs(p).flatMap(byNum.get).flatMap(_.data)
          .map(d => (d, links))
      }
      if (streams.isEmpty) None else Some(streams)
    }
  }

  // ------------------------------------------------------------- OCR triage

  /** k9's per-document routing facts (VERDICT r11 #7): page counts a
    * 100 TB triage pass derives WITHOUT attempting text extraction, so
    * scanned/image-only documents route to an OCR lane as a filter
    * instead of a convert-fail-reparse loop. `imageOnlyPages` counts
    * pages with NO text-showing operator but at least one invocation of
    * an image XObject; `textPages` counts pages with a non-empty
    * text-show (a page with both counts as text — its words are
    * extractable; the reference's OCR path, service.py:63-70, is for
    * pages where they are not). */
  final case class OcrTriage(nPages: Int, textPages: Int,
                             imageOnlyPages: Int)

  /** A non-empty text-SHOW operator: a literal or hex string (with at
    * least one non-space / one hex digit) fed to Tj, ' or " (the
    * set-spacing-and-show form — same string operand, two numeric
    * operands before it; ADVICE r12 caught its omission misrouting
    * "-only pages to the OCR lane), or a TJ array containing one. A
    * triage heuristic by design — it never decodes fonts, so it costs
    * one regex pass per stream instead of the full extraction stack. */
  private val TextShowRe = (
    """\((?:\\.|[^\\()])*[^\s\\()](?:\\.|[^\\()])*\)\s*(?:Tj|'|")""" +
      """|<[0-9A-Fa-f][0-9A-Fa-f\s]*>\s*(?:Tj|'|")""" +
      """|\[[^\]]*?(?:\((?:\\.|[^\\()])+\)|<[0-9A-Fa-f][0-9A-Fa-f\s]*>)[^\]]*?\]\s*TJ""").r

  /** Classify every page for OCR routing. Structural only: object scan,
    * page-tree walk, per-page content-stream regex — no font decode, no
    * image decode (the image-name set keeps ALL /Subtype /Image
    * XObjects, decodable by this kernel or not — a CCITT scan still
    * needs OCR). Files without a page tree fall back to one-stream≈one-
    * page (the [[parse]] fallback's granularity). Encrypted files are
    * refused with the same honest cause as [[parse]] — their content
    * streams are ciphertext, so counting text operators in them would
    * fabricate verdicts. */
  def ocrTriage(bytes: Array[Byte]): Either[String, OcrTriage] = {
    try {
      val objs = parseObjects(bytes)
      val trailerTail = {
        val raw = new String(bytes, StandardCharsets.ISO_8859_1)
        val t = raw.lastIndexOf("trailer")
        if (t < 0) "" else raw.substring(t)
      }
      if (trailerTail.contains("/Encrypt") || objs.exists(_.body.contains("/Encrypt")))
        return Left("PDF is encrypted; decryption is not supported in this build")
      val byNum = objs.map(o => o.num -> o).toMap
      val imageNums = objs.iterator
        .filter(o => ImageSubtype.findFirstIn(o.body).isDefined)
        .map(_.num).toSet
      val imageNames: Set[String] = (for {
        o <- objs
        d <- XObjDictRe.findAllMatchIn(o.body)
        r <- FontRefRe.findAllMatchIn(d.group(1))
        if imageNums(r.group(2).toInt)
      } yield r.group(1)).toSet
      val pages = pageObjects(objs, byNum)
      val pageStreams: Seq[Seq[Array[Byte]]] =
        if (pages.nonEmpty)
          pages.map(p => pageContentRefs(p).flatMap(byNum.get).flatMap(_.data))
        else
          // no page tree: every non-image stream-bearing object is its
          // own "page" — the same granularity parse() falls back to
          objs.filter(o => o.data.isDefined &&
            ImageSubtype.findFirstIn(o.body).isEmpty &&
            FontType.findFirstIn(o.body).isEmpty)
            .map(o => o.data.toSeq)
      var text = 0
      var imgOnly = 0
      pageStreams.foreach { streams =>
        val s = streams
          .map(new String(_, StandardCharsets.ISO_8859_1)).mkString("\n")
        val hasText = TextShowRe.findFirstIn(s).isDefined
        lazy val hasImage =
          DoRe.findAllMatchIn(s).exists(m => imageNames(m.group(1)))
        if (hasText) text += 1
        else if (hasImage) imgOnly += 1
      }
      Right(OcrTriage(pageStreams.size, text, imgOnly))
    } catch {
      case e: Exception => Left(s"Invalid PDF: ${e.getMessage}")
    }
  }

  // ----------------------------------------------------------------- images

  private val WidthRe = """/Width\s+(\d+)""".r
  private val HeightRe = """/Height\s+(\d+)""".r
  private val BpcRe = """/BitsPerComponent\s+(\d+)""".r
  private val PredictorRe = """/Predictor\s+(\d+)""".r
  private val XObjDictRe = """/XObject\s*<<([^>]*)>>""".r
  private val DoRe = """/([A-Za-z0-9._]+)\s+Do(?![A-Za-z0-9])""".r

  /** Decodable embedded images, keyed by their content-stream resource name
    * (`/Im1` → PNG/JPEG bytes the kernel can hand to ImageIO):
    *  - /DCTDecode payloads ARE the embedded JPEG, shipped raw;
    *  - /FlateDecode 8-bit DeviceRGB/DeviceGray rasters (with or without
    *    the PNG row predictor, /Predictor >= 10) are reconstructed and
    *    re-encoded as PNG.
    * Everything else (CCITT, JBIG2, JPX, palette/CMYK rasters) is left out
    * — the picture is simply not emitted rather than shipping a synthetic
    * placeholder as if it were document content. */
  private def buildImages(objs: Seq[PdfObject]): Map[String, Array[Byte]] = {
    val byNum: Map[Int, Array[Byte]] = objs.flatMap { o =>
      if (ImageSubtype.findFirstIn(o.body).isEmpty) None
      else if (o.body.contains("/DCTDecode")) o.raw.map(o.num -> _)
      else if (o.body.contains("/FlateDecode")) {
        for {
          w <- WidthRe.findFirstMatchIn(o.body).map(_.group(1).toInt)
          h <- HeightRe.findFirstMatchIn(o.body).map(_.group(1).toInt)
          bpc <- BpcRe.findFirstMatchIn(o.body).map(_.group(1).toInt)
          if bpc == 8
          colors <- if (o.body.contains("/DeviceRGB")) Some(3)
                    else if (o.body.contains("/DeviceGray")) Some(1) else None
          data <- o.data
          samples = PredictorRe.findFirstMatchIn(o.body).map(_.group(1).toInt) match {
            case Some(p) if p >= 10 => unPredictPng(data, w, colors)
            case _ => data
          }
          png <- rasterToPng(samples, w, h, colors)
        } yield o.num -> png
      } else None
    }.toMap
    // resource name -> image bytes, via /XObject dicts (same one-global-
    // namespace approximation as fonts)
    val byName = Map.newBuilder[String, Array[Byte]]
    for {
      o <- objs
      d <- XObjDictRe.findAllMatchIn(o.body)
      r <- FontRefRe.findAllMatchIn(d.group(1))
      img <- byNum.get(r.group(2).toInt)
    } byName += r.group(1) -> img
    byName.result()
  }

  /** Reverse the PNG row predictor (filters 0-4 per row, PDF 32000 §7.4.4.4
    * delegating to the PNG spec): `data` is rows of (1 filter byte +
    * columns*colors sample bytes). */
  private[kernel] def unPredictPng(data: Array[Byte], columns: Int, colors: Int): Array[Byte] = {
    val rowBytes = columns * colors
    val rows = data.length / (rowBytes + 1)
    val out = new Array[Byte](rows * rowBytes)
    var r = 0
    while (r < rows) {
      val filter = data(r * (rowBytes + 1)) & 0xFF
      val src = r * (rowBytes + 1) + 1
      val dst = r * rowBytes
      var i = 0
      while (i < rowBytes) {
        val rawB = data(src + i) & 0xFF
        val left = if (i >= colors) out(dst + i - colors) & 0xFF else 0
        val up = if (r > 0) out(dst - rowBytes + i) & 0xFF else 0
        val upLeft = if (r > 0 && i >= colors) out(dst - rowBytes + i - colors) & 0xFF else 0
        val v = filter match {
          case 0 => rawB
          case 1 => rawB + left
          case 2 => rawB + up
          case 3 => rawB + (left + up) / 2
          case 4 =>
            val p = left + up - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
            rawB + pred
          case _ => rawB
        }
        out(dst + i) = (v & 0xFF).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  /** 8-bit RGB/gray samples → PNG bytes (row-major, no alpha). */
  private def rasterToPng(samples: Array[Byte], w: Int, h: Int, colors: Int): Option[Array[Byte]] = {
    if (w <= 0 || h <= 0 || samples.length < w * h * colors) return None
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    var idx = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb =
          if (colors == 3)
            ((samples(idx) & 0xFF) << 16) | ((samples(idx + 1) & 0xFF) << 8) | (samples(idx + 2) & 0xFF)
          else {
            val g = samples(idx) & 0xFF
            (g << 16) | (g << 8) | g
          }
        img.setRGB(x, y, rgb)
        idx += colors
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    Some(bos.toByteArray)
  }

  // ------------------------------------------------------------------- cmap

  /** A /ToUnicode CMap: fixed code width in bytes plus the bfchar/bfrange
    * mappings (ToUnicode destinations are UTF-16BE). */
  private[kernel] final case class CMap(codeBytes: Int, single: Map[Int, String],
                                        ranges: Seq[BfRange]) {
    def lookup(code: Int): Option[String] =
      single.get(code).orElse(ranges.iterator.flatMap(_.apply(code)).nextOption())
  }

  private[kernel] final case class BfRange(lo: Int, hi: Int,
                                           dst: Either[String, IndexedSeq[String]]) {
    def apply(code: Int): Option[String] =
      if (code < lo || code > hi) None
      else dst match {
        // continuous form increments the last UTF-16 unit (PDF 32000 §9.10.3)
        case Left(s) if s.nonEmpty => Some(s.init + (s.last + (code - lo)).toChar)
        case Right(arr) => arr.lift(code - lo)
        case _ => None
      }
  }

  private val HexTok = """<([0-9A-Fa-f]+)>""".r

  private def utf16Of(hex: String): String = {
    val unit = if (hex.length % 4 == 0) 4 else 2
    hex.grouped(unit).map(h => Integer.parseInt(h, 16).toChar).mkString
  }

  private def sections(src: String, begin: String, end: String): Iterator[String] = {
    Iterator.unfold(0) { from =>
      val b = src.indexOf(begin, from)
      if (b < 0) None
      else {
        val e = src.indexOf(end, b)
        val stop = if (e < 0) src.length else e
        Some((src.substring(b + begin.length, stop), stop + end.length))
      }
    }
  }

  private[kernel] def parseCMap(data: Array[Byte]): Option[CMap] = {
    try {
      val src = new String(data, StandardCharsets.ISO_8859_1)
      var codeBytes = 0
      for (sec <- sections(src, "begincodespacerange", "endcodespacerange");
           m <- HexTok.findFirstMatchIn(sec) if codeBytes == 0)
        codeBytes = (m.group(1).length + 1) / 2
      val single = Map.newBuilder[Int, String]
      for (sec <- sections(src, "beginbfchar", "endbfchar")) {
        val toks = HexTok.findAllMatchIn(sec).map(_.group(1)).toSeq
        toks.grouped(2).foreach {
          case Seq(s, d) =>
            if (codeBytes == 0) codeBytes = (s.length + 1) / 2
            single += Integer.parseInt(s, 16) -> utf16Of(d)
          case _ => ()
        }
      }
      val ranges = ArrayBuffer[BfRange]()
      for (sec <- sections(src, "beginbfrange", "endbfrange")) {
        // token scan: <lo> <hi> then either <dstStart> or [ <dst> <dst> ... ]
        var i = 0
        def nextHex(): Option[String] =
          HexTok.findFirstMatchIn(sec.substring(i)).map { m =>
            i += m.end
            m.group(1)
          }
        var done = false
        while (!done) {
          (nextHex(), nextHex()) match {
            case (Some(lo), Some(hi)) =>
              var j = i
              while (j < sec.length && sec.charAt(j).isWhitespace) j += 1
              val dst =
                if (j < sec.length && sec.charAt(j) == '[') {
                  val close = sec.indexOf(']', j)
                  val stop = if (close < 0) sec.length else close
                  val arr = HexTok.findAllMatchIn(sec.substring(j, stop))
                    .map(m => utf16Of(m.group(1))).toIndexedSeq
                  i = stop + 1
                  Some(Right(arr): Either[String, IndexedSeq[String]])
                } else nextHex().map(d => Left(utf16Of(d)))
              dst match {
                case Some(d) =>
                  if (codeBytes == 0) codeBytes = (lo.length + 1) / 2
                  ranges += BfRange(Integer.parseInt(lo, 16), Integer.parseInt(hi, 16), d)
                case None => done = true
              }
            case _ => done = true
          }
        }
      }
      val s = single.result()
      if (s.isEmpty && ranges.isEmpty) None
      else Some(CMap(if (codeBytes == 0) 1 else codeBytes, s, ranges.toSeq))
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------------- text

  /** One positioned text run: the text shown from one line-matrix position
    * (`Tm`/`Td` set it; consecutive shows without repositioning merge). */
  private[kernel] final case class Run(x: Double, y: Double, text: String,
                                       off: Int = -1)

  /** Elements from one content stream, in stream order: each BT..ET block
    * becomes one TextElement (with `Td`/`TD`/`T*` line breaks inside) — or,
    * when positioned runs form a clear grid, a TableElement. Two grid
    * shapes are covered (see [[detectTable]] / [[flushTextBuffer]]):
    * a whole table inside ONE block (pdftex-style), and one-BT-per-cell
    * producers where consecutive single-show blocks align into a grid.
    * `/Name Do` invocations of decodable image XObjects between text
    * blocks become PictureElements carrying the embedded bytes (and
    * break table continuity, as they must). Fonts selected by `Tf` drive
    * string decoding; a font marked Undecodable records its name in
    * `undecodable` (the caller fails the whole document). */
  /** Wrap the first run whose origin falls inside a link annotation's
    * rect (±2pt tolerance) as a markdown link — once per annotation
    * across the WHOLE stream (`consumed` threads through the blocks, so
    * a rect spanning runs in two text blocks wraps only its first).
    * Matches resolve against the ORIGINAL text and apply in ascending
    * position, so out-of-order /Annots arrays (common after incremental
    * updates) still attach to the right occurrence; two annotations
    * resolving to overlapping spans keep the first. A rect that matches
    * no run attaches nothing (never mis-texts). */
  private def applyLinks(text: String, runs: Seq[Run], links: Seq[LinkRect],
                         consumed: mutable.Set[LinkRect]): String = {
    if (links.isEmpty || runs.isEmpty) return text
    val matches = links.filterNot(consumed).flatMap { l =>
      runs.find(r => r.text.trim.nonEmpty &&
          r.x >= l.x0 - 2 && r.x <= l.x1 + 2 &&
          r.y >= l.y0 - 2 && r.y <= l.y1 + 2).flatMap { r =>
        val t = r.text.trim
        // wrap at the MATCHED run's own recorded offset (extractFromBlock
        // tracks where each run begins in the block text), so a repeated
        // word earlier in the block is never the one that gets linked;
        // runs carry the offset of their untrimmed text — step past any
        // leading whitespace to the trimmed span
        val idx =
          if (r.off >= 0) r.off + r.text.indexOf(t)
          else text.indexOf(t)
        if (idx < 0 || idx + t.length > text.length ||
            text.substring(idx, idx + t.length) != t) None
        else Some((idx, t, l))
      }
    }.sortBy(_._1)
    if (matches.isEmpty) return text
    val out = new StringBuilder
    var pos = 0
    matches.foreach { case (idx, t, l) =>
      if (idx >= pos) {
        consumed += l
        out.append(text.substring(pos, idx)).append('[').append(t).append("](")
          .append(l.uri).append(')')
        pos = idx + t.length
      }
    }
    out.append(text.substring(pos))
    out.toString
  }

  private[kernel] def extractElements(stream: Array[Byte],
                                      fonts: Map[String, FontInfo],
                                      undecodable: mutable.Set[String],
                                      images: Map[String, Array[Byte]],
                                      links: Seq[LinkRect] = Seq.empty): Seq[Element] = {
    val src = new String(stream, StandardCharsets.ISO_8859_1)
    val out = ArrayBuffer[Element]()
    val linksConsumed = mutable.Set.empty[LinkRect]
    val textBuf = ArrayBuffer[(String, Seq[Run])]() // consecutive text blocks
    def scanPictures(from: Int, until: Int): Unit =
      if (images.nonEmpty && until > from)
        for (m <- DoRe.findAllMatchIn(src.substring(from, until));
             img <- images.get(m.group(1))) {
          flushTextBuffer(textBuf, out)
          out += PictureElement(rawMedia = Some(img))
        }
    var i = 0
    while (i < src.length) {
      val bt = indexOfToken(src, "BT", i)
      if (bt < 0) { scanPictures(i, src.length); i = src.length }
      else {
        scanPictures(i, bt)
        val et = indexOfToken(src, "ET", bt + 2)
        val end = if (et < 0) src.length else et
        val (text0, runs) = extractFromBlock(src.substring(bt + 2, end), fonts, undecodable)
        // positioned-grid detection first; when every run sits at ONE x
        // (the single-origin multi-line shape detectTable is blind to),
        // try whitespace-column inference on the line text (r13)
        val singleOrigin = runs.nonEmpty &&
          runs.forall(r => math.abs(r.x - runs.head.x) <= ColTolX)
        detectTable(runs)
          .orElse(if (singleOrigin) detectWhitespaceTable(text0.trim) else None)
        match {
          case Some(t) => flushTextBuffer(textBuf, out); out += t
          case None =>
            val text = applyLinks(text0, runs, links, linksConsumed)
            if (text.trim.nonEmpty) textBuf += ((text.trim, runs))
        }
        i = end + 2
      }
    }
    flushTextBuffer(textBuf, out)
    out.toSeq
  }

  /** Flush buffered consecutive text blocks, reconstructing a cross-block
    * grid when the evidence is unambiguous — the one-BT-per-cell producer
    * shape (each cell its own BT block with one positioned show). Rules on
    * top of [[detectTable]]'s: every buffered block must carry exactly one
    * run; the band range from the first multi-run band to the last is the
    * table candidate (interior singleton bands ride along as potential
    * row-spanning cells — [[detectTable]] arbitrates), and the blocks
    * feeding that range must be contiguous in stream order;
    * leading/trailing single-run bands (title above, note below) stay
    * prose around the table. Anything else — default-position runs (all
    * one band), two separated grids, ragged evidence — falls back to the
    * per-block text form. */
  private def flushTextBuffer(buf: ArrayBuffer[(String, Seq[Run])],
                              out: ArrayBuffer[Element]): Unit = {
    if (buf.isEmpty) return
    if (buf.size >= 4 && buf.forall(_._2.size == 1)) {
      val runs = buf.map(_._2.head)
      val bands = ArrayBuffer[ArrayBuffer[Run]]()
      for (r <- runs.sortBy(-_.y)) {
        if (bands.nonEmpty && math.abs(bands.last.head.y - r.y) <= BandTolY) bands.last += r
        else bands += ArrayBuffer(r)
      }
      val multiIdx = bands.indices.filter(bands(_).size >= 2)
      // Interior SINGLETON bands may be row-spanning cells (vertically
      // centered between the rows they cover) — but only when their x
      // snaps to an x the multi-run bands repeat; an off-column interior
      // line (prose between two separated grids) vetoes the candidate as
      // the old contiguity rule did, keeping the per-block text form.
      // Snapped singletons ride along to detectTable, which arbitrates
      // centered (spanning cell) vs uncentered (sparse legacy row).
      val gridXs = multiIdx.flatMap(bands(_)).map(_.x)
      val rangeOk = multiIdx.size >= 2 &&
        (multiIdx.head to multiIdx.last).forall { i =>
          bands(i).size >= 2 ||
            bands(i).forall(r => gridXs.exists(x => math.abs(x - r.x) <= ColTolX))
        }
      if (rangeOk) {
        val tableRuns = (multiIdx.head to multiIdx.last).flatMap(bands(_))
        detectTable(tableRuns.toSeq) match {
          case Some(t) =>
            val inTable = buf.map(b => tableRuns.exists(_ eq b._2.head))
            val first = inTable.indexOf(true)
            val last = inTable.lastIndexOf(true)
            if (first >= 0 && (first to last).forall(inTable)) {
              buf.take(first).foreach(b => out += TextElement(b._1))
              out += t
              buf.drop(last + 1).foreach(b => out += TextElement(b._1))
              buf.clear()
              return
            }
          case None => ()
        }
      }
    }
    buf.foreach(b => out += TextElement(b._1))
    buf.clear()
  }

  private val BandTolY = 2.0 // same visual line when |Δy| ≤ this
  private val ColTolX = 3.0  // same column when |Δx| ≤ this
  private val WsMinGap = 2   // min shared-space run that separates columns

  /** UNRULED-table inference over aligned text LINES (VERDICT r12 #5) —
    * the whitespace-column shape the reference handles with TableFormer
    * ML (service.py:66 `do_table_structure`): a producer types the
    * whole table as plain text lines, columns aligned with runs of
    * spaces instead of `Td` positioning. [[detectTable]] is blind to it
    * (every line sits at ONE x — a single origin cluster), so this pass
    * runs on the line text itself, with [[detectTable]]'s conservative
    * evidence bar transposed to character space — a stray line vetoes,
    * prose must never reclassify:
    *  - ≥ 2 lines, none blank; the common leading indent is stripped
    *    first (indentation is layout, not a separator);
    *  - column separators are the character positions where EVERY line
    *    has whitespace (or has already ended), taken as maximal runs of
    *    width ≥ [[WsMinGap]] strictly inside the text extent — single
    *    word spaces never qualify, and one line whose text crosses a
    *    would-be gap removes that separator for all lines (the veto);
    *  - the segments between separators must give ≥ 2 columns, every
    *    line's FIRST column non-empty (ragged left edges are prose),
    *    ≥ 2 lines with ≥ 2 filled cells, and ≥ 60% of all cells filled
    *    — the same gates the positioned-grid path applies. */
  private[kernel] def detectWhitespaceTable(text: String): Option[TableElement] = {
    val raw = text.split("\n", -1).toIndexedSeq
    if (raw.size < 2 || raw.exists(_.trim.isEmpty)) return None
    val indent = raw.map(_.takeWhile(_ == ' ').length).min
    val lines = raw.map(_.substring(indent))
    val width = lines.map(_.length).max
    def isSep(p: Int): Boolean =
      lines.forall(l => p >= l.length || l.charAt(p) == ' ')
    // maximal separator runs, interior only (a run touching either edge
    // is indent/trailing space, not a column gap)
    val gaps = ArrayBuffer[(Int, Int)]()
    var p = 0
    while (p < width) {
      if (isSep(p)) {
        val start = p
        while (p < width && isSep(p)) p += 1
        if (start > 0 && p < width && p - start >= WsMinGap)
          gaps += ((start, p))
      } else p += 1
    }
    if (gaps.isEmpty) return None
    val bounds = ArrayBuffer[(Int, Int)]()
    var prevEnd = 0
    for ((a, b) <- gaps) { bounds += ((prevEnd, a)); prevEnd = b }
    bounds += ((prevEnd, width))
    val nCols = bounds.size
    if (nCols < 2) return None
    val grid = lines.map { l =>
      bounds.map { case (a, b) =>
        l.substring(math.min(a, l.length), math.min(b, l.length)).trim
      }
    }
    if (grid.exists(_.head.isEmpty)) return None
    val filled = grid.iterator.map(_.count(_.nonEmpty)).sum
    val rowsWithTwo = grid.count(_.count(_.nonEmpty) >= 2)
    if (rowsWithTwo < 2 || filled.toDouble < lines.size * nCols * 0.6)
      return None
    val cells = for {
      ri <- grid.indices
      ci <- 0 until nCols
      if grid(ri)(ci).nonEmpty
    } yield TableCellSpec(ri, ri + 1, ci, ci + 1, grid(ri)(ci),
      columnHeader = ri == 0)
    Some(TableElement(cells, lines.size, nCols))
  }

  /** Heuristic grid reconstruction from one BT block's positioned runs —
    * the no-ML path to the reference's headline capability (its README
    * benchmarks table extraction quality vs Marker/PyPDF/PyMuPDF4LLM,
    * README.md:6-18; Docling gets this from the TableFormer model stack,
    * unavailable in a pure-JVM build).
    *
    * Shape: band runs by baseline y (descending = visual top-down), then
    * cluster run x-origins into column centers. The block is a table only
    * when the evidence is unambiguous, so normal prose NEVER reclassifies:
    *  - ≥ 2 bands and ≥ 2 columns, every run snapping to a column center
    *    within tolerance (one stray run vetoes the whole block);
    *  - ≥ 2 bands showing ≥ 2 filled columns (a two-column LAYOUT — one
    *    run per line at alternating x — never qualifies);
    *  - ≥ 60% of grid cells filled.
    * Multiple runs landing in one cell join with spaces in stream order;
    * the first band is the header row (the markdown pipe-grid contract,
    * DocModel.renderTable). Covers ruled/grid tables whose producers
    * position each cell with its own Tm/Td — the common pdftex/word
    * export shape. Even row spans (2, 4 rows — text vertically centered
    * between the bands it covers) reconstruct as spanning cells; odd
    * spans and staircase layouts stay text. */
  private[kernel] def detectTable(runs: Seq[Run]): Option[TableElement] = {
    val rs = runs.filter(r => r.text.trim.nonEmpty && !r.x.isNaN && !r.y.isNaN)
    if (rs.size < 4) return None
    // band by y, top-down
    val bands = ArrayBuffer[ArrayBuffer[Run]]()
    for (r <- rs.sortBy(-_.y)) {
      if (bands.nonEmpty && math.abs(bands.last.head.y - r.y) <= BandTolY) bands.last += r
      else bands += ArrayBuffer(r)
    }
    if (bands.size < 2) return None
    // column centers from clustered x-origins across all bands
    val cols = ArrayBuffer[ArrayBuffer[Double]]()
    for (x <- rs.map(_.x).sorted) {
      if (cols.nonEmpty && x - cols.last.last <= ColTolX) cols.last += x
      else cols += ArrayBuffer(x)
    }
    def nearest(cs: IndexedSeq[Double], x: Double): Int =
      if (cs.isEmpty) -1
      else {
        val i = cs.indices.minBy(i => math.abs(cs(i) - x))
        if (math.abs(cs(i) - x) <= ColTolX) i else -1
      }
    // Best spanned sub-range [a, b) inside the neighbour bracket [c0, c1)
    // for a run whose origin is `x`: spanning text is CENTERED over its
    // columns, so pick the >= 2-wide range whose center midpoint sits
    // closest to the origin (ties prefer the wider range) — the raw
    // bracket alone over-extends when the span's own row leaves a column
    // empty just inside the bracket (e.g. a [2,4) span under an empty
    // col 1 must not become [1,4)). The origin must still fall within
    // the chosen range's center extent.
    def bestSpan(cs: IndexedSeq[Double], c0: Int, c1: Int,
                 x: Double, tol: Double = ColTolX): Option[(Int, Int)] = {
      val cands = for {
        a <- c0 until c1
        b <- (a + 2) to c1
        if x >= cs(a) - tol && x <= cs(b - 1) + tol
      } yield (a, b)
      if (cands.isEmpty) None
      else Some(cands.minBy { case (a, b) =>
        (math.abs(x - (cs(a) + cs(b - 1)) / 2), -(b - a))
      })
    }

    // True grid columns repeat their x across bands, so STRONG centers
    // (x-clusters with >= 2 members) define the grid for both span kinds.
    val strongCenters = cols.filter(_.size >= 2).map(c => c.sum / c.size).toIndexedSeq

    // Row-SPANNING cells — the symmetric signal to column spans: a cell
    // whose text is vertically CENTERED across >= 2 row bands lands
    // BETWEEN them, forming its own singleton y-band at an x the grid
    // already repeats. STRONG bands (>= 2 runs) are the row skeleton; an
    // interior singleton band's run is rowspan evidence when (a) its x
    // snaps to a strong column, (b) bestSpan over the strong-band y
    // centers (negated — bestSpan wants ascending coordinates) finds a
    // >= 2-row range bracketing its y, and (c) its y sits within BandTolY
    // of that range's midpoint — the column path's centering rule,
    // tightened to the midpoint because a rowspan run has no
    // band-neighbour corroboration. Covers the EVEN span shape (2, 4
    // rows); an odd span's center line coincides with the middle band and
    // merges into it at banding time, staying the sparse-row legacy shape.
    val strongBandIdxs = bands.indices.filter(bands(_).size >= 2)
    val strongNegYs = strongBandIdxs
      .map(i => -bands(i).map(_.y).sum / bands(i).size).toIndexedSeq
    val rowSpanPicks = mutable.Map[Int, (Run, Int, Int)]()
    if (strongBandIdxs.size >= 2 && strongCenters.size >= 2)
      for (bi <- bands.indices
           if bands(bi).size == 1 &&
             bi > strongBandIdxs.head && bi < strongBandIdxs.last) {
        val r = bands(bi).head
        if (nearest(strongCenters, r.x) >= 0)
          bestSpan(strongNegYs, 0, strongNegYs.size, -r.y, BandTolY).foreach {
            case (a, b) =>
              if (math.abs(-r.y - (strongNegYs(a) + strongNegYs(b - 1)) / 2) <= BandTolY)
                rowSpanPicks(bi) = (r, a, b)
          }
      }
    // rows = bands minus the rowspan singletons; span row ranges
    // re-indexed from strong-band positions to final row indices
    val keepIdx = bands.indices.filterNot(rowSpanPicks.contains)
    val rowIdxOf = keepIdx.zipWithIndex.toMap
    val rows = keepIdx.map(bands(_))
    val rowSpanRuns = rowSpanPicks.values.map(_._1).toSet
    val rowSpans = rowSpanPicks.values.toSeq.map { case (r, a, b) =>
      (rowIdxOf(strongBandIdxs(a)), rowIdxOf(strongBandIdxs(b - 1)) + 1, r)
    }
    if (rows.size < 2) return None

    // Column-SPANNING cells — the spanning-header shape (text centered
    // across several columns; the reference's TableFormer benchmark set
    // is full of them). A run at a one-off x is span evidence when (a)
    // its band-neighbour bracket over the strong columns covers >= 2 of
    // them, (b) its origin falls inside that bracket, and (c) it sits
    // where headers sit — beside snapped cells or in the top band. A
    // one-off run WITHOUT span evidence keeps its own column (the
    // sparse-column legacy shape) and the fill gate still arbitrates.
    val spanRuns =
      if (strongCenters.size < 2) Set.empty[Run]
      else rows.zipWithIndex.iterator.flatMap { case (band, ri) =>
        val snapped = band.filter(o => nearest(strongCenters, o.x) >= 0)
        band.filter { r =>
          nearest(strongCenters, r.x) < 0 && {
            val prevCol = snapped.filter(_.x < r.x)
              .map(o => nearest(strongCenters, o.x)).maxOption.getOrElse(-1)
            val nextCol = snapped.filter(_.x > r.x)
              .map(o => nearest(strongCenters, o.x))
              .minOption.getOrElse(strongCenters.size)
            bestSpan(strongCenters, prevCol + 1, nextCol, r.x).isDefined &&
              (snapped.nonEmpty || ri == 0)
          }
        }
      }.toSet

    // final centers: clusters of the NON-span runs (strong columns plus
    // any legacy sparse singletons)
    val cols2 = ArrayBuffer[ArrayBuffer[Double]]()
    for (x <- rs.filterNot(r => spanRuns(r) || rowSpanRuns(r)).map(_.x).sorted) {
      if (cols2.nonEmpty && x - cols2.last.last <= ColTolX) cols2.last += x
      else cols2 += ArrayBuffer(x)
    }
    val centers = cols2.map(c => c.sum / c.size).toIndexedSeq
    if (centers.size < 2) return None
    def colOf(x: Double): Int = nearest(centers, x)

    val grid = Array.fill(rows.size, centers.size)("")
    val spans = ArrayBuffer[(Int, Int, Int, String)]()
    for ((band, ri) <- rows.zipWithIndex) {
      val sorted = band.sortBy(_.x)
      for (r <- sorted) {
        if (spanRuns(r)) {
          // re-bracket against the FINAL centers (a kept singleton column
          // inside the original bracket narrows the span)
          val prevCol = sorted.filterNot(spanRuns).filter(_.x < r.x)
            .map(o => colOf(o.x)).filter(_ >= 0).maxOption.getOrElse(-1)
          val nextCol = sorted.filterNot(spanRuns).filter(_.x > r.x)
            .map(o => colOf(o.x)).filter(_ >= 0).minOption.getOrElse(centers.size)
          bestSpan(centers, prevCol + 1, nextCol, r.x) match {
            case Some((c0, c1))
                if !spans.exists(s => s._1 == ri && s._2 < c1 && c0 < s._3) =>
              spans += ((ri, c0, c1, r.text.trim))
            case _ =>
              return None // evidence fell apart: keep the text form
          }
        } else {
          val ci = colOf(r.x)
          if (ci < 0) return None // stray run: not a grid, keep the text form
          grid(ri)(ci) =
            if (grid(ri)(ci).isEmpty) r.text.trim else grid(ri)(ci) + " " + r.text.trim
        }
      }
    }
    // a span must not cover columns its own row also fills directly
    if (spans.exists { case (ri, c0, c1, _) =>
          (c0 until c1).exists(grid(ri)(_).nonEmpty) }) return None
    // a rowspan must land in a real final column, must not cover slots
    // its column fills directly or via a column span, and two rowspans
    // must not overlap — any violation means the evidence was not a
    // spanning cell after all: keep the text form
    val rowSpanCells = rowSpans.map { case (r0, r1, r) =>
      (r0, r1, colOf(r.x), r.text.trim)
    }
    if (rowSpanCells.exists { case (r0, r1, ci, _) =>
          ci < 0 || (r0 until r1).exists(grid(_)(ci).nonEmpty) ||
            spans.exists(s => r0 <= s._1 && s._1 < r1 && s._2 <= ci && ci < s._3) })
      return None
    if (rowSpanCells.combinations(2).exists { case Seq(u, v) =>
          u._3 == v._3 && u._1 < v._2 && v._1 < u._2
        case _ => false }) return None
    // grid gates: the SNAPPED runs alone must still look like a table
    // (>= 2 rows with >= 2 direct cells), so spans only ever ride on top
    // of real grid evidence and prose never reclassifies; fill counts
    // spanned slots (both kinds) as occupied.
    val filled = grid.iterator.map(_.count(_.nonEmpty)).sum +
      spans.iterator.map(s => s._3 - s._2).sum +
      rowSpanCells.iterator.map(c => c._2 - c._1).sum
    val rowsWithTwo = grid.count(_.count(_.nonEmpty) >= 2)
    if (rowsWithTwo < 2 || filled.toDouble < rows.size * centers.size * 0.6) return None
    val direct = for {
      ri <- 0 until rows.size
      ci <- 0 until centers.size
      if grid(ri)(ci).nonEmpty
    } yield TableCellSpec(ri, ri + 1, ci, ci + 1, grid(ri)(ci), columnHeader = ri == 0)
    val spanCells = spans.map { case (ri, c0, c1, text) =>
      TableCellSpec(ri, ri + 1, c0, c1, text, columnHeader = ri == 0)
    }
    val rowSpanSpecs = rowSpanCells.map { case (r0, r1, ci, text) =>
      TableCellSpec(r0, r1, ci, ci + 1, text, columnHeader = r0 == 0)
    }
    val cells = (direct ++ spanCells ++ rowSpanSpecs)
      .sortBy(c => (c.startRow, c.startCol))
    Some(TableElement(cells, rows.size, centers.size))
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

  /** Walk one BT block: collect literal strings fed to Tj/TJ/', decode
    * them through the current `Tf` font, and insert newlines at
    * Td/TD/T* operators that follow emitted text. Also returns the
    * positioned [[Run]]s (line-matrix origin per show) for
    * [[detectTable]]. Inline `<<..>>` dicts and `BI..ID..EI` inline
    * images are skipped whole — a hex-string scanner entering either
    * would emit junk bytes as text through the current font. */
  private def extractFromBlock(block: String,
                               fonts: Map[String, FontInfo],
                               undecodable: mutable.Set[String]): (String, Seq[Run]) = {
    val sb = new StringBuilder
    val runs = ArrayBuffer[(Double, Double, StringBuilder, Int)]()
    var runStale = true // next show starts a new run
    var i = 0
    var emitted = false
    var lastName = ""
    var curFontName = ""
    var curFont: Option[FontInfo] = None
    var tjDepth = 0
    // a TJ kern gap wide enough to be an inter-word space (thousandths of
    // a text-space unit; typical space widths are 200-300). LaTeX often
    // encodes word gaps as kerning instead of space characters.
    var pendingKern = false
    // last two numeric operands seen: for Tm (a b c d e f) they are the
    // origin e=x, f=y; for Td/TD they are tx, ty. pdftex-style producers
    // position each line with Tm inside one BT block, so a Tm whose y
    // differs from the previous Tm's is a line break; same-y Tm
    // (horizontal repositioning — an inline span, or a table CELL) is not
    // a line break but does start a new positioned run.
    var lastNum = 0.0
    var prevNum = 0.0
    var lastTmY = Double.NaN
    var lineX = 0.0
    var lineY = 0.0
    def newline(): Unit = {
      if (emitted && sb.nonEmpty && !sb.endsWith("\n")) sb += '\n'
      pendingKern = false
    }
    def emit(rawChars: String): Unit = {
      val decoded = curFont.map(_.dec).getOrElse(Latin1) match {
        case Latin1 => rawChars
        case ByteCharset(cs) =>
          new String(rawChars.map(_.toByte).toArray, cs)
        case CMapDec(c) =>
          rawChars.grouped(c.codeBytes).map { grp =>
            val code = grp.foldLeft(0)((acc, ch) => (acc << 8) | (ch & 0xFF))
            c.lookup(code).getOrElse("�")
          }.mkString
        case Undecodable =>
          undecodable += curFont.map(f => s"/$curFontName (${f.baseName})").getOrElse(curFontName)
          ""
      }
      val kernSpace = pendingKern && decoded.nonEmpty && !decoded.startsWith(" ") &&
        sb.nonEmpty && !sb.endsWith(" ") && !sb.endsWith("\n")
      if (kernSpace) sb += ' '
      pendingKern = false
      sb ++= decoded
      if (decoded.nonEmpty) {
        if (runStale || runs.isEmpty) {
          // record where this run's text begins in the block text, so a
          // link annotation wraps THIS occurrence even when the same
          // words appear earlier in the block (offset, not indexOf)
          runs += ((lineX, lineY, new StringBuilder, sb.length - decoded.length))
          runStale = false
        }
        val rb = runs.last._3
        if (kernSpace && rb.nonEmpty) rb += ' '
        rb ++= decoded
      }
      emitted = true
    }
    while (i < block.length) {
      block.charAt(i) match {
        case '(' =>
          val (s, next) = readLiteralString(block, i)
          emit(s)
          i = next
        case '<' if i + 1 < block.length && block.charAt(i + 1) == '<' =>
          // balanced <<..>> dict span (e.g. a BDC property list): skip whole
          var depth = 0
          var j = i
          while (j + 1 < block.length && (depth > 0 || j == i)) {
            if (block.charAt(j) == '<' && block.charAt(j + 1) == '<') { depth += 1; j += 2 }
            else if (block.charAt(j) == '>' && block.charAt(j + 1) == '>') { depth -= 1; j += 2 }
            else j += 1
          }
          i = j
        case '<' =>
          val end = block.indexOf('>', i)
          if (end > 0) {
            emit(decodeHexBytes(block.substring(i + 1, end)))
            i = end + 1
          } else i += 1
        case 'B' if indexOfToken(block, "BI", i) == i =>
          // inline image BI..ID..EI: raw binary follows ID — skip to the
          // first EI token delimited by whitespace (the standard heuristic)
          val id = indexOfToken(block, "ID", i + 2)
          var j = if (id < 0) i + 2 else id + 2
          var ei = -1
          while (ei < 0 && j < block.length - 1) {
            val k = block.indexOf("EI", j)
            if (k < 0) j = block.length
            else if ((k == 0 || block.charAt(k - 1).isWhitespace) &&
              (k + 2 >= block.length || block.charAt(k + 2).isWhitespace)) ei = k + 2
            else j = k + 1
          }
          i = if (ei < 0) block.length else ei
        case '/' =>
          val start = i + 1
          var j = start
          while (j < block.length && (block.charAt(j).isLetterOrDigit ||
            block.charAt(j) == '_' || block.charAt(j) == '.' ||
            block.charAt(j) == '+' || block.charAt(j) == '-')) j += 1
          lastName = block.substring(start, j)
          i = j
        case '[' => tjDepth += 1; i += 1
        case ']' => tjDepth = math.max(0, tjDepth - 1); i += 1
        case c if c == '-' || c.isDigit =>
          val start = i
          i += 1
          while (i < block.length &&
            (block.charAt(i).isDigit || block.charAt(i) == '.')) i += 1
          val v = block.substring(start, i).toDoubleOption.getOrElse(0.0)
          if (tjDepth > 0 && v <= -180) pendingKern = true
          prevNum = lastNum
          lastNum = v
        case 'T' if i + 1 < block.length && block.charAt(i + 1) == 'f' =>
          curFontName = lastName
          curFont = fonts.get(lastName)
          i += 2
        case 'T' if i + 1 < block.length && block.charAt(i + 1) == 'm' =>
          if (!lastTmY.isNaN && lastNum != lastTmY) newline()
          lastTmY = lastNum
          lineX = prevNum; lineY = lastNum; runStale = true
          i += 2
        case 'T' if i + 1 < block.length &&
          (block.charAt(i + 1) == 'd' || block.charAt(i + 1) == 'D') =>
          newline()
          lineX += prevNum; lineY += lastNum; runStale = true
          i += 2
        case 'T' if i + 1 < block.length && block.charAt(i + 1) == '*' =>
          newline()
          lineY -= 12.0; runStale = true // nominal leading; bands only need separation
          i += 2
        case '\'' =>
          newline()
          lineY -= 12.0; runStale = true
          i += 1
        case _ => i += 1
      }
    }
    (sb.toString, runs.map(t => Run(t._1, t._2, t._3.toString, t._4)).toSeq)
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

  /** Hex string → raw byte chars (0-255); decoding through the font's
    * charset/CMap happens in `emit`. */
  private def decodeHexBytes(hex: String): String = {
    val clean = hex.filterNot(_.isWhitespace)
    val padded = if (clean.length % 2 == 1) clean + "0" else clean
    padded.grouped(2).flatMap { h =>
      try Some(Integer.parseInt(h, 16).toChar) catch { case _: Exception => None }
    }.mkString
  }
}
