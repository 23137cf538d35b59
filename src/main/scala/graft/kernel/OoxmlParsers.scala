package graft.kernel

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable.ArrayBuffer

import graft.kernel.DocModel._

/** Pure-JVM DOCX/PPTX parsers — zip container + StAX over the OOXML parts
  * (ECMA-376 part names: `word/document.xml`, `ppt/slides/slideN.xml`).
  *
  * The reference treats docx/pptx as first-class Docling inputs
  * (document_converter/utils.py:27-47); this build extracts the text
  * skeleton — headings (w:pStyle Heading*), paragraphs, tables
  * (w:tbl/a:tbl grids), pictures (w:drawing / w:pict / p:pic) — without
  * layout models. Cell spans (w:gridSpan) are flattened to single cells.
  * Everything emits into the same DocTree the md/html/csv parsers use, so
  * splice/counters/serialization downstream are shared.
  */
object OoxmlParsers {

  private val MaxEntryBytes = 64 << 20 // zip-bomb guard per part

  /** Read selected entries of a zip (by predicate on the entry name). */
  private[kernel] def zipEntries(bytes: Array[Byte],
                                 want: String => Boolean): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory && want(e.getName)) {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = zis.read(chunk)
          while (n >= 0 && buf.size <= MaxEntryBytes) {
            buf.write(chunk, 0, n); n = zis.read(chunk)
          }
          if (buf.size <= MaxEntryBytes) out += e.getName -> buf.toByteArray
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.result()
  }

  private def newReader(bytes: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  private def attr(r: XMLStreamReader, local: String): Option[String] =
    (0 until r.getAttributeCount)
      .find(i => r.getAttributeLocalName(i) == local)
      .map(r.getAttributeValue)

  private def tableFrom(rows: Seq[Seq[String]]): Option[TableElement] = {
    val nonEmpty = rows.filter(_.nonEmpty)
    if (nonEmpty.isEmpty) None
    else {
      val nCols = nonEmpty.map(_.length).max
      val cells = nonEmpty.zipWithIndex.flatMap { case (row, ri) =>
        row.padTo(nCols, "").zipWithIndex.map { case (c, ci) =>
          TableCellSpec(ri, ri + 1, ci, ci + 1, c, columnHeader = ri == 0)
        }
      }
      Some(TableElement(cells, nonEmpty.length, nCols))
    }
  }

  private val HeadingStyle = "Heading(\\d)".r

  /** DOCX: StAX walk of word/document.xml. Headings via w:pStyle
    * (Heading1..9 or Title), body paragraphs, depth-1 tables, pictures
    * (emitted after their paragraph's text, in document order). */
  object DocxParser extends FormatParser {
    private val RelsPart = "word/_rels/document.xml.rels"

    def parse(name: String, bytes: Array[Byte]): Either[String, DocTree] = {
      val parts = zipEntries(bytes,
        n => n == "word/document.xml" || n == RelsPart)
      parts.get("word/document.xml") match {
        case None => Left("Invalid DOCX: missing word/document.xml")
        case Some(xml) =>
          try {
            val rels = parts.get(RelsPart).map(parseRels).getOrElse(Map.empty)
            Right(DocTree(name, parseDocumentXml(xml, rels)))
          } catch { case e: Exception => Left(s"Invalid DOCX: ${e.getMessage}") }
      }
    }

    /** relationship id → target URL (for w:hyperlink resolution). */
    private def parseRels(xml: Array[Byte]): Map[String, String] = {
      val r = newReader(xml)
      val out = Map.newBuilder[String, String]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
          for (id <- attr(r, "Id"); target <- attr(r, "Target"))
            out += id -> target
        }
      }
      r.close()
      out.result()
    }

    private def parseDocumentXml(xml: Array[Byte],
                                 rels: Map[String, String]): Seq[Element] = {
      val r = newReader(xml)
      val items = ArrayBuffer[Element]()

      var tblDepth = 0
      val tableRows = ArrayBuffer[ArrayBuffer[String]]()
      val cellBuf = new StringBuilder

      // paragraph content as (text, bold, italic) run segments — rendered
      // to markdown emphasis at paragraph end (adjacent same-format
      // segments merge first, so Word's arbitrary run splits don't leak
      // as `**bo****ld**`)
      val paraSegs = ArrayBuffer[(String, Boolean, Boolean)]()
      var runBold = false
      var runItalic = false
      var insideRun = false
      var hyperStart = 0
      var hyperHref: Option[String] = None
      var paraStyle: Option[String] = None
      var paraPictures = 0
      var paraIsListItem = false
      val pendingList = ArrayBuffer[String]()

      def renderSegs(): String = {
        val merged = ArrayBuffer[(StringBuilder, Boolean, Boolean)]()
        paraSegs.foreach { case (t, b, i) =>
          merged.lastOption match {
            case Some((sb, lb, li)) if lb == b && li == i => sb ++= t
            case _ => merged += ((new StringBuilder(t), b, i))
          }
        }
        paraSegs.clear()
        merged.map { case (sb, b, i) =>
          val t = sb.toString
          val marker = (b, i) match {
            case (true, true) => "***"
            case (true, false) => "**"
            case (false, true) => "*"
            case _ => ""
          }
          if (marker.isEmpty || t.trim.isEmpty) t
          else {
            val lead = t.takeWhile(_.isWhitespace)
            val trail = t.reverse.takeWhile(_.isWhitespace).reverse
            lead + marker + t.trim + marker + trail
          }
        }.mkString
      }

      def flushPendingList(): Unit = {
        // numbering format needs numbering.xml resolution; all numPr
        // paragraphs render as bullets (documented approximation)
        if (pendingList.nonEmpty) items += ListElement(pendingList.toSeq)
        pendingList.clear()
      }

      def endParagraph(): Unit = {
        val text = renderSegs().trim
        if (text.nonEmpty) {
          if (paraIsListItem) pendingList += text
          else {
            flushPendingList()
            val el = paraStyle match {
              case Some("Title") => HeadingElement(text, 1)
              case Some(HeadingStyle(lvl)) => HeadingElement(text, lvl.toInt)
              case _ => TextElement(text)
            }
            items += el
          }
        }
        if (paraPictures > 0) flushPendingList()
        (0 until paraPictures).foreach(_ => items += PictureElement(None))
        paraPictures = 0
        paraStyle = None
        paraIsListItem = false
      }

      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "tbl" =>
                if (tblDepth == 0) flushPendingList()
                tblDepth += 1
              case "tr" if tblDepth == 1 => tableRows += ArrayBuffer[String]()
              case "tc" if tblDepth == 1 => cellBuf.clear()
              case "pStyle" if tblDepth == 0 =>
                paraStyle = attr(r, "val")
              case "numPr" if tblDepth == 0 =>
                paraIsListItem = true
              case "drawing" | "pict" if tblDepth == 0 =>
                paraPictures += 1
              case "hyperlink" if tblDepth == 0 =>
                hyperStart = paraSegs.length
                hyperHref = attr(r, "id").flatMap(rels.get)
              case "r" if tblDepth == 0 =>
                insideRun = true; runBold = false; runItalic = false
              // OOXML boolean props: absent val = on, "0"/"false" = off
              case "b" if insideRun =>
                runBold = !attr(r, "val").exists(v => v == "0" || v == "false")
              case "i" if insideRun =>
                runItalic = !attr(r, "val").exists(v => v == "0" || v == "false")
              case "t" =>
                val text = r.getElementText
                if (tblDepth >= 1) cellBuf ++= text
                else paraSegs += ((text, runBold, runItalic))
              case "tab" if tblDepth == 0 => paraSegs += ((" ", false, false))
              case "br" if tblDepth == 0 => paraSegs += ((" ", false, false))
              case _ => ()
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "r" => insideRun = false
              case "hyperlink" if tblDepth == 0 =>
                hyperHref.foreach { url =>
                  val text = paraSegs.drop(hyperStart).map(_._1).mkString.trim
                  paraSegs.remove(hyperStart, paraSegs.length - hyperStart)
                  if (text.nonEmpty) paraSegs += ((s"[$text]($url)", false, false))
                }
                hyperHref = None
              case "p" if tblDepth == 0 => endParagraph()
              case "p" if tblDepth >= 1 => // paragraph break inside a cell
                if (cellBuf.nonEmpty && !cellBuf.endsWith(" ")) cellBuf += ' '
              case "tc" if tblDepth == 1 =>
                if (tableRows.nonEmpty) tableRows.last += cellBuf.toString.trim
              case "tbl" =>
                tblDepth -= 1
                if (tblDepth == 0) {
                  tableFrom(tableRows.map(_.toSeq).toSeq).foreach(items += _)
                  tableRows.clear()
                }
              case _ => ()
            }
          case _ => ()
        }
      }
      r.close()
      flushPendingList()
      items.toSeq
    }
  }

  /** PPTX: slides in ppt/slides/slideN.xml, N ascending. Title-placeholder
    * shapes become level-1 headings, body paragraphs text, a:tbl grids
    * tables, p:pic pictures. */
  object PptxParser extends FormatParser {
    private val SlideName = "ppt/slides/slide(\\d+)\\.xml".r

    def parse(name: String, bytes: Array[Byte]): Either[String, DocTree] = {
      val slides = zipEntries(bytes, n => SlideName.pattern.matcher(n).matches())
      if (slides.isEmpty) return Left("Invalid PPTX: no ppt/slides/*.xml parts")
      val ordered = slides.toSeq
        .map { case (n, b) => val SlideName(i) = n: @unchecked; (i.toInt, b) }
        .sortBy(_._1)
      try Right(DocTree(name, ordered.flatMap { case (_, xml) => parseSlideXml(xml) }))
      catch { case e: Exception => Left(s"Invalid PPTX: ${e.getMessage}") }
    }

    private def parseSlideXml(xml: Array[Byte]): Seq[Element] = {
      val r = newReader(xml)
      val items = ArrayBuffer[Element]()

      var inTable = false
      val tableRows = ArrayBuffer[ArrayBuffer[String]]()
      val cellBuf = new StringBuilder

      var shapeIsTitle = false
      val paraBuf = new StringBuilder
      val shapeParas = ArrayBuffer[String]()
      var runBold = false
      var runItalic = false

      def endShape(): Unit = {
        val paras = shapeParas.filter(_.nonEmpty).toSeq
        shapeParas.clear()
        if (shapeIsTitle) paras.foreach(items += HeadingElement(_, 1))
        // PowerPoint body placeholders are bulleted by default: multi-
        // paragraph body shapes render as a bullet list, single
        // paragraphs as plain text
        else if (paras.size > 1) items += ListElement(paras)
        else paras.foreach(items += TextElement(_))
        shapeIsTitle = false
      }

      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "ph" =>
                if (attr(r, "type").exists(t => t == "title" || t == "ctrTitle"))
                  shapeIsTitle = true
              case "tbl" => inTable = true
              case "tr" if inTable => tableRows += ArrayBuffer[String]()
              case "tc" if inTable => cellBuf.clear()
              case "pic" => items += PictureElement(None)
              case "rPr" => // DrawingML run props are ATTRIBUTES: b="1" i="1"
                runBold = attr(r, "b").exists(v => v == "1" || v == "true")
                runItalic = attr(r, "i").exists(v => v == "1" || v == "true")
              case "t" =>
                val text = r.getElementText
                if (inTable) cellBuf ++= text
                else {
                  val marker = (runBold, runItalic) match {
                    case (true, true) => "***"
                    case (true, false) => "**"
                    case (false, true) => "*"
                    case _ => ""
                  }
                  if (marker.nonEmpty && text.trim.nonEmpty)
                    paraBuf ++= s"$marker${text.trim}$marker"
                  else paraBuf ++= text
                  runBold = false; runItalic = false
                }
              case _ => ()
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "p" =>
                if (inTable) {
                  if (cellBuf.nonEmpty && !cellBuf.endsWith(" ")) cellBuf += ' '
                } else {
                  shapeParas += paraBuf.toString.trim
                  paraBuf.clear()
                }
              case "tc" if inTable =>
                if (tableRows.nonEmpty) tableRows.last += cellBuf.toString.trim
              case "tbl" =>
                inTable = false
                tableFrom(tableRows.map(_.toSeq).toSeq).foreach(items += _)
                tableRows.clear()
              case "sp" => endShape()
              case _ => ()
            }
          case _ => ()
        }
      }
      r.close()
      endShape() // stray paragraphs outside any sp
      items.toSeq
    }
  }
}
