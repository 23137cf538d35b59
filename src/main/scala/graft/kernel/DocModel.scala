package graft.kernel

/** Engine-internal document model — the analog of the reference's
  * intermediate document tree (SURVEY.md §1.2; reference:
  * document_converter/service.py:84-107 consumes TableItem/PictureItem
  * nodes with optional images, plus the markdown export of the whole tree).
  *
  * The tree is an ordered sequence of block elements; serialization to
  * markdown is a pure fold in document order.
  */
object DocModel {

  /** One table cell with row/col spans (reference:
    * tests/test_document_images.py:22-41 pins this shape). */
  final case class TableCellSpec(
      startRow: Int, endRow: Int,
      startCol: Int, endCol: Int,
      text: String,
      columnHeader: Boolean = false)

  sealed trait Element
  final case class HeadingElement(text: String, level: Int) extends Element
  final case class TextElement(text: String) extends Element
  /** `levels` (parallel to `items`, empty = all level 0) carries nesting
    * depth — DOCX `w:ilvl`, etc. Markdown indents nested items two spaces
    * per level with per-level counters for ordered lists; json exports the
    * levels array; text/doctags flatten. */
  final case class ListElement(items: Seq[String], ordered: Boolean = false,
                               levels: Seq[Int] = Seq.empty) extends Element
  final case class TableElement(
      cells: Seq[TableCellSpec], numRows: Int, numCols: Int,
      imagePng: Option[Array[Byte]] = None) extends Element
  /** `imagePng` is the final attached render (set by the kernel per request
    * config); `rawMedia` carries the document's embedded image bytes as
    * extracted from the container (e.g. `word/media/…`, `ppt/media/…`) in
    * whatever codec the document used — the kernel decodes/scales/re-encodes
    * them to PNG, falling back to a placeholder when absent or undecodable. */
  final case class PictureElement(imagePng: Option[Array[Byte]] = None,
                                  rawMedia: Option[Array[Byte]] = None) extends Element

  final case class DocTree(name: String, items: Seq[Element])

  val ImagePlaceholder = "<!-- image -->"

  /** Render one table to a markdown pipe-grid. Spanned cells repeat into
    * every covered grid position; the first grid row is the header row. */
  def renderTable(t: TableElement): String = {
    val grid = Array.fill(t.numRows, t.numCols)("")
    t.cells.foreach { c =>
      for (r <- c.startRow until math.min(c.endRow, t.numRows);
           col <- c.startCol until math.min(c.endCol, t.numCols))
        grid(r)(col) = c.text
    }
    def row(cells: Array[String]): String = cells.mkString("| ", " | ", " |")
    if (t.numRows == 0 || t.numCols == 0) ""
    else {
      val header = row(grid(0))
      val sep = (0 until t.numCols).map(_ => "---").mkString("|", "|", "|")
      val body = (1 until t.numRows).map(r => row(grid(r)))
      (header +: sep +: body).mkString("\n")
    }
  }

  /** Whole-tree markdown with image placeholders (the reference's
    * export_to_markdown(image_mode=PLACEHOLDER) analog). Blocks join with
    * a blank line. */
  def renderMarkdown(doc: DocTree): String =
    doc.items.map(renderElement).filter(_.nonEmpty).mkString("\n\n")

  /** Ranged export of a single element (the reference's
    * from_element/to_element re-render used as the table splice anchor). */
  def renderElement(e: Element): String = e match {
    case HeadingElement(text, level) => ("#" * math.max(1, level)) + " " + text
    case TextElement(text)           => text
    case ListElement(items, ordered, levels) =>
      val lvls = if (levels.size == items.size) levels else items.map(_ => 0)
      val counters = scala.collection.mutable.Map.empty[Int, Int]
      items.lazyZip(lvls).map { (it, lvl) =>
        val indent = "  " * math.max(0, lvl)
        if (ordered) {
          val n = counters.getOrElse(lvl, 0) + 1
          counters(lvl) = n
          counters.keys.filter(_ > lvl).toSeq.foreach(counters -= _) // deeper runs restart
          s"$indent$n. $it"
        } else s"$indent- $it"
      }.mkString("\n")
    case t: TableElement             => renderTable(t)
    case _: PictureElement           => ImagePlaceholder
  }
}
