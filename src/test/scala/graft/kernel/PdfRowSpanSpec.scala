package graft.kernel

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.ConvertKernel.convertOne
import graft.kernel.DocModel.TableCellSpec
import PdfParser.Run

/** Row-spanning table cells (VERDICT r6 next-round #4) — the symmetric
  * signal to the column-span machinery: a cell whose text is vertically
  * CENTERED across >= 2 row bands lands between them as its own singleton
  * y-band at an x the grid already repeats. The reference's showcase set
  * (README.md:6-18) is table-fidelity comparisons where merged cells are
  * the differentiator; these pins cover detection, the conservative
  * negative space (uncentered runs stay the sparse-row legacy shape), and
  * the span flowing through all four output serializers.
  */
class PdfRowSpanSpec extends AnyFunSuite {

  private def pdf(streams: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write("%PDF-1.4\n".getBytes(StandardCharsets.ISO_8859_1))
    streams.zipWithIndex.foreach { case (content, i) =>
      val payload = content.getBytes(StandardCharsets.ISO_8859_1)
      bos.write(
        s"${i + 4} 0 obj\n<< /Length ${payload.length} >>\nstream\n"
          .getBytes(StandardCharsets.ISO_8859_1))
      bos.write(payload)
      bos.write("\nendstream\nendobj\n".getBytes(StandardCharsets.ISO_8859_1))
    }
    bos.write("%%EOF\n".getBytes(StandardCharsets.ISO_8859_1))
    bos.toByteArray
  }

  // Header row at y=700, data rows at 686 and 672; the col-0 cell spans
  // both data rows, its run vertically centered between them at y=679.
  private val rowSpanContent =
    "BT " +
      "1 0 0 1 72 700 Tm (Dept) Tj 1 0 0 1 200 700 Tm (Qty) Tj 1 0 0 1 300 700 Tm (Price) Tj " +
      "1 0 0 1 200 686 Tm (3) Tj 1 0 0 1 300 686 Tm (1.50) Tj " +
      "1 0 0 1 72 679 Tm (Fruit) Tj " +
      "1 0 0 1 200 672 Tm (12) Tj 1 0 0 1 300 672 Tm (0.75) Tj " +
      "ET"

  private val spannedMarkdown =
    "| Dept | Qty | Price |\n|---|---|---|\n| Fruit | 3 | 1.50 |\n| Fruit | 12 | 0.75 |"

  test("a vertically centered run reconstructs as a 2-row spanning cell") {
    val runs = Seq(
      Run(72, 700, "Dept"), Run(200, 700, "Qty"), Run(300, 700, "Price"),
      Run(200, 686, "3"), Run(300, 686, "1.50"),
      Run(72, 679, "Fruit"),
      Run(200, 672, "12"), Run(300, 672, "0.75"))
    val t = PdfParser.detectTable(runs).get
    assert(t.numRows == 3 && t.numCols == 3)
    val span = t.cells.find(c => c.endRow > c.startRow + 1).get
    assert(span == TableCellSpec(1, 3, 0, 1, "Fruit"))
    // every other cell is a plain 1x1
    assert(t.cells.filterNot(_ == span).forall(c =>
      c.endRow == c.startRow + 1 && c.endCol == c.startCol + 1))
  }

  test("single-BT rowspan fixture renders the span into both markdown rows") {
    val r = convertOne("span.pdf", pdf(Seq(rowSpanContent)))
    assert(r.error == null, String.valueOf(r.error))
    assert(r.markdown == spannedMarkdown)
  }

  test("one-BT-per-cell producers reconstruct the same rowspan across blocks") {
    // the cross-block grid path (flushTextBuffer): each cell its own BT
    // block; the spanning cell's singleton band sits INTERIOR to the
    // multi-run band range and must ride along to detectTable
    val blocks = Seq(
      "BT 1 0 0 1 72 700 Tm (Dept) Tj ET",
      "BT 1 0 0 1 200 700 Tm (Qty) Tj ET",
      "BT 1 0 0 1 300 700 Tm (Price) Tj ET",
      "BT 1 0 0 1 200 686 Tm (3) Tj ET",
      "BT 1 0 0 1 300 686 Tm (1.50) Tj ET",
      "BT 1 0 0 1 72 679 Tm (Fruit) Tj ET",
      "BT 1 0 0 1 200 672 Tm (12) Tj ET",
      "BT 1 0 0 1 300 672 Tm (0.75) Tj ET")
    val r = convertOne("blocks.pdf", pdf(Seq(blocks.mkString(" "))))
    assert(r.error == null, String.valueOf(r.error))
    assert(r.markdown == spannedMarkdown)
  }

  test("the spanning cell flows through all four serializers") {
    def out(fmt: String): String = {
      val r = convertOne("span.pdf", pdf(Seq(rowSpanContent)),
        ConvertKernel.ConversionConfig(outputFormat = fmt))
      assert(r.error == null, s"$fmt: ${String.valueOf(r.error)}")
      r.markdown
    }
    assert(out("md") == spannedMarkdown)
    // text: tab grid repeats the spanned text into every covered row
    assert(out("text") ==
      "Dept\tQty\tPrice\nFruit\t3\t1.50\nFruit\t12\t0.75")
    // json: the cell appears ONCE, anchored at its start position
    val json = out("json")
    assert(json.contains(""""num_rows":3,"num_cols":3"""))
    assert(json.split("""\{"row":1,"col":0,"text":"Fruit"""", -1).length == 2)
    // doctags: the span-aware row render repeats the cell in rows 1 and 2
    val tags = out("doctags")
    assert(tags.split("<cell>Fruit</cell>", -1).length == 3)
  }

  test("a 4-row even span centered over the middle band gap reconstructs") {
    // header + 4 data rows; the col-0 cell spans all 4, its run centered
    // between rows 2 and 3 (y=665, midpoint of 672 and 658) — bestSpan
    // must pick the full (1,5) range by the ties-prefer-wider rule
    val runs = Seq(
      Run(72, 700, "Group"), Run(200, 700, "Qty"), Run(300, 700, "Price"),
      Run(200, 686, "1"), Run(300, 686, "1.10"),
      Run(200, 672, "2"), Run(300, 672, "2.20"),
      Run(72, 665, "All"),
      Run(200, 658, "3"), Run(300, 658, "3.30"),
      Run(200, 644, "4"), Run(300, 644, "4.40"))
    val t = PdfParser.detectTable(runs).get
    assert(t.numRows == 5 && t.numCols == 3)
    val span = t.cells.find(c => c.endRow > c.startRow + 1).get
    assert(span == TableCellSpec(1, 5, 0, 1, "All"))
  }

  test("a rowspan in a MIDDLE column reconstructs with neighbours intact") {
    val runs = Seq(
      Run(72, 700, "A"), Run(200, 700, "B"), Run(300, 700, "C"),
      Run(72, 686, "a1"), Run(300, 686, "c1"),
      Run(200, 679, "mid"),
      Run(72, 672, "a2"), Run(300, 672, "c2"))
    val t = PdfParser.detectTable(runs).get
    assert(t.numRows == 3 && t.numCols == 3)
    val span = t.cells.find(c => c.endRow > c.startRow + 1).get
    assert(span == TableCellSpec(1, 3, 1, 2, "mid"))
    assert(DocModel.renderTable(t) ==
      "| A | B | C |\n|---|---|---|\n| a1 | mid | c1 |\n| a2 | mid | c2 |")
  }

  test("a column span and a row span coexist in one grid") {
    // top band: a one-off-x header centered over cols 1-2 (colspan);
    // data rows: col-0 cell vertically centered over both rows (rowspan)
    val runs = Seq(
      Run(72, 700, "Key"), Run(250, 700, "Both"), // 250 = center of 200/300
      Run(200, 686, "b1"), Run(300, 686, "c1"),
      Run(72, 679, "k"),
      Run(200, 672, "b2"), Run(300, 672, "c2"))
    val t = PdfParser.detectTable(runs).get
    assert(t.numRows == 3 && t.numCols == 3)
    val colSpan = t.cells.find(c => c.endCol > c.startCol + 1).get
    assert(colSpan == TableCellSpec(0, 1, 1, 3, "Both", columnHeader = true))
    val rowSpan = t.cells.find(c => c.endRow > c.startRow + 1).get
    assert(rowSpan == TableCellSpec(1, 3, 0, 1, "k"))
  }

  test("an UNCENTERED interior singleton stays the sparse-row legacy shape") {
    // same grid but the col-0 run at y=682: 4pt from the midpoint (679),
    // beyond BandTolY — no span; it keeps its own row, and the 8/12-filled
    // 4-row grid still passes the legacy gates as a sparse table
    val content =
      "BT " +
        "1 0 0 1 72 700 Tm (Dept) Tj 1 0 0 1 200 700 Tm (Qty) Tj 1 0 0 1 300 700 Tm (Price) Tj " +
        "1 0 0 1 200 686 Tm (3) Tj 1 0 0 1 300 686 Tm (1.50) Tj " +
        "1 0 0 1 72 682 Tm (Fruit) Tj " +
        "1 0 0 1 200 672 Tm (12) Tj 1 0 0 1 300 672 Tm (0.75) Tj " +
        "ET"
    val r = convertOne("uncentered.pdf", pdf(Seq(content)))
    assert(r.error == null, String.valueOf(r.error))
    assert(r.markdown ==
      "| Dept | Qty | Price |\n|---|---|---|\n|  | 3 | 1.50 |\n| Fruit |  |  |\n|  | 12 | 0.75 |")
  }

  test("prose between two separated grids still never reclassifies") {
    // the flushTextBuffer relaxation must not merge two grids across an
    // interior prose line at an off-column x: detectTable's stray-run
    // veto restores the per-block text form
    val blocks = Seq(
      "BT 1 0 0 1 72 700 Tm (A) Tj ET",
      "BT 1 0 0 1 200 700 Tm (B) Tj ET",
      "BT 1 0 0 1 72 686 Tm (C) Tj ET",
      "BT 1 0 0 1 200 686 Tm (D) Tj ET",
      "BT 1 0 0 1 120 660 Tm (interlude prose) Tj ET",
      "BT 1 0 0 1 72 640 Tm (E) Tj ET",
      "BT 1 0 0 1 200 640 Tm (F) Tj ET",
      "BT 1 0 0 1 72 626 Tm (G) Tj ET",
      "BT 1 0 0 1 200 626 Tm (H) Tj ET")
    val r = convertOne("twogrids.pdf", pdf(Seq(blocks.mkString(" "))))
    assert(r.error == null, String.valueOf(r.error))
    assert(!r.markdown.contains("| interlude prose"))
    assert(r.markdown.contains("interlude prose"))
  }
}
