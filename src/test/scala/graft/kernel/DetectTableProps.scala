package graft.kernel

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import PdfParser.Run

/** Property pins for the grid/span reconstruction heuristic
  * (PdfParser.detectTable): randomized grids must reconstruct with every
  * cell in place, a planted spanning header must come back as ONE cell
  * with the right extent, and prose-shaped runs must NEVER reclassify —
  * the conservative-evidence contract the markdown pipeline rests on.
  */
object DetectTableProps extends Properties("DetectTable") {

  private val colXs = IndexedSeq(72.0, 160.0, 250.0, 340.0)
  private def bandY(ri: Int): Double = 700.0 - 14.0 * ri

  property("full random grids reconstruct every cell at its coordinates") =
    Prop.forAll(Gen.choose(2, 6), Gen.choose(2, 4)) { (nRows, nCols) =>
      val runs = for {
        ri <- 0 until nRows; ci <- 0 until nCols
      } yield Run(colXs(ci), bandY(ri), s"c$ri$ci")
      val t = PdfParser.detectTable(runs).get
      t.numRows == nRows && t.numCols == nCols &&
        t.cells.size == nRows * nCols &&
        t.cells.forall(c =>
          c.text == s"c${c.startRow}${c.startCol}" &&
            c.endRow == c.startRow + 1 && c.endCol == c.startCol + 1)
    }

  property("a planted header span over >= 2 columns comes back as one cell") = {
    val gen = for {
      // >= 2 body rows so every column is a STRONG (repeated-x) cluster;
      // with a single body row the columns are singletons and the span
      // heuristic rightly refuses to engage
      nRows <- Gen.choose(3, 6)
      nCols <- Gen.choose(3, 4)
      spanFrom <- Gen.choose(1, nCols - 2) // col 0 stays a snapped label
    } yield (nRows, nCols, spanFrom)
    Prop.forAll(gen) { case (nRows, nCols, spanFrom) =>
      // shrinker guard: ScalaCheck shrinks tuples outside the generator
      // domain; discard those instead of failing on them
      (nRows >= 3 && nCols >= 3 && nCols <= colXs.size &&
        spanFrom >= 1 && spanFrom <= nCols - 2) ==> {
      // body rows form the full grid; row 0 has the label plus one run
      // centered across cols [spanFrom, nCols) — nudged off the exact
      // midpoint, which for a wide span can land ON a middle column
      val mid = (colXs(spanFrom) + colXs(nCols - 1)) / 2 + 7
      val header = Seq(Run(colXs(0), bandY(0), "label"),
        Run(mid, bandY(0), "SPAN"))
      val body = for {
        ri <- 1 until nRows; ci <- 0 until nCols
      } yield Run(colXs(ci), bandY(ri), s"c$ri$ci")
      val t = PdfParser.detectTable(header ++ body).get
      val span = t.cells.find(_.text == "SPAN").get
      t.numCols == nCols &&
        span.startRow == 0 && span.endRow == 1 &&
        span.startCol == spanFrom && span.endCol == nCols &&
        t.cells.count(c => c.endCol - c.startCol > 1) == 1
      }
    }
  }

  property("left-aligned prose paragraphs never reclassify as tables") =
    Prop.forAll(Gen.choose(4, 12)) { nLines =>
      val runs = (0 until nLines).map(i => Run(72.0, bandY(i), s"line $i"))
      PdfParser.detectTable(runs).isEmpty
    }

  property("ragged indents (quotes, list markers) never reclassify") =
    Prop.forAll(Gen.listOfN(8, Gen.choose(0.0, 120.0))) { offsets =>
      val runs = offsets.zipWithIndex.map { case (dx, i) =>
        Run(72.0 + dx, bandY(i), s"line $i")
      }
      PdfParser.detectTable(runs).isEmpty
    }

  property("a lone unaligned run below the grid is never a span (footnote rule)") =
    Prop.forAll(Gen.choose(2, 5), Gen.choose(90.0, 140.0)) { (nRows, fx) =>
      val grid = for {
        ri <- 0 until nRows; ci <- 0 until 2
      } yield Run(colXs(ci), bandY(ri), s"c$ri$ci")
      val footnote = Run(fx, bandY(nRows), "footnote")
      val t = PdfParser.detectTable(grid :+ footnote)
      // either rejected outright, or (when fx snaps near a column) the
      // run lands as a normal cell — but NEVER as a span
      t.forall(_.cells.forall(c => c.endCol - c.startCol == 1))
    }
}
