package graft.kernel

import org.scalacheck.{Gen, Prop, Properties}

import graft.kernel.DocModel._

/** ScalaCheck invariants for the markdown anchor splice (SURVEY §5.3.2):
  * generated documents of text/heading/table/picture elements with and
  * without images, rendered then spliced.
  */
object ImageSplicerProps extends Properties("ImageSplicer") {

  private val genText: Gen[String] =
    Gen.alphaNumStr.map(s => "t" + s.take(12)) // non-empty, no markdown syntax

  private val genElement: Gen[Element] = Gen.frequency(
    3 -> genText.map(TextElement(_)),
    2 -> Gen.zip(genText, Gen.chooseNum(1, 4)).map { case (t, l) => HeadingElement(t, l) },
    2 -> Gen.oneOf(true, false).map(withImage =>
      PictureElement(if (withImage) Some(Array[Byte](1, 2, 3)) else None)),
    2 -> Gen.zip(genText, genText, Gen.oneOf(true, false)).map { case (a, b, withImage) =>
      TableElement(
        Seq(TableCellSpec(0, 1, 0, 1, a, columnHeader = true),
          TableCellSpec(1, 2, 0, 1, b)),
        numRows = 2, numCols = 1,
        imagePng = if (withImage) Some(Array[Byte](9, 8, 7)) else None)
    })

  private val genDoc: Gen[Seq[Element]] = Gen.listOfN(8, genElement).map(_.toSeq)

  private def run(items: Seq[Element]) = {
    val md = DocModel.renderMarkdown(DocTree("doc", items))
    val (out, images) = ImageSplicer.splice(md, items)
    (md, out, images)
  }

  property("one emitted image per element that carries one, in document order") =
    Prop.forAll(genDoc) { items =>
      val (_, _, images) = run(items)
      val expected = items.collect {
        case t: TableElement if t.imagePng.isDefined => "table"
        case p: PictureElement if p.imagePng.isDefined => "picture"
      }
      images.map(_.imageType) == expected
    }

  property("per-type counters are dense 1..n in emission order") =
    Prop.forAll(genDoc) { items =>
      val (_, _, images) = run(items)
      Seq("table", "picture").forall { t =>
        val names = images.filter(_.imageType == t).map(_.filename)
        names == (1 to names.size).map(i => s"$t-$i.png")
      }
    }

  property("each emitted image filename appears exactly once in the spliced markdown") =
    Prop.forAll(genDoc) { items =>
      val (_, out, images) = run(items)
      // generated docs always render a findable anchor per imaged element,
      // so every image splices (the no-anchor case is covered by the
      // ported unit tests)
      images.forall { img =>
        out.sliding(img.filename.length).count(_ == img.filename) == 1
      }
    }

  property("markdown length grows by exactly the splice deltas") =
    Prop.forAll(genDoc) { items =>
      val (md, out, images) = run(items)
      // picture: placeholder replaced by name; table: "\n\n" + name appended
      val delta = images.map { img =>
        if (img.imageType == "picture") img.filename.length - ImagePlaceholder.length
        else img.filename.length + 2
      }.sum
      out.length == md.length + delta
    }

  property("elements without images leave the markdown untouched") =
    Prop.forAll(genDoc) { items =>
      val noImages = items.map {
        case t: TableElement => t.copy(imagePng = None)
        case p: PictureElement => p.copy(imagePng = None)
        case e => e
      }
      val (md, out, images) = run(noImages)
      images.isEmpty && out == md
    }
}
