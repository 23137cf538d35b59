package graft.kernel

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.DocModel._

/** Ports the reference's tests/test_document_images.py — the two tests that
  * pin the splice semantics (interleaving order, per-type numbering, and the
  * imageless-anchor invariant) — plus splice invariant properties.
  */
class ImageSplicerSpec extends AnyFunSuite {

  private def png(rgb: Int): Array[Byte] = {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 2; y <- 0 until 2) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def table(heading: String, value: String, image: Option[Array[Byte]]): TableElement =
    TableElement(
      cells = Seq(
        TableCellSpec(0, 1, 0, 1, heading, columnHeader = true),
        TableCellSpec(1, 2, 0, 1, value)),
      numRows = 2, numCols = 1, imagePng = image)

  // reference: test_table_and_picture_references_follow_document_order
  test("table and picture references follow document order") {
    val items = Seq(
      table("First_heading", "First", Some(png(0xFF0000))),
      PictureElement(Some(png(0x0000FF))),
      table("Second heading", "Second", Some(png(0x00FF00))),
      PictureElement(Some(png(0xFFFF00))))
    val doc = DocTree("mixed-images", items)
    val original = renderMarkdown(doc)

    val (markdown, images) = ImageSplicer.splice(original, items)

    // independently derived expectation, same construction as the reference test
    val tableRefs = items.collect { case t: TableElement => renderTable(t) }
    var expected = original
    expected = expected.replaceFirst(
      java.util.regex.Pattern.quote(tableRefs(0)),
      java.util.regex.Matcher.quoteReplacement(s"${tableRefs(0)}\n\ntable-1.png"))
    expected = expected.replaceFirst(
      java.util.regex.Pattern.quote(ImagePlaceholder), "picture-1.png")
    expected = expected.replaceFirst(
      java.util.regex.Pattern.quote(tableRefs(1)),
      java.util.regex.Matcher.quoteReplacement(s"${tableRefs(1)}\n\ntable-2.png"))
    expected = expected.replaceFirst(
      java.util.regex.Pattern.quote(ImagePlaceholder), "picture-2.png")

    assert(markdown == expected)
    assert(images.map(i => (i.imageType, i.filename)) == Seq(
      ("table", "table-1.png"),
      ("picture", "picture-1.png"),
      ("table", "table-2.png"),
      ("picture", "picture-2.png")))
  }

  // reference: test_picture_without_image_does_not_consume_a_later_picture_reference
  test("picture without image does not consume a later picture reference") {
    val items = Seq(PictureElement(None), PictureElement(Some(png(0x0000FF))))
    val doc = DocTree("missing-picture", items)
    val original = renderMarkdown(doc)
    assert(original == s"$ImagePlaceholder\n\n$ImagePlaceholder")

    val (markdown, images) = ImageSplicer.splice(original, items)

    assert(markdown == s"$ImagePlaceholder\n\npicture-1.png")
    assert(images.map(_.filename) == Seq("picture-1.png"))
  }

  test("images are emitted even when no anchor is found") {
    val items = Seq(PictureElement(Some(png(0x123456))))
    val (markdown, images) = ImageSplicer.splice("no placeholder here", items)
    assert(markdown == "no placeholder here")
    assert(images.map(_.filename) == Seq("picture-1.png"))
  }

  test("splice invariants: each image name appears exactly once; counters per type") {
    val items = Seq(
      PictureElement(Some(png(1))), table("h", "v", Some(png(2))),
      PictureElement(None), PictureElement(Some(png(3))))
    val md = renderMarkdown(DocTree("d", items))
    val (out, images) = ImageSplicer.splice(md, items)
    images.foreach { i =>
      assert(out.sliding(i.filename.length).count(_ == i.filename) == 1)
    }
    assert(images.map(_.filename) == Seq("picture-1.png", "table-1.png", "picture-2.png"))
    // markdown grows by exactly the inserted names (+ table separators)
    val growth = images.map {
      i => if (i.imageType == "table") i.filename.length + 2 else i.filename.length - ImagePlaceholder.length
    }.sum
    assert(out.length == md.length + growth)
  }
}
