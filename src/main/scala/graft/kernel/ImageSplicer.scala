package graft.kernel

import java.util.Base64

import graft.kernel.DocModel._

/** Markdown anchor splice — the reference's `_process_document_images`
  * (document_converter/service.py:72-131), the one genuinely order-sensitive,
  * non-relational operator in the pipeline (SURVEY.md O12/O13/O15).
  *
  * Semantics reproduced exactly (pinned by tests/test_document_images.py):
  *  - forward-scan cursor over the markdown; each table/picture element's
  *    anchor is searched from the cursor, never from 0;
  *  - table anchor = the element's own ranged markdown render; picture
  *    anchor = the image placeholder;
  *  - element WITH image: table → image filename appended after the anchor,
  *    picture → anchor replaced by the filename; cursor advances past the
  *    replacement; the image is emitted even when no anchor was found;
  *  - element WITHOUT image: no splice, but the cursor still advances past
  *    its anchor ("skip-but-advance") so it cannot consume a later
  *    element's anchor;
  *  - per-type counters (table-N.png / picture-N.png) increment only for
  *    elements that carry an image, in document order.
  */
object ImageSplicer {

  final case class SplicedImage(imageType: String, filename: String, base64Png: String)

  def splice(contentMd: String, items: Seq[Element]): (String, Seq[SplicedImage]) = {
    var md = contentMd
    var cursor = 0
    var tableCounter = 0
    var pictureCounter = 0
    val images = Seq.newBuilder[SplicedImage]

    items.foreach {
      case el @ (_: TableElement | _: PictureElement) =>
        val isTable = el.isInstanceOf[TableElement]
        val reference = el match {
          case t: TableElement => renderTable(t)
          case _               => ImagePlaceholder
        }
        val referenceIndex =
          if (reference.nonEmpty) md.indexOf(reference, cursor) else -1
        val image = el match {
          case t: TableElement   => t.imagePng
          case p: PictureElement => p.imagePng
          case _                 => None
        }

        image match {
          case None =>
            if (referenceIndex >= 0) cursor = referenceIndex + reference.length

          case Some(png) =>
            val (imageType, imageName) =
              if (isTable) { tableCounter += 1; ("table", s"table-$tableCounter.png") }
              else { pictureCounter += 1; ("picture", s"picture-$pictureCounter.png") }

            if (referenceIndex >= 0) {
              val replacement =
                if (isTable) s"$reference\n\n$imageName" else imageName
              val referenceEnd = referenceIndex + reference.length
              md = md.substring(0, referenceIndex) + replacement + md.substring(referenceEnd)
              cursor = referenceIndex + replacement.length
            }
            images += SplicedImage(imageType, imageName,
              Base64.getEncoder.encodeToString(png))
        }

      case _ => () // non-image elements are not anchors
    }
    (md, images.result())
  }
}
