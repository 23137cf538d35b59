package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * m1: the fixture corpus has no real image/audio bytes, so the payload is
  * the UTF-8 encoding of `documents.text` and the "decode" a deterministic
  * fake — what's verified is the BinaryType flow and metadata extraction.
  * m2 goes further: javax.imageio IS a real JVM codec, so deterministic
  * PNGs are decoded, measured and resized for real inside mapPartitions,
  * with the oracle recomputing the expected measurements independently.
  * Audio/video frame-sampling would slot into the same batch shape.
  */
object Multimodal {

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "m1_binary_metadata",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .withColumn("payload", encode($"text", "UTF-8"))
          .select(
            $"doc_id",
            octet_length($"payload").cast("long").as("n_bytes"),
            ascii(substring($"text", 1, 1)).cast("long").as("magic_byte"),
            // deterministic fake "decode": pretend dimensions from size
            (octet_length($"payload") % 640).cast("long").as("fake_width"),
            (octet_length($"payload") % 480).cast("long").as("fake_height"),
            (octet_length($"payload") / 100 + 1).cast("long").as("fake_frames"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS magic_byte,
               CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
               CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_height,
               CAST(octet_length(encode(text)) // 100 + 1 AS BIGINT) AS fake_frames
        FROM documents ORDER BY doc_id""")),

    // ----------------------------------------------------------------- m2
    // REAL image decode/feature-extract/resize: per doc, a deterministic
    // PNG payload (ImageRenderer, scale = doc_id%4+1) flows through an
    // actual JVM codec — ImageIO decode, Graphics2D half-resize, magic
    // check — inside mapPartitions (per-partition batch, binary in/out;
    // the exact shape a libjpeg/ffmpeg decoder slots into at 100 TB).
    // The oracle verifies the DECODED measurements independently: the
    // renderer's dimension contract is a pure function of doc_id, so
    // DuckDB recomputes what ImageIO must observe.
    QuerySpec(
      "m2_image_decode_meta",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents").select($"doc_id").as[Long]
          .mapPartitions { it =>
            // payload render memoized per partition (4 distinct scales);
            // the decode/resize below still runs per row — that's the
            // operator under test
            val rendered = scala.collection.mutable.Map.empty[Int, Array[Byte]]
            it.map { id =>
              val scale = (id % 4 + 1).toInt
              val png = rendered.getOrElseUpdate(scale,
                graft.kernel.ImageRenderer.renderPicture(scale))
              val isPng = png.length > 8 &&
                png(0) == 0x89.toByte && png(1) == 'P' && png(2) == 'N' && png(3) == 'G'
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
              val half = new java.awt.image.BufferedImage(
                img.getWidth / 2, img.getHeight / 2,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = half.createGraphics()
              g.drawImage(img, 0, 0, half.getWidth, half.getHeight, null)
              g.dispose()
              (id, isPng, img.getWidth.toLong, img.getHeight.toLong,
                half.getWidth.toLong, half.getHeight.toLong)
            }
          }
          .toDF("doc_id", "is_png", "width", "height", "half_width", "half_height")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               TRUE AS is_png,
               CAST(64 * (doc_id % 4 + 1) AS BIGINT) AS width,
               CAST(48 * (doc_id % 4 + 1) AS BIGINT) AS height,
               CAST(32 * (doc_id % 4 + 1) AS BIGINT) AS half_width,
               CAST(24 * (doc_id % 4 + 1) AS BIGINT) AS half_height
        FROM documents ORDER BY doc_id"""))
  )
}
