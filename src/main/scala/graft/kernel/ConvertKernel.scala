package graft.kernel

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.ingest.{FormatDetection, Transcode}

/** The conversion map kernel (SURVEY.md O8-O16): the reference's
  * DoclingDocumentConversion.convert / convert_batch
  * (document_converter/service.py:133-188), Spark-first.
  *
  * Executed as `Dataset.mapPartitions` — one parser-registry touch per
  * partition (the per-executor lazy-singleton pattern replacing the
  * reference's per-build model preload, Dockerfile:45-51), NEVER a per-row
  * udf. Where the reference's `convert_all` loops documents sequentially in
  * one worker (service.py:171-186), partitions here convert in parallel —
  * a strict improvement with identical per-row semantics. One deliberate
  * deviation: CSV charset transcode runs in batch mode too (the reference
  * only calls handle_csv_file on the single path, service.py:145-150, so
  * its batch path would feed raw cp1252 bytes to the parser) — documented
  * as an improvement, like the stem/full-filename asymmetry below.
  *
  * Error handling is error-as-column: a failed parse is a result row with
  * `error` set (service.py:153-155, :180-183), executors never throw on
  * data errors.
  */
object ConvertKernel {

  /** Engine-facing upload row (FIXTURES.md §B). */
  final case class UploadRow(path: String, filename: String, content: Array[Byte], length: Long)

  final case class ImageData(`type`: String, filename: String, image: String)

  final case class ConversionResult(
      filename: String,
      markdown: String,
      images: Seq[ImageData],
      error: String)

  /** Immutable per-request options (reference `_build_pipeline_options`,
    * service.py:57-61 — the deep-copy isolation the reference regression-
    * tests is impossible-by-construction here). Scale clamp [1,4] mirrors
    * route.py:46-51. `outputFormat` selects the serializer for the result's
    * content column — the reference declares the same enum (md, json, text,
    * doctags; utils.py:20-24) but wires only markdown; markdown stays the
    * default here for wire parity. Anchor splicing of image filenames only
    * rewrites markdown output (the anchors are markdown constructs); other
    * formats still carry the full images array with identical counters. */
  final case class ConversionConfig(
      extractTablesAsImages: Boolean = false,
      imageResolutionScale: Int = 4,
      outputFormat: String = "md") {
    require(imageResolutionScale >= 1 && imageResolutionScale <= 4,
      "image_resolution_scale must be in [1,4]")
    require(OutputSerializers.byFormat.contains(outputFormat),
      s"output_format must be one of ${OutputSerializers.byFormat.keys.toSeq.sorted.mkString(", ")}")
    /** The reference's per-request copy-with-overrides, as a pure copy. */
    def withOverrides(extractTables: Boolean, scale: Int): ConversionConfig =
      copy(extractTablesAsImages = extractTables, imageResolutionScale = scale)
  }

  /** Per-executor parser registry: initialized once per JVM on first
    * partition touch (lazy val), shared across tasks — the analog of the
    * reference's preloaded model cache. */
  object ParserPool {
    lazy val parsers: Map[String, FormatParser] = Parsers.byFormat
  }

  /** filename stem, reference's `conv_res.input.file.stem`. */
  private[kernel] def stem(filename: String): String = {
    val base = filename.split("/").last
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  /** Public stem accessor for composed pipelines (same semantics). */
  def stemOf(filename: String): String = stem(filename)

  /** Convert one document. `batchMode` reproduces the reference's (sic)
    * asymmetry: parse errors report the full filename in batch mode
    * (service.py:182) but the stem in single mode (service.py:155). */
  def convertOne(filename: String, content: Array[Byte],
                 config: ConversionConfig = ConversionConfig(),
                 batchMode: Boolean = false): ConversionResult = {
    val errorName = if (batchMode) filename else stem(filename)
    try {
      FormatDetection.guessFormat(content, filename) match {
        case None =>
          ConversionResult(errorName, null, Seq.empty,
            s"Unsupported file format: $filename")
        case Some(format) =>
          var bytes = content
          if (FormatDetection.isCsvFile(filename)) {
            val t = Transcode.transcodeCsv(content)
            t.error match {
              case Some(err) =>
                // transcode failure reports the full filename (service.py:146-148)
                return ConversionResult(filename, null, Seq.empty, err)
              case None => bytes = t.utf8Bytes
            }
          }
          ParserPool.parsers(format).parse(filename, bytes) match {
            case Left(err) => ConversionResult(errorName, null, Seq.empty, err)
            case Right(tree) =>
              // Attach rendered images per request config, mirroring the
              // reference's pipeline options: pictures always
              // (generate_picture_images=True, service.py:67), tables only
              // when extract_tables_as_images (service.py:61), dimensions
              // scaled by images_scale (service.py:60). Pictures whose
              // container carried real embedded bytes (word/media/…,
              // ppt/media/…) ship the document's actual pixels, scaled and
              // re-encoded PNG (service.py:106-128); only undecodable or
              // absent media falls back to the placeholder render.
              val items = tree.items.map {
                case p: DocModel.PictureElement if p.imagePng.isEmpty =>
                  val png = p.rawMedia
                    .flatMap(ImageRenderer.renderEmbedded(_, config.imageResolutionScale))
                    .getOrElse(ImageRenderer.renderPicture(config.imageResolutionScale))
                  p.copy(imagePng = Some(png))
                case t: DocModel.TableElement if config.extractTablesAsImages && t.imagePng.isEmpty =>
                  t.copy(imagePng = Some(ImageRenderer.renderTable(
                    t.numRows, t.numCols, config.imageResolutionScale)))
                case e => e
              }
              val rendered = OutputSerializers.byFormat(config.outputFormat)
                .serialize(DocModel.DocTree(tree.name, items))
              // splice rewrites markdown anchors only; in other formats the
              // anchors never match, so content passes through and the
              // images array still accumulates with the same counters
              val (content_out, images) = ImageSplicer.splice(rendered, items)
              ConversionResult(stem(filename), content_out,
                images.map(i => ImageData(i.imageType, i.filename, i.base64Png)), null)
          }
      }
    } catch {
      case e: Exception =>
        ConversionResult(errorName, null, Seq.empty,
          s"Conversion failed: ${e.getMessage}")
    }
  }

  /** The distributed kernel: partitions convert independently and in
    * parallel. Column-prune before calling this — only (filename, content)
    * are needed (SURVEY.md §4: never drag BinaryType through stages that
    * don't need it). */
  def convert(docs: Dataset[UploadRow], config: ConversionConfig = ConversionConfig(),
              batchMode: Boolean = false): Dataset[ConversionResult] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      val pool = ParserPool.parsers // one registry touch per partition
      require(pool.nonEmpty)
      it.map(row => convertOne(row.filename, row.content, config, batchMode))
    }
  }

  /** Sync-single semantics (service.py:195-199): error escalates as an
    * exception at the API layer instead of an error row. */
  def convertDocumentOrThrow(filename: String, content: Array[Byte],
                             config: ConversionConfig = ConversionConfig()): ConversionResult = {
    val r = convertOne(filename, content, config)
    if (r.error != null) throw new RuntimeException(r.error)
    r
  }
}
