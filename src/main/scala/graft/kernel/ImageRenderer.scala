package graft.kernel

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

/** Deterministic placeholder PNG rendering for picture/table elements.
  *
  * The reference renders real page crops via Docling's layout models and
  * PIL (service.py:106-128, `generate_picture_images=True` default at
  * service.py:67, `generate_table_images=extract_tables` at :61,
  * `images_scale=image_resolution_scale` at :60). This zero-egress JVM
  * build has no layout models, so the pixel content is an honest
  * placeholder — but the full image pipeline around it (per-request
  * config, scale-dependent dimensions, per-type counters, markdown splice,
  * PNG encode, base64) is real and pinned by ConvertKernelSpec.
  *
  * Pixel content is pure setRGB arithmetic (no fonts/antialiasing), so the
  * PNG bytes are identical across JVMs for a given (dims, grid) input.
  */
object ImageRenderer {

  // In-memory streams only: the default ImageIO disk cache writes a temp
  // file per encode/decode, which serializes executor-parallel image work
  // on filesystem churn.
  ImageIO.setUseCache(false)

  /** Base picture dimensions at scale 1; the reference's images_scale
    * multiplies rendered resolution the same way. */
  val PictureBaseW = 64
  val PictureBaseH = 48

  /** Cell size for table renders at scale 1. */
  val CellW = 24
  val CellH = 12

  private val MaxDim = 4096 // cap adversarial row/col counts

  // Picture bytes are a pure function of scale (4 legal values) — memoize
  // so kernel rows with many pictures don't re-encode identical PNGs.
  private val pictureCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()

  def renderPicture(scale: Int): Array[Byte] =
    pictureCache.computeIfAbsent(scale, s =>
      encode(fill(PictureBaseW * s, PictureBaseH * s, border = true, grid = None)))

  /** Decode a document-embedded image (any JVM ImageIO codec — png, jpeg,
    * gif, bmp, wbmp), scale its native dimensions by the request's
    * images_scale (the reference multiplies rendered resolution the same
    * way, service.py:60), and re-encode as PNG — the reference ships
    * document pictures as PNG base64 (service.py:106-128). Returns None
    * when the bytes aren't a decodable raster (e.g. wmf/emf vector parts,
    * which need codecs outside the base JVM) — callers fall back to the
    * placeholder. Alpha is preserved (ARGB) so transparent PNGs round-trip. */
  def renderEmbedded(raw: Array[Byte], scale: Int): Option[Array[Byte]] =
    try {
      val src = ImageIO.read(new java.io.ByteArrayInputStream(raw))
      if (src == null) None
      else {
        val w = math.min(MaxDim, math.max(1, src.getWidth * scale))
        val h = math.min(MaxDim, math.max(1, src.getHeight * scale))
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
        val g = out.createGraphics()
        try g.drawImage(src, 0, 0, w, h, null) finally g.dispose()
        Some(encode(out))
      }
    } catch { case _: Exception => None }

  def renderTable(numRows: Int, numCols: Int, scale: Int): Array[Byte] = {
    val w = math.min(MaxDim, math.max(1, numCols) * CellW * scale)
    val h = math.min(MaxDim, (math.max(1, numRows) + 1) * CellH * scale)
    encode(fill(w, h, border = true, grid = Some((CellW * scale, CellH * scale))))
  }

  private def fill(w: Int, h: Int, border: Boolean, grid: Option[(Int, Int)]): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val white = 0xFFFFFF
    val gray = 0x808080
    val row = new Array[Int](w)
    val (cw, ch) = grid.getOrElse((0, 0))
    var y = 0
    while (y < h) {
      val rowLine = (border && (y == 0 || y == h - 1)) || (ch > 0 && y % ch == 0)
      var x = 0
      while (x < w) {
        val line = rowLine || (border && (x == 0 || x == w - 1)) || (cw > 0 && x % cw == 0)
        row(x) = if (line) gray else white
        x += 1
      }
      img.setRGB(0, y, w, 1, row, 0, w) // bulk raster write, not per-pixel
      y += 1
    }
    img
  }

  private def encode(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
