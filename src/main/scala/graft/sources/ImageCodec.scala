package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real image decode/encode on the JDK's built-in codecs (javax.imageio —
  * PNG, JPEG, BMP, GIF; part of java.desktop, no external dependency).
  * Pixel layout matches [[graft.operators.PixelOps]]: H×W×3 BGR row-major
  * bytes, the reference's working format (`jigsaw/io_utils.py:28-41` reads
  * BGR via cv2).
  *
  * This replaces the deterministic stub for formats the JDK ships codecs
  * for; [[graft.operators.Multimodal.decodeStub]] remains for payloads
  * with no in-container codec (video/audio frames).
  */
object ImageCodec {

  /** Decode encoded image bytes → (width, height, BGR pixels). None for
    * null/undecodable payloads (callers keep SQL null semantics).
    */
  def decodeBgr(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.isEmpty) return None
    // NonFatal around the WHOLE decode, not just the read: JDK image
    // plugins throw unchecked exceptions on corrupt/truncated payloads
    // (CMMException, IllegalArgumentException, IndexOutOfBoundsException),
    // and a header that parses with absurd claimed dimensions makes the
    // w*h*3 allocation below throw (NegativeArraySizeException on Int
    // overflow, OutOfMemoryError is fatal and NOT caught) while getRGB's
    // color-model conversion can throw on broken ICC profiles — one bad
    // image must yield null fields, not fail the whole Spark task
    try decodeBgrUnsafe(bytes)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodeBgrUnsafe(
      bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Byte](w * h * 3)
      if (img.getColorModel.getNumComponents == 1) {
        // single-channel images (class-id masks): read RAW raster samples —
        // getRGB would gamma-map linear gray to sRGB (7 → 46), corrupting
        // class ids. >8-bit samples (16-bit depth masks) keep their HIGH
        // byte (the standard display downscale), never the low-byte
        // truncation '& 0xff' would silently produce.
        val raster = img.getRaster
        val bits = raster.getSampleModel.getSampleSize(0)
        val shift = math.max(bits - 8, 0)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          raster.getSamples(0, y, w, 1, 0, row)
          var x = 0
          while (x < w) {
            val g = ((row(x) >> shift) & 0xff).toByte
            val i = (y * w + x) * 3
            out(i) = g; out(i + 1) = g; out(i + 2) = g
            x += 1
          }
          y += 1
        }
      } else {
        // bulk one-pass read: per-pixel getRGB(x, y) does bounds checks +
        // color-model conversion per call and dominates decode CPU at
        // corpus scale
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        var p = 0
        while (p < rgb.length) {
          val v = rgb(p)
          val i = p * 3
          out(i) = (v & 0xff).toByte // B
          out(i + 1) = ((v >> 8) & 0xff).toByte // G
          out(i + 2) = ((v >> 16) & 0xff).toByte // R
          p += 1
        }
      }
      Some((w, h, out))
    }
  }

  /** Encode a single-channel byte grid (e.g. class-id masks) as an 8-bit
    * grayscale PNG — the deeplab `image/segmentation/class/encoded` wire
    * format.
    */
  def encodeGrayPng(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h,
      s"expected ${w * h} gray bytes, got ${gray.length}")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, gray(y * w + x) & 0xff); x += 1 }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Bilinear resize of a BGR pixel buffer (JDK Graphics2D — the real
    * form of the [[graft.operators.Multimodal.fitWithin]] dimension math).
    * Returns the new BGR buffer.
    */
  def resizeBilinear(w: Int, h: Int, bgr: Array[Byte], newW: Int,
      newH: Int): Array[Byte] = {
    require(newW > 0 && newH > 0, "target dimensions must be positive")
    val src = toIntRgb(w, h, bgr)
    val dst = new java.awt.image.BufferedImage(newW, newH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, newW, newH, null)
    } finally g.dispose()
    val rgb = dst.getRGB(0, 0, newW, newH, null, 0, newW)
    val out = new Array[Byte](newW * newH * 3)
    var p = 0
    while (p < rgb.length) {
      val v = rgb(p)
      val i = p * 3
      out(i) = (v & 0xff).toByte
      out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte
      p += 1
    }
    out
  }

  private def toIntRgb(w: Int, h: Int,
      bgr: Array[Byte]): java.awt.image.BufferedImage = {
    require(bgr.length == w * h * 3,
      s"expected ${w * h * 3} BGR bytes, got ${bgr.length}")
    val rgb = new Array[Int](w * h)
    var p = 0
    while (p < rgb.length) {
      val i = p * 3
      rgb(p) = ((bgr(i + 2) & 0xff) << 16) |
        ((bgr(i + 1) & 0xff) << 8) | (bgr(i) & 0xff)
      p += 1
    }
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, rgb, 0, w) // bulk, not per-pixel setRGB
    img
  }

  /** Encode BGR pixels as PNG bytes (lossless — round-trips exactly). */
  def encodePng(w: Int, h: Int, bgr: Array[Byte]): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(toIntRgb(w, h, bgr), "png", baos)
    baos.toByteArray
  }
}
