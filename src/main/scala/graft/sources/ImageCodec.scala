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
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Byte](w * h * 3)
      // single-channel images (class-id masks): read RAW raster samples —
      // getRGB would gamma-map linear gray to sRGB (7 → 46), corrupting
      // class ids. Color images go through getRGB's packed-ARGB path.
      val isGray = img.getColorModel.getNumComponents == 1
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = (y * w + x) * 3
          if (isGray) {
            val g = (raster.getSample(x, y, 0) & 0xff).toByte
            out(i) = g; out(i + 1) = g; out(i + 2) = g
          } else {
            val rgb = img.getRGB(x, y)
            out(i) = (rgb & 0xff).toByte // B
            out(i + 1) = ((rgb >> 8) & 0xff).toByte // G
            out(i + 2) = ((rgb >> 16) & 0xff).toByte // R
          }
          x += 1
        }
        y += 1
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
    require(bgr.length == w * h * 3,
      s"expected ${w * h * 3} BGR bytes, got ${bgr.length}")
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        src.setRGB(x, y, ((bgr(i + 2) & 0xff) << 16) |
          ((bgr(i + 1) & 0xff) << 8) | (bgr(i) & 0xff))
        x += 1
      }
      y += 1
    }
    val dst = new java.awt.image.BufferedImage(newW, newH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, newW, newH, null)
    } finally g.dispose()
    val out = new Array[Byte](newW * newH * 3)
    y = 0
    while (y < newH) {
      var x = 0
      while (x < newW) {
        val rgb = dst.getRGB(x, y)
        val i = (y * newW + x) * 3
        out(i) = (rgb & 0xff).toByte
        out(i + 1) = ((rgb >> 8) & 0xff).toByte
        out(i + 2) = ((rgb >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode BGR pixels as PNG bytes (lossless — round-trips exactly). */
  def encodePng(w: Int, h: Int, bgr: Array[Byte]): Array[Byte] = {
    require(bgr.length == w * h * 3,
      s"expected ${w * h * 3} BGR bytes, got ${bgr.length}")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        val rgb = ((bgr(i + 2) & 0xff) << 16) |
          ((bgr(i + 1) & 0xff) << 8) | (bgr(i) & 0xff)
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }
}
