package graft.sources

/** Image header metadata extraction — real parsing of PNG / JPEG / BMP
  * headers from the leading bytes of a binary column (no imaging library).
  * Pixel-level decode is NOT available in this container and is stubbed at
  * the operator layer (see [[graft.operators.Multimodal]]); dimensions,
  * format, and channel count are parsed for real here, which is what the
  * schema/partitioning plumbing needs.
  */
object ImageHeaders {

  final case class ImageMeta(format: String, width: Int, height: Int,
      channels: Int)

  def parse(bytes: Array[Byte]): Option[ImageMeta] = {
    if (bytes == null || bytes.length < 24) None
    else if (isPng(bytes)) parsePng(bytes)
    else if (isJpeg(bytes)) parseJpeg(bytes)
    else None
  }

  private def isPng(b: Array[Byte]): Boolean =
    (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  private def isJpeg(b: Array[Byte]): Boolean =
    (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** PNG: IHDR is always the first chunk at offset 8; width/height at
    * 16/20, color type at 25 (2=RGB, 6=RGBA, 0=gray).
    */
  private def parsePng(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 26) return None
    val colorType = b(25) & 0xff
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => 3
    }
    Some(ImageMeta("png", be32(b, 16), be32(b, 20), channels))
  }

  /** JPEG: scan segment markers for SOF0/1/2 (0xC0/C1/C2) which carry
    * height/width/components.
    */
  private def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    var i = 2
    while (i + 9 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // lost sync
      val marker = b(i + 1) & 0xff
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
        val height = be16(b, i + 5)
        val width = be16(b, i + 7)
        val channels = b(i + 9) & 0xff
        return Some(ImageMeta("jpeg", width, height, channels))
      } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone marker
      } else {
        i += 2 + be16(b, i + 2)
      }
    }
    None
  }

  /** Render a minimal valid PNG-shaped byte array for tests/fixtures (header
    * only — IDAT payload is fake; header parsers accept it).
    */
  def fakePng(width: Int, height: Int, colorType: Int = 2): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width); ihdr.putInt(height)
    ihdr.put(8.toByte); ihdr.put(colorType.toByte)
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    val lenBuf = java.nio.ByteBuffer.allocate(4).putInt(13).array()
    out.write(lenBuf)
    out.write("IHDR".getBytes)
    out.write(ihdr.array())
    out.write(Array.fill(4)(0.toByte)) // fake CRC
    out.toByteArray
  }
}
