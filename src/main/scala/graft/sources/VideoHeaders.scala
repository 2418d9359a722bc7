package graft.sources

/** Video container metadata extraction — real parsing of the MP4/ISO-BMFF
  * box tree from a binary column (pure byte walking, no codec). Frame
  * DECODE has no in-container codec and stays on the operator-layer stub;
  * duration, timescale, and track info are parsed for real here — the
  * fields a corpus filter thresholds on (clip length, track presence)
  * before any expensive decode.
  *
  * Box layout: [size:u32][type:4cc][payload]; `moov/mvhd` carries
  * timescale + duration (v0: u32s at offset 12/16 of the payload; v1:
  * u64 duration), `moov/trak/mdia/hdlr` carries the handler type
  * ("vide"/"soun").
  */
object VideoHeaders {

  final case class VideoMeta(format: String, durationSec: Double,
      timescale: Long, videoTracks: Int, audioTracks: Int)

  def parse(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 16) return None
    if (!isMp4(bytes)) return None
    var timescale = 0L
    var duration = -1L
    var vide = 0
    var soun = 0
    // depth-capped: real MP4 nests moov/trak/mdia ~4 deep; a crafted
    // payload of thousands of nested container headers must return None,
    // not blow the task's stack with an uncatchable StackOverflowError
    def walk(from: Long, to: Long, depth: Int): Unit = {
      if (depth > 16) return
      var off = from
      while (off + 8 <= to) {
        val size = be32(bytes, off.toInt) & 0xffffffffL
        val boxType = typ(bytes, off.toInt + 4)
        // size==1: 64-bit largesize follows the type (legal on any box,
        // commonly mdat) — read it and SKIP this box, don't abandon the
        // siblings (moov routinely follows a large mdat)
        val headerLen = if (size == 1) 16L else 8L
        val boxEnd =
          if (size == 0) to
          else if (size == 1) {
            if (off + 16 > to) return
            val large = be64(bytes, off.toInt + 8)
            if (large < 16) return // corrupt
            math.min(off + large, to)
          } else math.min(off + size, to)
        if (size != 0 && size != 1 && size < 8) return // corrupt
        boxType match {
          case "moov" | "trak" | "mdia" =>
            walk(off + headerLen, boxEnd, depth + 1)
          case "mvhd" if size != 1 && off + 8 + 20 <= to =>
            val version = bytes(off.toInt + 8) & 0xff
            if (version == 0) {
              timescale = be32(bytes, off.toInt + 8 + 12) & 0xffffffffL
              duration = be32(bytes, off.toInt + 8 + 16) & 0xffffffffL
            } else if (off + 8 + 32 <= to) {
              timescale = be32(bytes, off.toInt + 8 + 20) & 0xffffffffL
              duration = be64(bytes, off.toInt + 8 + 24)
            }
          case "hdlr" if size != 1 && off + 8 + 12 <= to =>
            typ(bytes, off.toInt + 8 + 8) match {
              case "vide" => vide += 1
              case "soun" => soun += 1
              case _ => ()
            }
          case _ => ()
        }
        off = boxEnd
      }
    }
    walk(0L, bytes.length.toLong, 0)
    if (timescale <= 0 || duration < 0) None
    else Some(VideoMeta("mp4", duration.toDouble / timescale, timescale,
      vide, soun))
  }

  private def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && typ(b, 4) == "ftyp"

  private def typ(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) ""
    else new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i) & 0xffffffffL) << 32) | (be32(b, i + 4) & 0xffffffffL)

  /** Build a minimal valid MP4 box tree for tests: ftyp + moov(mvhd v0,
    * one trak/mdia/hdlr per handler type).
    */
  def fakeMp4(timescale: Int, duration: Int,
      handlers: Seq[String]): Array[Byte] = {
    def box(typ4: String, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + payload.length)
      val size = out.length
      out(0) = ((size >> 24) & 0xff).toByte
      out(1) = ((size >> 16) & 0xff).toByte
      out(2) = ((size >> 8) & 0xff).toByte
      out(3) = (size & 0xff).toByte
      typ4.getBytes("US-ASCII").copyToArray(out, 4)
      payload.copyToArray(out, 8)
      out
    }
    def u32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512))
    val mvhd = box("mvhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(timescale) ++ u32(duration)
        ++ Array.fill(80)(0.toByte))
    val traks = handlers.map { h =>
      val hdlr = box("hdlr",
        u32(0) ++ u32(0) ++ h.getBytes("US-ASCII")
          ++ Array.fill(13)(0.toByte))
      box("trak", box("mdia", hdlr))
    }
    ftyp ++ box("moov", mvhd ++ traks.flatten.toArray)
  }
}
