package graft.sources

import java.io.{DataOutputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

/** TFRecord framing (public TensorFlow format, no TF dependency):
  *
  *   uint64 length (LE) | uint32 masked_crc32c(length) |
  *   byte data[length]  | uint32 masked_crc32c(data)
  *
  * with masked_crc = rotr32(crc, 15) + 0xa282ead8. Reference behavior:
  * `jigsaw/write_dataset.py:178-198` writes these via tf.io;
  * here the framing is hand-rolled on java.util.zip.CRC32C.
  */
object TFRecord {

  private val Mask = 0xa282ead8L

  def maskedCrc32c(bytes: Array[Byte]): Int = {
    val crc = new CRC32C()
    crc.update(bytes)
    val c = crc.getValue // unsigned 32-bit in a long
    val rot = ((c >>> 15) | (c << 17)) & 0xffffffffL
    ((rot + Mask) & 0xffffffffL).toInt
  }

  /** Frame one record into a TFRecord entry. */
  def frame(data: Array[Byte]): Array[Byte] = {
    val lenBuf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(data.length.toLong).array()
    val out = ByteBuffer.allocate(8 + 4 + data.length + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(lenBuf)
    out.putInt(maskedCrc32c(lenBuf))
    out.put(data)
    out.putInt(maskedCrc32c(data))
    out.array()
  }

  def writeRecord(os: OutputStream, data: Array[Byte]): Unit =
    os.write(frame(data))

  /** Read back all records (for tests / round-trip verification). Validates
    * both CRCs; throws on corruption.
    */
  def readAll(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[Array[Byte]]
    while (buf.remaining() > 0) {
      val lenBuf = new Array[Byte](8)
      buf.get(lenBuf)
      val lenCrc = buf.getInt()
      require(lenCrc == maskedCrc32c(lenBuf), "length CRC mismatch")
      val len = ByteBuffer.wrap(lenBuf).order(ByteOrder.LITTLE_ENDIAN)
        .getLong().toInt
      val data = new Array[Byte](len)
      buf.get(data)
      val dataCrc = buf.getInt()
      require(dataCrc == maskedCrc32c(data), "data CRC mismatch")
      out += data
    }
    out.result()
  }
}

/** Minimal protobuf wire-format writer for tf.train.Example — the only
  * message shapes the exporters need (SURVEY.md W2-W5), so no protobuf
  * dependency. Wire format per the public protobuf encoding spec:
  *
  *   Example  { Features features = 1 }
  *   Features { map<string, Feature> feature = 1 }
  *   Feature  { oneof { BytesList bytes_list = 1; FloatList float_list = 2;
  *                      Int64List int64_list = 3 } }
  *   BytesList { repeated bytes value = 1 }
  *   FloatList { repeated float value = 1 [packed] }
  *   Int64List { repeated int64 value = 1 [packed] }
  */
object TFExample {

  sealed trait FeatureValue
  final case class BytesFeature(values: Seq[Array[Byte]]) extends FeatureValue
  final case class FloatFeature(values: Seq[Float]) extends FeatureValue
  final case class Int64Feature(values: Seq[Long]) extends FeatureValue

  object FeatureValue {
    def bytes(s: String): BytesFeature =
      BytesFeature(Seq(s.getBytes("UTF-8")))
    def bytes(b: Array[Byte]): BytesFeature = BytesFeature(Seq(b))
    def floats(v: Seq[Float]): FloatFeature = FloatFeature(v)
    def int64s(v: Seq[Long]): Int64Feature = Int64Feature(v)
  }

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def keyByte(fieldNum: Int, wireType: Int): Int =
    (fieldNum << 3) | wireType

  private def writeLenDelimited(out: java.io.ByteArrayOutputStream,
      fieldNum: Int, payload: Array[Byte]): Unit = {
    writeVarint(out, keyByte(fieldNum, 2).toLong)
    writeVarint(out, payload.length.toLong)
    out.write(payload)
  }

  private def encodeList(fv: FeatureValue): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    fv match {
      case BytesFeature(vs) =>
        vs.foreach(b => writeLenDelimited(out, 1, b))
      case FloatFeature(vs) =>
        val packed = ByteBuffer.allocate(4 * vs.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(packed.putFloat)
        writeLenDelimited(out, 1, packed.array())
      case Int64Feature(vs) =>
        val packed = new java.io.ByteArrayOutputStream()
        vs.foreach(writeVarint(packed, _))
        writeLenDelimited(out, 1, packed.toByteArray)
    }
    out.toByteArray
  }

  private def encodeFeature(fv: FeatureValue): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val fieldNum = fv match {
      case _: BytesFeature => 1
      case _: FloatFeature => 2
      case _: Int64Feature => 3
    }
    writeLenDelimited(out, fieldNum, encodeList(fv))
    out.toByteArray
  }

  /** Serialize a feature map to tf.train.Example bytes. Features are
    * emitted in sorted-key order for deterministic output.
    */
  def serialize(features: Map[String, FeatureValue]): Array[Byte] = {
    val featuresMsg = new java.io.ByteArrayOutputStream()
    features.toSeq.sortBy(_._1).foreach { case (name, fv) =>
      val entry = new java.io.ByteArrayOutputStream()
      writeLenDelimited(entry, 1, name.getBytes("UTF-8"))
      writeLenDelimited(entry, 2, encodeFeature(fv))
      writeLenDelimited(featuresMsg, 1, entry.toByteArray)
    }
    val example = new java.io.ByteArrayOutputStream()
    writeLenDelimited(example, 1, featuresMsg.toByteArray)
    example.toByteArray
  }
}
