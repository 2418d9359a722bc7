package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{TFExample, TFRecord}
import graft.sources.TFExample._

class TFRecordSpec extends AnyFunSuite {

  test("maskedCrc32c matches the public CRC32C check vector") {
    // CRC32C("123456789") = 0xE3069283 (Castagnoli check value);
    // masked = rotr(crc,15) + 0xa282ead8 (mod 2^32)
    val crc = 0xE3069283L
    val expected = ((((crc >>> 15) | (crc << 17)) & 0xffffffffL) + 0xa282ead8L
      & 0xffffffffL).toInt
    assert(TFRecord.maskedCrc32c("123456789".getBytes) == expected)
  }

  test("frame/readAll round-trip with CRC validation") {
    val records = Seq("hello".getBytes, Array[Byte](), "world!".getBytes)
    val bytes = records.flatMap(TFRecord.frame).toArray
    val back = TFRecord.readAll(bytes)
    assert(back.map(new String(_)) == Seq("hello", "", "world!"))
    // corrupt one payload byte → CRC failure
    val corrupted = bytes.clone()
    corrupted(12) = (corrupted(12) ^ 0x01).toByte
    intercept[IllegalArgumentException] { TFRecord.readAll(corrupted) }
  }

  test("TFExample serializes the documented protobuf wire format") {
    // Example{features{feature{key:"a" value{int64_list{value:[1]}}}}}
    val bytes = TFExample.serialize(Map("a" -> Int64Feature(Seq(1L))))
    val expected = Array(
      0x0A, 0x0C, // Example.features, len 12
      0x0A, 0x0A, // Features.feature entry, len 10
      0x0A, 0x01, 0x61, // key "a"
      0x12, 0x05, // value: Feature, len 5
      0x1A, 0x03, // int64_list, len 3
      0x0A, 0x01, 0x01 // packed values [1]
    ).map(_.toByte)
    assert(bytes.toSeq == expected.toSeq)
  }

  test("TFExample float/bytes features and multi-feature determinism") {
    val ex = Map(
      "img" -> FeatureValue.bytes("PNG..."),
      "coords" -> FloatFeature(Seq(0.5f, 1.5f)),
      "ids" -> Int64Feature(Seq(300L, 1L)))
    val a = TFExample.serialize(ex)
    val b = TFExample.serialize(ex)
    assert(a.toSeq == b.toSeq) // sorted-key determinism
    assert(a.nonEmpty)
    // varint > 127 encodes in two bytes: 300 = 0xAC 0x02 appears in payload
    assert(a.toSeq.containsSlice(Seq(0xAC.toByte, 0x02.toByte)))
  }
}
