package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.ImageHeaders

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("withMeta attaches real header metadata to binary columns") {
    val df = Seq(("a", ImageHeaders.fakePng(320, 240)),
      ("b", "junk".getBytes)).toDF("id", "blob")
    val out = Multimodal.withMeta(df, "blob")
      .select($"id", $"blob_meta.width")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a").contains(320))
    assert(out("b").isEmpty) // unparseable → null metadata, not a crash
  }

  test("decodeToTensor is deterministic, fixed-dim, null-safe") {
    val df = Seq(("a", "payload-one".getBytes),
      ("b", "payload-two".getBytes), ("c", null))
      .toDF("id", "blob")
    val t1 = Multimodal.decodeToTensor(df, "blob", dim = 8, keyCol = "id")
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(t1.values.forall(_.size == 8))
    assert(t1("a") != t1("b")) // content-sensitive
    assert(t1("c").forall(_ == 0.0f)) // null payload → zero tensor
    val t2 = Multimodal.decodeToTensor(df, "blob", dim = 8, keyCol = "id")
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(t1 == t2) // deterministic
  }

  test("sampleFrameIndices picks k evenly spaced, bounded indices") {
    val out = Seq(100, 3, 0).toDF("n")
      .select($"n", Multimodal.sampleFrameIndices($"n", 4).as("idx"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    assert(out(100) == Seq(0, 25, 50, 75))
    assert(out(3) == Seq(0, 1, 2)) // distinct-clamped
    assert(out(0) == Seq())
  }

  test("fitWithin preserves aspect ratio and never upscales") {
    val out = Seq((1000, 500), (100, 50)).toDF("w", "h")
      .select(Multimodal.fitWithin($"w", $"h", 200, 200).as("fit"))
      .select("fit.width", "fit.height")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out(0) == ((200, 100)))
    assert(out(1) == ((100, 50))) // already fits: unchanged
  }
}
