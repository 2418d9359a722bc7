package graft

import java.nio.file.Files

import graft.plans.{FeaturePointsModel, TransformPlanner}
import graft.operators.{Merge, Rename}
import graft.sources.{CorpusBinder, ImageHeaders}

class FeatureModelsSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(consistent: Boolean): String = {
    val dir = Files.createTempDirectory("graft-fp").toFile
    dir.deleteOnExit()
    def writeS(name: String, content: String): Unit =
      Files.write(new java.io.File(dir, name).toPath, content.getBytes)
    Files.write(new java.io.File(dir, "image_a.png").toPath,
      ImageHeaders.fakePng(100, 80))
    Files.write(new java.io.File(dir, "image_b.png").toPath,
      ImageHeaders.fakePng(100, 80))
    writeS("meta_a.json",
      """{"tags": ["t1"], "pose": [0.1, 0.2, 0.3, 0.4],
        | "truth_centroids": {"nose": [10, 20], "tail": [30, 40]}}""".stripMargin)
    val bCentroids =
      if (consistent) """{"nose": [5, 6], "tail": [7, 8]}"""
      else """{"nose": [5, 6], "wing": [7, 8]}"""
    writeS("meta_b.json",
      s"""{"tags": ["t2"], "pose": [0.5, 0.6, 0.7, 0.8],
         | "truth_centroids": $bCentroids}""".stripMargin)
    dir.getAbsolutePath
  }

  test("feature-points export flattens centroids key-sorted, x's then y's") {
    val bound = FeaturePointsModel.bind(spark, corpus(consistent = true), None)
    FeaturePointsModel.validateCentroidKeys(bound) // must not throw
    val a = bound.filter($"image_id" === "a").collect().head
    val bytes = FeaturePointsModel.exportExample(a)
    assert(bytes.nonEmpty)
    // feature_points for a = [10, 30, 20, 40] (nose,tail x's then y's);
    // packed varints 10,30,20,40 appear in order
    assert(bytes.toSeq.containsSlice(Seq[Byte](10, 30, 20, 40)))
  }

  test("deeplab class-id mask: real decode -> classIdImage -> gray PNG") {
    import graft.plans.DeeplabModel
    import graft.sources.ImageCodec
    // 4×3 color mask: background black, label red at (1,1)-(2,1)
    val w = 4; val h = 3
    val px = new Array[Byte](w * h * 3)
    def set(x: Int, y: Int, bgr: (Int, Int, Int)): Unit = {
      val i = (y * w + x) * 3
      px(i) = bgr._1.toByte; px(i + 1) = bgr._2.toByte
      px(i + 2) = bgr._3.toByte
    }
    set(1, 1, (0, 0, 255)); set(2, 1, (0, 0, 255))
    val maskPng = ImageCodec.encodePng(w, h, px)
    val classPng = DeeplabModel.classIdMaskPng(maskPng,
      Map((0, 0, 255) -> 7)).get
    // decode the gray PNG back: class id 7 where red was, 0 elsewhere
    val (dw, dh, dpx) = ImageCodec.decodeBgr(classPng).get
    assert((dw, dh) == ((w, h)))
    def gray(x: Int, y: Int): Int = dpx((y * w + x) * 3) & 0xff
    assert(gray(1, 1) == 7 && gray(2, 1) == 7)
    assert(gray(0, 0) == 0 && gray(3, 2) == 0)
    // DataFrame wiring: withClassMask adds the column; undecodable → null
    val df = Seq(("a", maskPng), ("b", Array[Byte](9, 9)))
      .toDF("image_id", "mask")
    val out = DeeplabModel.withClassMask(df, Map((0, 0, 255) -> 7))
      .collect().map(r => r.getString(0) -> r.isNullAt(2)).toMap
    assert(out == Map("a" -> false, "b" -> true))
    // export NEVER leaks raw color-mask bytes into the class slot: a null
    // class_mask (decode failure) emits empty segmentation bytes
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("image_meta",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("height",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("width",
            org.apache.spark.sql.types.IntegerType)))),
      org.apache.spark.sql.types.StructField("image",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("image_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("mask",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("class_mask",
        org.apache.spark.sql.types.BinaryType)))
    val distinctiveMask = Array.fill(64)(0x5a.toByte)
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericRowWithSchema(
        Array[Any](null, Array[Byte](1, 2), "png", distinctiveMask, null),
        schema)
    val example = DeeplabModel.exportExample(row)
    assert(!example.toSeq.containsSlice(distinctiveMask.toSeq),
      "null class_mask must not fall back to raw color-mask bytes")
  }

  test("validateCentroidKeys rejects drifting key sets (F10)") {
    val bound = FeaturePointsModel.bind(spark, corpus(consistent = false), None)
    intercept[IllegalArgumentException] {
      FeaturePointsModel.validateCentroidKeys(bound)
    }
  }

  test("TransformPlanner tracks vocabulary; rejects unknown labels") {
    val p = TransformPlanner.plan(Seq("a", "b", "c"),
      Seq(Rename("a", "x"), Merge(Seq("x", "b"), "m")))
    assert(p.finalLabels == Seq("c", "m"))
    // rename onto existing = merge: vocabulary loses the original
    val p2 = TransformPlanner.plan(Seq("a", "b"), Seq(Rename("a", "b")))
    assert(p2.finalLabels == Seq("b"))
    intercept[IllegalArgumentException] {
      TransformPlanner.plan(Seq("a"), Seq(Rename("zzz", "x")))
    }
    intercept[IllegalArgumentException] {
      // 'a' was consumed by the merge; renaming it afterwards is an error
      TransformPlanner.plan(Seq("a", "b"),
        Seq(Merge(Seq("a", "b"), "m"), Rename("a", "x")))
    }
  }

  test("writeAdditionalFiles: Welford -> mean/stdev npy + key order json") {
    val bound = FeaturePointsModel.bind(spark, corpus(consistent = true), None)
    val out = Files.createTempDirectory("graft-npy").toString
    val res = FeaturePointsModel.writeAdditionalFiles(bound, out, dim = 16)
    assert(res.count == 2 && res.mean.size == 16)
    val files = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(files.toList == List("feature_points.json", "mean.npy", "stdev.npy"))
    assert(Files.readString(java.nio.file.Paths.get(s"$out/feature_points.json"))
      == """["nose", "tail"]""")
    // npy header sanity (full numpy cross-validation in SinksSpec)
    val npy = Files.readAllBytes(java.nio.file.Paths.get(s"$out/mean.npy"))
    assert(npy(0) == 0x93.toByte && new String(npy.slice(1, 6)) == "NUMPY")
  }

  test("copyRelated copies only the selected ids' sidecars") {
    val src = corpus(consistent = true)
    val dest = Files.createTempDirectory("graft-copy").toString
    val n = CorpusBinder.copyRelated(spark, src,
      Seq("a").toDF("image_id"), dest)
    val copied = new java.io.File(dest).listFiles().map(_.getName).sorted
    assert(copied.toList == List("image_a.png", "meta_a.json"))
    assert(n == 2)
  }
}
