package graft

import java.nio.file.Files

import graft.sources.{CorpusBinder, ImageHeaders, VocAnnotation, VocBox, VocXml}

class CorpusBinderSpec extends SparkTestBase {
  import spark.implicits._

  /** CamVid-shaped fixture corpus per FIXTURES.md: image/mask/labels/meta
    * sidecars for ids a,b; meta-only id c (missing image → error row).
    */
  private def fixtureCorpus(): String = {
    val dir = Files.createTempDirectory("graft-bind").toFile
    dir.deleteOnExit()
    def write(name: String, content: Array[Byte]): Unit =
      Files.write(new java.io.File(dir, name).toPath, content)
    def writeS(name: String, content: String): Unit =
      write(name, content.getBytes)
    for (id <- Seq("a", "b")) {
      write(s"image_$id.png", ImageHeaders.fakePng(64, 48))
      write(s"mask_$id.png", ImageHeaders.fakePng(64, 48))
      writeS(s"labels_$id.csv", "label,R,G,B\nCar,64,0,128\nTree,0,128,0\n")
    }
    writeS("meta_a.json", """{"tags": ["t1", "tA"]}""")
    writeS("meta_b.json", """{"tags": ["t2"]}""")
    writeS("meta_c.json", """{"tags": ["t1"]}""") // no image_c.png
    writeS("bboxLabels_a.xml", VocXml.render(VocAnnotation("a.png", 64, 48, 3,
      Seq(VocBox("Car", 1, 2, 30, 40)))))
    dir.getAbsolutePath
  }

  test("bind assembles sidecars on image_id; missing image flagged") {
    val bound = CorpusBinder.bind(spark, fixtureCorpus())
    assert(bound.count() == 3)
    val byId = bound.collect().map(r => r.getAs[String]("image_id") -> r).toMap
    assert(!byId("a").getAs[Boolean]("image_missing"))
    assert(byId("c").getAs[Boolean]("image_missing"))
    assert(byId("a").getAs[scala.collection.Seq[_]]("labels").size == 2)
    assert(byId("a").getAs[String]("image_type") == "png")
  }

  test("semi-join reduction binds only selected ids") {
    val ids = Seq("b").toDF("image_id")
    val bound = CorpusBinder.bind(spark, fixtureCorpus(), Some(ids))
    assert(bound.select("image_id").as[String].collect().toList == List("b"))
  }

  test("vocBoxes explodes PASCAL VOC annotations into box rows") {
    val boxes = CorpusBinder.vocBoxes(spark, fixtureCorpus())
    val r = boxes.collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("label") == "Car")
    assert(r.head.getAs[Int]("width") == 64)
  }

  test("listPrefixes discovers sub-prefixes, ignoring files") {
    val root = Files.createTempDirectory("graft-prefixes")
    Files.createDirectory(root.resolve("train"))
    Files.createDirectory(root.resolve("val"))
    Files.writeString(root.resolve("stray.txt"), "x")
    assert(CorpusBinder.listPrefixes(spark, root.toString)
      == Seq("train", "val"))
  }

  test("withImageMeta parses real header dimensions") {
    val imgs = CorpusBinder.images(spark, fixtureCorpus())
    val meta = CorpusBinder.withImageMeta(imgs)
      .select("image_id", "image_meta.width", "image_meta.height")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(meta.toSet == Set(("a", 64, 48), ("b", 64, 48)))
  }
}
