package graft

import java.nio.file.Files

import graft.operators.{LabelDictionary, LabelTransforms, Rename, Splits, TagOps}
import graft.plans.{DataModels, DatasetWriter}
import graft.sources.{CorpusBinder, FilterLineage, ImageHeaders}

/** Compile-and-run guard for QUICKSTART.md: the doc's program, verbatim
  * (minus the session/path stanza), against the CamVid-shaped fixture —
  * if the quickstart's API surface drifts, this spec breaks with it.
  */
class QuickstartSpec extends SparkTestBase {

  private def fixtureCorpus(n: Int): String = {
    val dir = Files.createTempDirectory("graft-quickstart").toFile
    dir.deleteOnExit()
    def writeS(name: String, content: String): Unit =
      Files.write(new java.io.File(dir, name).toPath, content.getBytes)
    for (i <- 1 to n) {
      val id = f"img$i%03d"
      Files.write(new java.io.File(dir, s"image_$id.png").toPath,
        ImageHeaders.fakePng(32, 24))
      Files.write(new java.io.File(dir, s"mask_$id.png").toPath,
        ImageHeaders.fakePng(32, 24))
      writeS(s"labels_$id.csv", "label,R,G,B\nCar,64,0,128\nTree,0,128,0\n")
      writeS(s"meta_$id.json", s"""{"tags": ["t${i % 3}"]}""")
    }
    dir.getAbsolutePath
  }

  test("the QUICKSTART.md program runs end-to-end on the CamVid fixture") {
    val corpusDir = fixtureCorpus(12) // tags t0/t1/t2 → or-filter keeps 8
    val outRoot = Files.createTempDirectory("graft-quickstart-out").toString

    // --- the doc's program, verbatim from here ---
    val model = DataModels.registry("semantic_mask")

    val tagged = TagOps.loadMetadata(spark, corpusDir)
    val selected = TagOps.orFilter(tagged, Seq("t0", "t1")).select("image_id")
    val nSelected = selected.count()
    val bound = model.bind(spark, corpusDir, Some(selected))

    val transforms = Seq(Rename("Car", "Auto"))

    val examples = model.examples(bound)
    val labels = LabelTransforms.applyTo(
      CorpusBinder.labels(spark, corpusDir), "label", transforms)
    val dict = LabelDictionary.fromLabels(labels)
    val result = DatasetWriter.write(spark, outRoot, "camvid_v1",
      examples, dict,
      user = "First Last", comments = "notes about this dataset",
      trainingType = model.trainingType,
      filters = Seq(FilterLineage("or", Seq(("or", Seq("t0", "t1"))),
        nSelected)),
      transforms = transforms)

    val folds = Splits.kfold(examples, k = 5, seed = 42)
    // --- end of the doc's program ---

    assert(nSelected == 8)
    assert(result.numTest + result.numTrainTest + result.numTrain == 8)
    val base = new java.io.File(s"$outRoot/camvid_v1")
    def shardNames(p: String) = new java.io.File(base, p).listFiles()
      .map(_.getName).filter(_.endsWith(".tfrecord"))
    assert(shardNames("test").exists(_.startsWith("test.record-")))
    assert(shardNames("splits/complete").exists(_.startsWith("train.record-")))
    val labelMap = Files.readString(base.toPath.resolve("label_map.pbtxt"))
    assert(labelMap.contains("name: 'Auto'") && !labelMap.contains("'Car'"),
      s"transform not reflected in label map:\n$labelMap")
    val manifest = Files.readString(base.toPath.resolve("metadata.json"))
    assert(manifest.contains("\"created_by\": \"First Last\"") &&
      manifest.contains("rename Car -> Auto") &&
      manifest.contains("notes about this dataset"))
    val sizes = folds.groupBy("fold").count()
      .collect().map(_.getAs[Long]("count"))
    assert(sizes.length == 5 && sizes.max - sizes.min <= 1,
      s"folds unbalanced: ${sizes.toList}")
  }
}
