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

  test("the incremental crawl-batch dedup loop from QUICKSTART.md " +
      "keeps exactly the first-shipped representative of every cluster") {
    import spark.implicits._
    import graft.operators.Dedup
    import org.apache.spark.sql.DataFrame
    // planted corpus: exact dup (A), near dups (B, C — one word of 30
    // changed, jaccard ≈ 0.81 ≥ 0.7), a singleton per batch, and an
    // F-chain whose ends differ by two words (jaccard ≈ 0.65 < 0.7):
    // F1 and F3 ship as distinct clusters until the BRIDGE doc F2
    // arrives and merges them — the documented keep-first superset case
    def words(tag: String) = (1 to 30).map(i => s"$tag$i").toVector
    val A = words("alpha").mkString(" ")
    val B = words("beta").mkString(" ")
    val bNear = B.replace("beta15", "x15")
    val C = words("gamma").mkString(" ")
    val cNear = C.replace("gamma7", "y7")
    val f = words("delta")
    val F1 = f.mkString(" ")
    val F2 = f.updated(9, "bridge10").mkString(" ")
    val F3 = f.updated(9, "bridge10").updated(19, "far20").mkString(" ")
    val crawlBatches = Seq(
      Seq((1L, A), (2L, B), (3L, "first standalone text about maritime " +
        "navigation charts and tidal tables"), (4L, F1)).toDF("doc_id", "text"),
      Seq((101L, A), (102L, bNear), (103L, C), (104L, F3))
        .toDF("doc_id", "text"),
      Seq((201L, cNear), (202L, "another entirely different piece on " +
        "volcanic geology and basalt formations"), (203L, F2))
        .toDF("doc_id", "text"))
    val firstBatch = crawlBatches.head
    val shipped = Seq.newBuilder[Set[Long]]
    def ship(kept: DataFrame): Unit =
      shipped += kept.select("doc_id").as[Long].collect().toSet

    // --- the doc's loop, verbatim from here ---
    var sigStore = Dedup.minhashSignatures(firstBatch.limit(0), "text",
      "doc_id")
    var labelStore = Dedup.connectedComponents(
      sigStore.limit(0).select($"doc_id".as("key_a"),
        $"doc_id".as("key_b")))

    for (batch <- crawlBatches) {
      val (pairs, sigs) = Dedup.minhashNearDuplicatesIncremental(
        batch, sigStore, "text", "doc_id", threshold = 0.7)
      val labels = Dedup.connectedComponentsIncremental(labelStore, pairs)
      // keep-first: ship the docs that are their own cluster representative
      val kept = batch.join(
        labels.filter($"component" =!= $"key").select($"key".as("doc_id")),
        Seq("doc_id"), "left_anti")
      ship(kept)
      sigStore = sigs; labelStore = labels  // .write.parquet(...) in production
    }
    // --- end of the doc's loop ---

    val Seq(k0, k1, k2) = shipped.result()
    assert(k0 == Set(1L, 2L, 3L, 4L), s"batch 0 keep-set: $k0")
    // 101 = exact dup of 1; 102 = near dup of 2; F3 pairs with nothing
    // yet (0.65 < threshold against F1) so it ships as its own cluster
    assert(k1 == Set(103L, 104L), s"batch 1 keep-set: $k1")
    // 201 = near dup of 103; F2 bridges the F1 and F3 clusters → dropped
    assert(k2 == Set(202L), s"batch 2 keep-set: $k2")
    // superset contract vs the one-shot run: batch dedup over everything
    // keeps only F-cluster minimum 4; keep-first also shipped 104, which
    // was distinct at its arrival time and is never recalled
    val oneShot = Dedup.dropNearDuplicateClusters(
      crawlBatches.reduce(_ unionByName _), "text", "doc_id",
      threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(oneShot == Set(1L, 2L, 3L, 4L, 103L, 202L), s"one-shot: $oneShot")
    assert((k0 | k1 | k2) == oneShot + 104L,
      s"keep-first union must be the one-shot set plus the " +
        s"bridged-late 104: ${k0 | k1 | k2} vs $oneShot")
  }
}
