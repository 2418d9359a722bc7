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

  test("the LLM-pipeline recipe from QUICKSTART.md: crawl → " +
      "decontaminate → dedup text+images → quality → BPE → pack → " +
      "TFRecord, each stage dropping exactly its plants") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Multimodal, TextOps}
    import graft.sources.{TFRecord, TFRecordSink}

    // reference-English vocabulary both the LM reference and the good
    // docs draw from
    // phrase-structured prose: an n-gram LM separates text from
    // gibberish only when transitions are PREDICTABLE — uniform random
    // words over a vocab score exactly like OOV (both ≈ ln(1/V)), so
    // good docs are built from fixed phrases whose within-phrase
    // bigrams the reference has seen many times. Independent seeded
    // draws keep doc pairs well under the 0.8 near-dup threshold.
    val phrases = Vector(
      "the quick brown fox", "jumps over the lazy dog",
      "a stitch in time saves nine", "practice makes perfect every day",
      "actions speak louder than words",
      "the early bird catches the worm",
      "better late than never they say",
      "knowledge is power they claim", "time flies when having fun",
      "every cloud has a silver lining", "the pen beats the sword",
      "fortune favors the bold mind")
    def goodText(seed: Int) = {
      val rnd = new scala.util.Random(1000 + seed)
      Seq.fill(6)(phrases(rnd.nextInt(phrases.size))).mkString(" ")
    }
    val reference = (1 to 12).map(i => (i.toLong, phrases.mkString(" ")))
      .toDF("doc_id", "text")
    val benchmark = Seq((900L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val header = "this standard license header text is repeated on " +
      "every single page" // 12 tokens, planted on 5 docs
    val crawl = Seq(
      // contaminated: embeds a benchmark 8-gram → dropped at stage 1
      10L -> ("we quote alpha beta gamma delta epsilon zeta eta theta " +
        "in this otherwise fine document " + goodText(0)),
      // five docs sharing the boilerplate header, distinct bodies:
      // the header is masked at stage 2, bodies survive
      11L -> s"$header ${goodText(1)}",
      12L -> s"$header ${goodText(2)}",
      13L -> s"$header ${goodText(3)}",
      14L -> s"$header ${goodText(4)}",
      15L -> s"$header ${goodText(5)}",
      // exact duplicate pair → one survivor
      20L -> goodText(6), 21L -> goodText(6),
      // gibberish: tokens the reference never saw → LM floor drops it
      30L -> (1 to 24).map(i => s"zq$i").mkString(" "),
      // too short for the token floor
      31L -> "tiny doc",
      // clean survivors
      40L -> goodText(7), 41L -> goodText(8))
      .toDF("doc_id", "text")

    // 1. decontaminate
    val clean = TextOps.decontaminate(crawl, benchmark, "text",
        n = 8, threshold = 0.0)
      .filter($"verdict" === "keep")
    assert(!clean.select("doc_id").as[Long].collect().contains(10L))

    // 2. span-level then doc-level dedup
    val unmasked = Dedup.maskRepeatedSpans(clean, "text", "doc_id",
        n = 10, minCount = 5)
      .select($"doc_id", $"masked_text".as("text"))
    val maskedTexts = unmasked.filter($"doc_id".isin(11L, 12L))
      .select("text").as[String].collect()
    assert(maskedTexts.forall(!_.contains("license")),
      s"boilerplate survived masking: ${maskedTexts.toList}")
    val deduped = Dedup.dropNearDuplicateClusters(
      Dedup.dropExactDuplicates(unmasked, Seq("text"), "doc_id"),
      "text", "doc_id", threshold = 0.8)
    val afterDedup = deduped.select("doc_id").as[Long].collect().toSet
    assert(afterDedup.contains(20L) && !afterDedup.contains(21L))
    assert(Set(11L, 12L, 13L, 14L, 15L).subsetOf(afterDedup),
      s"masked-distinct bodies must all survive dedup: $afterDedup")

    // 2b. image payloads: perceptual near-dup pair planted (same blocky
    // "photo", sub-cell brightness tweak), one distinct image, one
    // undecodable payload — keep-first drops only the later twin
    def blockyPng(group: Int, tweak: Boolean): Array[Byte] = {
      val w = 32; val h = 32
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v0 = scala.util.hashing.MurmurHash3
          .productHash((group, x / 4, y / 4)) & 0xff
        val v = if (tweak && x < 2 && y < 2) (v0 + 96) & 0xff else v0
        val i = (y * w + x) * 3
        px(i) = v.toByte; px(i + 1) = v.toByte; px(i + 2) = v.toByte
      }
      graft.sources.ImageCodec.encodePng(w, h, px)
    }
    val images = Seq(
      1L -> blockyPng(7, tweak = false),
      2L -> blockyPng(7, tweak = true), // near-dup of 1 → dropped
      3L -> blockyPng(8, tweak = false),
      4L -> "not an image".getBytes("UTF-8")) // undecodable → kept
      .toDF("img_id", "img")
    val imgPairs = Multimodal.imageNearDuplicates(images, "img",
      "img_id", maxDistance = 3)
    val imgDrops = Dedup.connectedComponents(imgPairs)
      .filter($"key" =!= $"component").select($"key".as("img_id"))
    val imagesKept = images.join(imgDrops, Seq("img_id"), "left_anti")
    assert(imagesKept.select("img_id").as[Long].collect().toSet ==
      Set(1L, 3L, 4L))

    // 3. quality: heuristics + LM score (floor between gibberish and
    // the worst good doc — the spec derives it instead of hard-coding)
    val lm = TextOps.ngramLm(reference, "text")
    val scored = TextOps.lmScore(deduped, lm, "text")
      .withColumn("n_tokens", TextOps.tokenCount($"text"))
    val byDoc = scored.select("doc_id", "lm_score", "n_tokens")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Double.NegativeInfinity else r.getDouble(1),
          r.getInt(2))).toMap
    val gib = byDoc(30L)._1
    val worstGood = afterDedup.filter(d => d != 30L && d != 31L)
      .map(d => byDoc(d)._1).min
    assert(gib < worstGood,
      s"LM must separate gibberish ($gib) from prose ($worstGood)")
    val scoreFloor = (gib + worstGood) / 2
    val kept = scored.filter($"n_tokens" >= 20 &&
      $"lm_score" > lit(scoreFloor))
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    assert(!keptIds.contains(30L) && !keptIds.contains(31L))
    assert(Set(11L, 20L, 40L, 41L).subsetOf(keptIds), keptIds.toString)

    // 4. tokenize: gpt2-pretokenized byte-level BPE trained on the
    // survivors, encoded map-only to an id stream
    val bpe = TextOps.bpeTrain(kept, "text", numMerges = 200,
      pretokenize = "gpt2")
    assert(bpe.pretokenize == "gpt2")
    val ids = TextOps.bpeEncode(kept, bpe, "text")
      .withColumn("ids_str", concat_ws(" ", $"token_ids"))

    // 5. chunk + pack the ID stream ("-1" edge marker can't collide
    // with non-negative ids)
    // chunkSize holds every fixture doc's id count, so chunks are 1:1
    // with docs and the boundary-split stream reconstructs documents
    // (multi-chunk splitting is pinned by the chunkTokens/packChunks
    // specs and q60/q84)
    val chunks = TextOps.chunkTokens(ids, "ids_str", "doc_id",
        chunkSize = 4096, stride = 4096)
      .withColumn("ckey", concat($"doc_id", lit("#"), $"chunk_id"))
    val seqs = TextOps.packChunks(chunks, "chunk", "ckey", seqLen = 10,
      boundary = "-1")
    val nSeqs = seqs.count()
    val nonFinal = seqs.orderBy("seq_id").limit(nSeqs.toInt - 1)
    assert(nonFinal.filter($"n_tokens" =!= 10).count() == 0,
      "every non-final sequence must carry exactly seqLen tokens")
    // the packed stream, split on the edge marker, decodes back to
    // EXACTLY the surviving documents (whitespace-normalized)
    val stream = seqs.orderBy("seq_id").select("seq").as[String]
      .collect().mkString(" ").split(" ").map(_.toInt)
    val docsBack = scala.collection.mutable.ArrayBuffer[Seq[Int]]()
    var cur = scala.collection.mutable.ArrayBuffer[Int]()
    for (t <- stream)
      if (t == -1) { docsBack += cur.toSeq; cur.clear() } else cur += t
    assert(cur.isEmpty, "the packed stream must end on a boundary")
    val wantTexts = kept.select("text").as[String].collect()
      .map(_.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")).toSet
    assert(docsBack.map(s => TextOps.bpeDecode(s, bpe)).toSet ==
      wantTexts, "packed ids must decode to the surviving docs")

    // 6. sharded TFRecords that decode
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-llm-recipe").toString
    val encodeExample = udf((s: String) =>
      graft.sources.TFExample.serialize(Map(
        "text" -> graft.sources.TFExample.FeatureValue.bytes(s))))
    val written = TFRecordSink.writeSharded(
      seqs.select(encodeExample($"seq").as("example")), "example",
      s"$outDir/train")
    assert(written == nSeqs)
    val shard = new java.io.File(s"$outDir/train").listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val records = TFRecord.readAll(
      java.nio.file.Files.readAllBytes(shard.toPath))
    assert(records.nonEmpty && records.forall(_.nonEmpty))
  }

  test("the documented STREAMING mirror of the curation chain — " +
      "decontaminate upstream of start, then LineDedup + SpanMask + " +
      "exactPrefilter + near-dup + Curate all enabled at once — " +
      "reproduces the batch chain's keep-set AND texts on the same " +
      "fixture") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, TextOps}
    import graft.streaming.DedupIngest

    // fixture: every stage fires at least once, and the plants stay
    // inside the documented batch≡streaming parity envelope — the span
    // crosses minCount within its FIRST batch (cumulative-count
    // decisions then match the batch op's total-count decisions for
    // every span-bearing doc), and no late bridge docs (the keep-first
    // superset caveat never triggers)
    def body(tag: String) = (1 to 30).map(i => s"$tag$i").mkString(" ")
    val footer = "standard syndicated footer notice"
    val span = "promo header tokens one two" // one 5-gram at n = 5
    val shorts = "hey\nyo\nsup" // every line under minChars: line-exempt
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val benchmark = Seq((900L, s"$quote iota kappa")).toDF("doc_id", "text")
    val sb = Seq(
      Seq(1L -> s"${body("aa")}\n$footer", // keeps footer (first)
        2L -> s"${body("ab")}\n$footer",   // loses footer in-batch
        3L -> s"$span ${body("ac")}",      // span occurrences 1-3: the
        4L -> s"$span ${body("ad")}",      // in-batch count reaches
        5L -> s"$span ${body("ae")}",      // minCount → all masked
        6L -> shorts,                      // unique now; junk → curated
        7L -> body("ag")),                 // near-dup target
      Seq(10L -> s"$footer\n${body("ba")}", // footer via line history
        11L -> body("ag").replace("ag13", "x13"), // near-dup of 7
        12L -> s"$span ${body("bc")}",     // masked via span history
        // verbatim re-crawl of doc 2: both lines now duplicate, the
        // emptied husk drops at the line stage
        13L -> s"${body("ab")}\n$footer"),
      Seq(
        // verbatim re-crawl of the line-exempt shorts doc: the EXACT
        // prefilter drops it against doc 6's stored digest — stores
        // accrue PRE-curation, so recognition survives 6's removal
        20L -> shorts,
        21L -> body("ca"),                 // clean survivor
        22L -> "wee doc words here",       // junk → curated
        // the decontamination plant: carries a benchmark 8-gram, so
        // the upstream whole-doc filter drops it on both sides (the
        // SURGICAL maskContaminated form would be wrong here: its
        // uniform-output whitespace normalization erases the \n line
        // structure the LineDedup stage keys on — see QUICKSTART)
        23L -> s"we quote $quote ${body("cc")}"))
    val lineCfg = Some(DedupIngest.LineDedup())
    val maskCfg = Some(DedupIngest.SpanMask(n = 5, minCount = 3))
    val curateCfg = Some(DedupIngest.Curate(length(col("text")) >= 40))

    // --- the streaming side: the QUICKSTART configuration verbatim ---
    implicit val sqlCtx = spark.sqlContext
    val storeRoot = Files.createTempDirectory("graft-qsm-store").toString
    val keptDir = Files.createTempDirectory("graft-qsm-kept").toString
    val ckpt = Files.createTempDirectory("graft-qsm-ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val docs = TextOps.decontaminate(
        mem.toDF().toDF("doc_id", "text"), benchmark, "text")
      .filter($"verdict" === "keep")
      .select($"doc_id", $"text")
    val q = DedupIngest.start(docs, "text", "doc_id", storeRoot, keptDir,
      ckpt, threshold = 0.7, exactPrefilter = true, spanMask = maskCfg,
      lineDedup = lineCfg, curate = curateCfg)
    try {
      for (b <- sb) { mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamRows = spark.read.parquet(keptDir)
      .select($"ingest_batch".cast("long"), $"doc_id", $"text")
      .as[(Long, Long, String)].collect().toSeq
    val streamKept = streamRows.groupBy(_._1)
      .map { case (b, r) => b -> r.map(_._2).toSet }
    assert(streamKept == Map(0L -> Set(1L, 2L, 3L, 4L, 5L, 7L),
      1L -> Set(10L, 12L), 2L -> Set(21L)), s"keep-sets: $streamKept")

    // --- the batch chain, the documented stage order over the same
    // corpus: decontaminate → line dedup → span mask → exact dedup →
    // near-dup clusters → quality filter ---
    val corpus = sb.flatten.toDF("doc_id", "text")
    val decon = TextOps.decontaminate(corpus, benchmark, "text")
      .filter($"verdict" === "keep")
      .select($"doc_id", $"text")
    val lined = Dedup.dedupLines(decon, "text", "doc_id")
      .filter(!($"removed_lines" > 0 &&
        length(trim($"text_deduped")) === 0))
      .select($"doc_id", $"text_deduped".as("text"))
    val spanned = Dedup.maskRepeatedSpans(lined, "text", "doc_id",
        n = 5, minCount = 3)
      .select($"doc_id", $"masked_text".as("text"))
    val exact = Dedup.dropExactDuplicates(spanned, Seq("text"), "doc_id")
    val near = Dedup.dropNearDuplicateClusters(exact, "text", "doc_id",
      threshold = 0.7)
    val batchKept = near.filter(length($"text") >= 40)
      .select("doc_id", "text").as[(Long, String)].collect().toMap

    // keep-set AND text parity, doc for doc (the span kernel's uniform
    // single-space normalization applies on both sides)
    val streamTexts = streamRows.map(r => r._2 -> r._3).toMap
    assert(streamTexts == batchKept,
      s"streaming mirror diverged from the batch chain:\n" +
        s"stream: ${streamTexts.toSeq.sortBy(_._1)}\n" +
        s"batch:  ${batchKept.toSeq.sortBy(_._1)}")
    // stage evidence: the footer line survived only at its first
    // occurrence, the span is stripped everywhere (its first batch
    // already crossed minCount), and the contaminated doc never ships
    assert(streamTexts(1L) == s"${body("aa")} $footer")
    assert(streamTexts(2L) == body("ab"))
    assert(streamTexts(3L) == body("ac") &&
      streamTexts(12L) == body("bc"))
    assert(!streamTexts.contains(23L) &&
      !streamTexts.values.exists(_.contains("alpha")))
  }

  test("the QUICKSTART recipe's oversized-benchmark path: the " +
      "relational decontamination and LM forms slot into the chain " +
      "with identical decisions to the broadcast forms") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps

    val phrases = Vector(
      "the quick brown fox", "jumps over the lazy dog",
      "a stitch in time saves nine", "practice makes perfect every day",
      "actions speak louder than words",
      "the early bird catches the worm")
    def goodText(seed: Int) = {
      val rnd = new scala.util.Random(1000 + seed)
      Seq.fill(6)(phrases(rnd.nextInt(phrases.size))).mkString(" ")
    }
    val reference = (1 to 6).map(i => (i.toLong, phrases.mkString(" ")))
      .toDF("doc_id", "text")
    val benchmark = Seq((900L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val crawl = Seq(
      10L -> ("we quote alpha beta gamma delta epsilon zeta eta theta " +
        "in this otherwise fine document " + goodText(0)),
      30L -> (1 to 24).map(i => s"zq$i").mkString(" "), // gibberish
      40L -> goodText(7), 41L -> goodText(8))
      .toDF("doc_id", "text")

    // stage 1 through the relational form: same keep set
    def keepSet(df: org.apache.spark.sql.DataFrame) =
      df.filter($"verdict" === "keep").select("doc_id").as[Long]
        .collect().toSet
    val keptB = keepSet(TextOps.decontaminate(crawl, benchmark, "text",
      n = 8, threshold = 0.0))
    val keptR = keepSet(TextOps.decontaminateRelational(crawl, benchmark,
      "text", "doc_id", n = 8, threshold = 0.0))
    assert(keptR == keptB && keptR == Set(30L, 40L, 41L))
    val clean = crawl.filter($"doc_id".isin(keptR.toSeq: _*))

    // stage 3 through the relational form: identical scores, and the
    // LM floor still separates gibberish from prose
    val scoresB = TextOps.lmScore(clean,
        TextOps.ngramLm(reference, "text"), "text")
      .select("doc_id", "lm_score").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    val scoresR = TextOps.lmScoreRelational(clean,
        TextOps.ngramLmRelations(reference, "text"), "text", "doc_id")
      .select("doc_id", "lm_score").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(scoresR.keySet == scoresB.keySet)
    for ((k, vB) <- scoresB) {
      val vR = scoresR(k)
      assert((vB.isNaN && vR.isNaN) || math.abs(vB - vR) < 1e-9,
        s"doc $k: relational $vR vs broadcast $vB")
    }
    assert(scoresR(30L) < math.min(scoresR(40L), scoresR(41L)),
      "the relational LM must still separate gibberish from prose")
  }
}
