package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, PixelOps}
import graft.sources.{ImageCodec, ImageHeaders}

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

  test("real PNG codec round-trips and feeds the pixel-op kernels") {
    // 8×6 black canvas, a red 3×2 box at (2,1) and a blue 2×2 box at (5,3)
    val w = 8; val h = 6
    val px = new Array[Byte](w * h * 3)
    def set(x: Int, y: Int, bgr: (Int, Int, Int)): Unit = {
      val i = (y * w + x) * 3
      px(i) = bgr._1.toByte; px(i + 1) = bgr._2.toByte
      px(i + 2) = bgr._3.toByte
    }
    for (x <- 2 to 4; y <- 1 to 2) set(x, y, (0, 0, 255))
    for (x <- 5 to 6; y <- 3 to 4) set(x, y, (255, 0, 0))
    val png = ImageCodec.encodePng(w, h, px)
    // PNG is lossless: byte-exact round trip through a REAL codec
    val (dw, dh, dpx) = ImageCodec.decodeBgr(png).get
    assert((dw, dh) == ((w, h)))
    assert(dpx.sameElements(px))
    // DataFrame decode path
    val row = Multimodal.decodeImage(
        Seq(("img1", png)).toDF("image_id", "bytes"), "bytes", "image_id")
      .collect().head
    assert(row.getInt(1) == w && row.getInt(2) == h)
    val decoded = row.getAs[Array[Byte]]("pixels")
    // instance discovery on the actually-decoded image
    val redBoxes = PixelOps.instanceBoxes(decoded, w, h, (0, 0, 255))
    assert(redBoxes == Seq(PixelOps.Box(2, 1, 4, 2)), s"red: $redBoxes")
    val blueBoxes = PixelOps.instanceBoxes(decoded, w, h, (255, 0, 0))
    assert(blueBoxes == Seq(PixelOps.Box(5, 3, 6, 4)), s"blue: $blueBoxes")
    // garbage and null payloads decode to null fields, not errors
    val bad = Multimodal.decodeImage(
        Seq(("x", Array[Byte](1, 2, 3)),
          ("y", null.asInstanceOf[Array[Byte]])).toDF("image_id", "bytes"),
        "bytes", "image_id")
      .collect()
    assert(bad.forall(r => r.isNullAt(1) && r.isNullAt(3)))
  }

  test("mp4 box walker extracts duration and track types for real") {
    import graft.sources.VideoHeaders
    val mp4 = VideoHeaders.fakeMp4(timescale = 1000, duration = 12500,
      handlers = Seq("vide", "soun", "vide"))
    val meta = VideoHeaders.parse(mp4).get
    assert(meta.format == "mp4")
    assert(math.abs(meta.durationSec - 12.5) < 1e-9)
    assert(meta.timescale == 1000L)
    assert(meta.videoTracks == 2 && meta.audioTracks == 1)
    // non-mp4 and truncated payloads → None, not exceptions
    assert(VideoHeaders.parse("not a video at all".getBytes).isEmpty)
    assert(VideoHeaders.parse(mp4.take(20)).isEmpty)
    assert(VideoHeaders.parse(null).isEmpty)
    // DataFrame wiring: struct column, null for undecodable
    val rows = Multimodal.withVideoMeta(
        Seq(("v", mp4), ("x", Array[Byte](1))).toDF("clip_id", "bytes"),
        "bytes")
      .collect().map(r => r.getString(0) -> r.isNullAt(2)).toMap
    assert(rows == Map("v" -> false, "x" -> true))
  }

  test("mp4 walker skips largesize boxes and survives crafted nesting") {
    import graft.sources.VideoHeaders
    def u32(v: Int) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val base = VideoHeaders.fakeMp4(1000, 5000, Seq("vide"))
    val ftyp = base.take(16) // fakeMp4's ftyp box is exactly 16 bytes
    val moov = base.drop(16)
    // a largesize (size==1 + 64-bit length) mdat BETWEEN ftyp and moov —
    // the common big-file layout; the walker must skip it, not bail
    val mdat = u32(1) ++ "mdat".getBytes("US-ASCII") ++
      u32(0) ++ u32(24) ++ Array.fill(8)(0.toByte)
    val meta = VideoHeaders.parse(ftyp ++ mdat ++ moov).get
    assert(math.abs(meta.durationSec - 5.0) < 1e-9)
    assert(meta.videoTracks == 1)
    // 10k nested container headers: must return None, not StackOverflow
    val n = 10000
    val evil = new Array[Byte](n * 8)
    (0 until n).foreach { i =>
      val size = (n - i) * 8
      u32(size).copyToArray(evil, i * 8)
      "trak".getBytes("US-ASCII").copyToArray(evil, i * 8 + 4)
    }
    assert(VideoHeaders.parse(ftyp ++ evil).isEmpty)
  }

  test("resizeBilinear halves dimensions, preserves solid regions") {
    import graft.sources.ImageCodec
    val w = 8; val h = 8
    val px = Array.fill(w * h * 3)(0.toByte)
    // solid green image
    var p = 0
    while (p < w * h) { px(p * 3 + 1) = 200.toByte; p += 1 }
    val half = ImageCodec.resizeBilinear(w, h, px, 4, 4)
    assert(half.length == 4 * 4 * 3)
    (0 until 16).foreach { i =>
      assert((half(i * 3) & 0xff) == 0)
      assert((half(i * 3 + 1) & 0xff) == 200) // solid stays solid
      assert((half(i * 3 + 2) & 0xff) == 0)
    }
    // resize + fitWithin agree on shape math
    val dims = Seq((800, 600)).toDF("w", "h")
      .select(Multimodal.fitWithin(col("w"), col("h"), 400, 400).as("d"))
      .collect().head.getStruct(0)
    assert((dims.getInt(0), dims.getInt(1)) == ((400, 300)))
  }

  test("real WAV codec: sine round-trip, duration/energy/zcr features") {
    import graft.sources.AudioCodec
    val sr = 8000f
    val hz = 440.0
    val n = 8000 // 1 second
    val sine = Array.tabulate(n)(i =>
      (0.5 * math.sin(2 * math.Pi * hz * i / sr)).toFloat)
    val wav = AudioCodec.encodeWavMono16(sr, sine)
    val pcm = AudioCodec.decodePcm(wav).get
    assert(pcm.sampleRate == sr && pcm.channels == 1 && pcm.frames == n)
    // 16-bit quantization: samples within 1/32767 of the original
    sine.zip(pcm.samples).foreach { case (a, b) =>
      assert(math.abs(a - b) < 2.0f / 32767.0f, s"$a vs $b")
    }
    val (dur, rms, zcr) = AudioCodec.features(pcm)
    assert(math.abs(dur - 1.0) < 1e-9)
    // sine RMS = amplitude / sqrt(2)
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 1e-3, s"rms $rms")
    // a 440 Hz sine crosses zero ~880 times/second
    assert(math.abs(zcr * (n - 1) - 2 * hz) < 4, s"zcr $zcr")
    // garbage decodes to None, not an exception
    assert(AudioCodec.decodePcm(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioCodec.decodePcm(null).isEmpty)
    // DataFrame wiring: features for decodable rows, nulls otherwise
    val rows = Multimodal.audioFeatures(
        Seq(("ok", wav), ("bad", Array[Byte](1, 2)))
          .toDF("clip_id", "bytes"), "bytes", "clip_id")
      .collect().map(r => r.getString(0) -> r.isNullAt(3)).toMap
    assert(rows == Map("ok" -> false, "bad" -> true))
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

  test("decode outputs preserve the key column's original type") {
    // bigint keys must stay bigint (not coerce to string): the documented
    // "join back on the key" contract needs a same-type equi-join
    val df = Seq((10L, "payload".getBytes), (11L, null))
      .toDF("doc_id", "blob")
    val tensor = Multimodal.decodeToTensor(df, "blob", dim = 4, keyCol = "doc_id")
    assert(tensor.schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(tensor.select("doc_id").as[Long].collect().toSet == Set(10L, 11L))
    val img = Multimodal.decodeImage(df, "blob", keyCol = "doc_id")
    assert(img.schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType)
    // non-image payloads decode to null fields, key intact
    assert(img.filter($"width".isNull).count() == 2)
    val audio = Multimodal.audioFeatures(df, "blob", keyCol = "doc_id")
    assert(audio.schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("codecs yield null fields (not task failure) on corrupt payloads") {
    // truncated/garbage bytes with plausible magic numbers reach the JDK
    // plugins and historically threw unchecked exceptions mid-decode
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a, 0, 0, 0, 13, 'I', 'H', 'D', 'R', 1, 2, 3)
    val wavMagic = "RIFF1234WAVEfmt ".getBytes ++ Array.fill[Byte](7)(0x7f)
    assert(graft.sources.ImageCodec.decodeBgr(pngMagic).isEmpty)
    assert(graft.sources.AudioCodec.decodePcm(wavMagic).isEmpty)
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

  /** Deterministic 32×32 grayscale "photo": 4×4 pseudo-random luma
    * blocks keyed by (group, block); `tweak` brightens the top-left
    * 2×2 pixels — a sub-cell edit a perceptual hash must shrug off.
    */
  private def blockyPng(group: Int, tweak: Boolean): Array[Byte] = {
    val w = 32; val h = 32
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = scala.util.hashing.MurmurHash3
        .productHash((group, x / 4, y / 4)) & 0xff
      val v = if (tweak && x < 2 && y < 2) (v0 + 96) & 0xff else v0
      val i = (y * w + x) * 3
      px(i) = v.toByte; px(i + 1) = v.toByte; px(i + 2) = v.toByte
    }
    ImageCodec.encodePng(w, h, px)
  }

  test("perceptual image dedup end-to-end: planted near-identical PNGs " +
      "pair, distinct images never do, undecodable payloads never pair, " +
      "and the incremental store path matches the batch run") {
    // 10 groups × (base, tweaked near-dup); one corrupt, one null payload
    val imgs = ((0 until 10).flatMap { g =>
      Seq((2L * g, blockyPng(g, tweak = false)),
        (2L * g + 1, blockyPng(g, tweak = true)))
    } ++ Seq((100L, Array[Byte](9, 9, 9)),
      (101L, null.asInstanceOf[Array[Byte]])))
      .toDF("img_id", "img")
    val pairs = Multimodal.imageNearDuplicates(imgs, "img", "img_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // exactly the 10 planted pairs; every cross-group candidate fails
    // hamming verification, bad payloads (null _h) never join
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      (0 until 10).map(g => (2L * g, 2L * g + 1)).toSet, pairs.toSeq)
    assert(pairs.forall(_._3 <= 3))
    // hash relation contract: one row per input, null _h for the bad two
    val hs = Multimodal.perceptualHashes(imgs, "img", "img_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hs.size == 22 && hs(100L).isEmpty && hs(101L).isEmpty)
    assert(hs.filterKeys(_ < 100).forall(_._2.nonEmpty))
    // incremental: first 5 groups persisted as the store, the rest (and
    // the junk) arrive as a batch — cross+new pairs must equal the
    // batch pairs touching the new keys
    val storeSigs = Multimodal.perceptualHashes(
      imgs.filter($"img_id" < 10), "img", "img_id")
    val newSigs = Multimodal.perceptualHashes(
      imgs.filter($"img_id" >= 10), "img", "img_id")
    val (incPairs, updated) =
      graft.operators.Dedup.simhashNearDuplicatesIncrementalFromSigs(
        newSigs, storeSigs, "img_id")
    val got = incPairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (5 until 10).map(g => (2L * g, 2L * g + 1)).toSet, got)
    assert(updated.count() == 22)
  }

  test("perceptual hash kernels: brightness/contrast invariance of " +
      "dHash, exact-copy stability, and structural sensitivity") {
    val w = 32; val h = 32
    def pix(f: (Int, Int) => Int): Array[Byte] = {
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff
        val i = (y * w + x) * 3
        px(i) = v.toByte; px(i + 1) = v.toByte; px(i + 2) = v.toByte
      }
      px
    }
    // luma kept in [0, 192) so the +40 brightness shift below never
    // clips (clipping would genuinely flatten gradients)
    def lum(g: Int)(x: Int, y: Int) = (scala.util.hashing.MurmurHash3
      .productHash((g, x / 4, y / 4)) & 0xff) * 3 / 4
    val base = pix(lum(1))
    // global brightness shift: every gradient sign survives → same dhash
    val brighter = pix((x, y) => lum(1)(x, y) + 40)
    assert(Multimodal.dhash64(w, h, base) ==
      Multimodal.dhash64(w, h, brighter))
    // exact copy: both hashes identical
    assert(Multimodal.ahash64(w, h, base) ==
      Multimodal.ahash64(w, h, base.clone()))
    // a structurally different image lands far away in hamming space
    val other = pix(lum(2))
    val d = java.lang.Long.bitCount(
      Multimodal.dhash64(w, h, base) ^ Multimodal.dhash64(w, h, other))
    assert(d > 10, s"distinct images too close: $d")
  }
}
