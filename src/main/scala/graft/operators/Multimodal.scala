package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.ImageHeaders

/** Multimodal column handling: image/audio/video as opaque BINARY columns
  * with typed metadata, plus the decode / feature-extract / resize /
  * frame-sample plumbing a training-data pipeline needs.
  *
  * Decode reality: still images ([[decodeImage]], JDK ImageIO —
  * PNG/JPEG/BMP/GIF), WAV/PCM audio ([[audioFeatures]], javax.sound), and
  * MP4 container metadata ([[withVideoMeta]]) are decoded FOR REAL with
  * JDK-built-in codecs. Only video FRAMES and compressed audio (mp3/ogg)
  * have no in-container codec; those stay on `decodeStub`, a deterministic
  * fake tensor derived from the bytes (size-bounded, reproducible),
  * clearly marked. All decode paths use the `mapPartitions` batch shape
  * (the Scala analog of `mapInPandas` — one iterator per partition so
  * codec setup amortizes per batch).
  */
object Multimodal {

  /** Attach real header metadata (format/width/height/channels) from the
    * binary payload — delegates to the single parse-UDF definition in
    * [[graft.sources.CorpusBinder.withImageMeta]].
    */
  def withMeta(df: DataFrame, bytesCol: String): DataFrame =
    graft.sources.CorpusBinder.withImageMeta(df, bytesCol,
      outputCol = s"${bytesCol}_meta")

  /** STUB pixel decode: a real implementation would decode `bytes` to a
    * H×W×C float tensor here (e.g. via a JNI codec); this deterministic
    * fake derives `dim` floats from a rolling hash of the bytes so
    * downstream plumbing (Welford stats, embedding ops, TFExample export)
    * is exercised end-to-end with reproducible values.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return Array.fill(dim)(0.0f)
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish rolling state
    var i = 0
    val n = math.min(bytes.length, 4096)
    while (i < n) { h = 31 * h + bytes(i); i += 1 }
    i = 0
    while (i < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = ((h >>> 33).toInt & 0xffff).toFloat / 65535.0f
      i += 1
    }
    out
  }

  /** Decode a binary column into a fixed-size feature tensor using the
    * partition-batched shape a real codec would use. `mapPartitions` keeps
    * one "decoder" per partition (amortized setup), mirroring mapInPandas
    * batch semantics.
    */
  def decodeToTensor(df: DataFrame, bytesCol: String, dim: Int,
      keyCol: String): DataFrame = {
    val keyIdx = df.schema.fieldIndex(keyCol)
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    // key rides through with its ORIGINAL type (schema-derived Row encoder)
    // so the documented "join back on the key" stays a same-type equi-join
    // — no implicit casts, no bigint→string coercion
    val outSchema = StructType(Seq(df.schema(keyCol),
      StructField("tensor", ArrayType(FloatType, containsNull = false))))
    df.mapPartitions { rows =>
      // real impl: initialize the codec ONCE here, then stream the batch
      rows.map { r =>
        val tensor = decodeStub(
          if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx),
          dim)
        Row(r.get(keyIdx), tensor)
      }
    }(Encoders.row(outSchema))
  }

  /** Real MP4 container metadata (duration/timescale/track counts) from
    * the binary payload — [[graft.sources.VideoHeaders]] box walking, no
    * codec. Null for non-MP4/corrupt payloads.
    */
  def withVideoMeta(df: DataFrame, bytesCol: String): DataFrame = {
    val parseUdf = udf((bytes: Array[Byte]) =>
      graft.sources.VideoHeaders.parse(bytes))
    df.withColumn(s"${bytesCol}_video_meta", parseUdf(col(bytesCol)))
  }

  /** REAL pixel decode via the JDK's built-in codecs
    * ([[graft.sources.ImageCodec]] — PNG/JPEG/BMP/GIF, no external
    * dependency). Returns a NEW (keyCol, width, height, pixels) relation —
    * other input columns are not carried (join back on the key if needed);
    * pixels use the H×W×3 BGR row-major layout every [[PixelOps]] kernel
    * consumes, so the mask → instance-box / repaint / class-id paths run
    * on actual images. Same mapPartitions batch shape as
    * [[decodeToTensor]]; the key column keeps its ORIGINAL type (and null
    * keys pass through as null); undecodable/null payloads yield
    * null fields (SQL null semantics).
    */
  def decodeImage(df: DataFrame, bytesCol: String,
      keyCol: String): DataFrame = {
    val keyIdx = df.schema.fieldIndex(keyCol)
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    // key keeps its original type — see decodeToTensor
    val outSchema = StructType(Seq(df.schema(keyCol),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", BinaryType)))
    df.mapPartitions { rows =>
      rows.map { r =>
        val dec = graft.sources.ImageCodec.decodeBgr(
          if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx))
        Row(r.get(keyIdx), dec.map(d => Int.box(d._1)).orNull,
          dec.map(d => Int.box(d._2)).orNull, dec.map(_._3).orNull)
      }
    }(Encoders.row(outSchema))
  }

  /** REAL audio decode + feature extraction via the JDK's built-in codecs
    * ([[graft.sources.AudioCodec]] — WAV/AIFF/AU PCM, no external
    * dependency). Returns a NEW (keyCol, sample_rate, channels,
    * duration_sec, rms, zcr) relation — other input columns are not
    * carried (join back on the key if needed); these are the signals an
    * audio-corpus quality filter thresholds on. Same mapPartitions batch
    * shape; the key column keeps its ORIGINAL type (null keys pass
    * through); undecodable/compressed payloads yield null
    * fields.
    */
  def audioFeatures(df: DataFrame, bytesCol: String,
      keyCol: String): DataFrame = {
    val keyIdx = df.schema.fieldIndex(keyCol)
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    // key keeps its original type — see decodeToTensor
    val outSchema = StructType(Seq(df.schema(keyCol),
      StructField("sample_rate", FloatType),
      StructField("channels", IntegerType),
      StructField("duration_sec", DoubleType),
      StructField("rms", DoubleType),
      StructField("zcr", DoubleType)))
    df.mapPartitions { rows =>
      rows.map { r =>
        val dec = graft.sources.AudioCodec.decodePcm(
          if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx))
        val feats = dec.map(graft.sources.AudioCodec.features)
        Row(r.get(keyIdx), dec.map(d => Float.box(d.sampleRate)).orNull,
          dec.map(d => Int.box(d.channels)).orNull,
          feats.map(f => Double.box(f._1)).orNull,
          feats.map(f => Double.box(f._2)).orNull,
          feats.map(f => Double.box(f._3)).orNull)
      }
    }(Encoders.row(outSchema))
  }

  /** Area-average grayscale downsample of an H×W×3 BGR image to a
    * `gw`×`gh` luma grid (ITU-R BT.601 weights, the standard perceptual
    * luma) — the shared front half of [[dhash64]]/[[ahash64]]. Cells
    * partition the pixel box proportionally; images smaller than the
    * grid reuse clamped ≥ 1-pixel cells, so any decodable image hashes.
    */
  private[graft] def grayGrid(w: Int, h: Int, bgr: Array[Byte],
      gw: Int, gh: Int): Array[Double] = {
    val out = new Array[Double](gw * gh)
    var gy = 0
    while (gy < gh) {
      val y0 = math.min((gy.toLong * h / gh).toInt, h - 1)
      val y1 = math.max(((gy + 1).toLong * h / gh).toInt, y0 + 1)
      var gx = 0
      while (gx < gw) {
        val x0 = math.min((gx.toLong * w / gw).toInt, w - 1)
        val x1 = math.max(((gx + 1).toLong * w / gw).toInt, x0 + 1)
        var sum = 0.0
        var cnt = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val i = (y * w + x) * 3
            sum += 0.114 * (bgr(i) & 0xff) + 0.587 * (bgr(i + 1) & 0xff) +
              0.299 * (bgr(i + 2) & 0xff)
            cnt += 1
            x += 1
          }
          y += 1
        }
        out(gy * gw + gx) = if (cnt == 0) 0.0 else sum / cnt
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** 64-bit difference hash (dHash, the public perceptual-hash
    * technique): 9×8 luma grid, bit (row·8 + col) set when
    * `grid(row)(col) > grid(row)(col + 1)`. Robust to global
    * brightness/contrast shifts (only gradients survive); a small local
    * edit moves ≤ 2 grid cells and so ≤ 4 bits.
    */
  private[graft] def dhash64(w: Int, h: Int,
      bgr: Array[Byte]): Long = {
    val g = grayGrid(w, h, bgr, 9, 8)
    var hash = 0L
    var row = 0
    while (row < 8) {
      var c = 0
      while (c < 8) {
        if (g(row * 9 + c) > g(row * 9 + c + 1))
          hash |= 1L << (row * 8 + c)
        c += 1
      }
      row += 1
    }
    hash
  }

  /** 64-bit average hash (aHash): 8×8 luma grid, bit set when the cell
    * exceeds the grid mean. Simpler and slightly less edit-robust than
    * [[dhash64]]; kept for parity with common pipelines.
    */
  private[graft] def ahash64(w: Int, h: Int,
      bgr: Array[Byte]): Long = {
    val g = grayGrid(w, h, bgr, 8, 8)
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += g(i); i += 1 }
    mean /= 64
    var hash = 0L
    i = 0
    while (i < 64) {
      if (g(i) > mean) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Perceptual 64-bit fingerprints for an encoded-image binary column:
    * decode for real ([[graft.sources.ImageCodec]] — PNG/JPEG/BMP/GIF)
    * and hash with dHash (default) or aHash. Returns the `(keyCol, _h)`
    * relation every hamming-space dedup consumer takes —
    * [[Dedup.hammingNearDuplicates]] for batch pairs,
    * [[Dedup.simhashNearDuplicatesIncrementalFromSigs]] against a
    * persisted store, [[Dedup.simhashSignatures]]-compatible by schema.
    * Undecodable/null payloads yield a null `_h` and never pair. Same
    * `mapPartitions` batch shape as [[decodeImage]]; map-only, fuses
    * into the scan.
    */
  def perceptualHashes(df: DataFrame, bytesCol: String, keyCol: String,
      method: String = "dhash"): DataFrame = {
    require(method == "dhash" || method == "ahash",
      s"method must be 'dhash' or 'ahash', got '$method'")
    val keyIdx = df.schema.fieldIndex(keyCol)
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    val useD = method == "dhash"
    val outSchema = StructType(Seq(df.schema(keyCol),
      StructField("_h", LongType)))
    df.mapPartitions { rows =>
      rows.map { r =>
        val dec = graft.sources.ImageCodec.decodeBgr(
          if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx))
        val h = dec.map { case (w, ht, px) =>
          Long.box(if (useD) dhash64(w, ht, px) else ahash64(w, ht, px))
        }.orNull
        Row(r.get(keyIdx), h)
      }
    }(Encoders.row(outSchema))
  }

  /** Near-duplicate image pairs — the multimodal member of the dedup
    * family: perceptual fingerprints ([[perceptualHashes]]) through the
    * banded hamming join ([[Dedup.hammingNearDuplicates]]) — four
    * 16-bit bands, bucket join under the skew cap, exact hamming
    * verification. Output `(key_a, key_b, hamming)`, `key_a < key_b`.
    * Never all-pairs: candidates only form inside shared band buckets,
    * the same scale shape as text simhash. For incremental ingest,
    * persist the hash relation and use
    * [[Dedup.simhashNearDuplicatesIncrementalFromSigs]].
    */
  def imageNearDuplicates(df: DataFrame, bytesCol: String,
      keyCol: String, maxDistance: Int = 3, maxBucketSize: Long = 5000,
      method: String = "dhash"): DataFrame =
    Dedup.hammingNearDuplicates(
      perceptualHashes(df, bytesCol, keyCol, method), keyCol,
      maxDistance, maxBucketSize, bits = 64, guardLabel = "imagehash")

  /** Frame sampling plumbing for video-like payloads: pick `k` evenly spaced
    * frame indices out of `frameCount` (deterministic; the decode of each
    * frame is the stub above). Pure column math.
    */
  def sampleFrameIndices(frameCount: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column =
    when(frameCount <= 0, array().cast("array<int>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), lit(k - 1)),
        i => least((i * frameCount).cast("double") / k,
          frameCount - 1).cast("int"))))

  /** Resize metadata transform: target box (maxW × maxH) preserving aspect
    * ratio — the header-level half of a resize; pixel work is the stub.
    */
  def fitWithin(width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column, maxW: Int, maxH: Int)
      : org.apache.spark.sql.Column = {
    val scale = least(lit(maxW).cast("double") / width,
      lit(maxH).cast("double") / height, lit(1.0))
    struct(
      ceil(width * scale).cast("int").as("width"),
      ceil(height * scale).cast("int").as("height"))
  }
}
