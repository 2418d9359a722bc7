package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sources.ImageCodec
import graft.streaming.ImageDedupIngest

/** End-to-end checks for the streaming image dedup ingest: perceptual
  * near-dups dropped keep-first against the persisted fingerprint
  * store across batches and a query restart, undecodable payloads kept
  * but never stored, redelivery idempotence, compaction, and the
  * tombstone/deletion path.
  */
class ImageDedupIngestSpec extends SparkTestBase {
  import spark.implicits._

  /** MultimodalSpec's deterministic 32×32 "photo": 4×4 pseudo-random
    * luma blocks keyed by (group, block); `tweak` brightens the
    * top-left 2×2 pixels — the sub-cell edit dHash must shrug off.
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

  private def run(storeRoot: String, keptDir: String)(
      rows: Seq[(Long, Array[Byte])], id: Long): Unit =
    ImageDedupIngest.processBatch(rows.toDF("img_id", "img"), id,
      storeRoot, keptDir, "img", "img_id", maxDistance = 3,
      maxBucketSize = 5000, method = "dhash")

  private def keptByBatch(keptDir: String): Map[Long, Set[Long]] =
    spark.read.parquet(keptDir)
      .select($"ingest_batch".cast("long"), $"img_id")
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).map { case (b, r) => b -> r.map(_._2).toSet }

  private def storeKeys(storeRoot: String): Set[Long] =
    ImageDedupIngest.loadHashStore(spark, storeRoot,
        Seq((0L, Array.empty[Byte])).toDF("img_id", "img"), "img",
        "img_id")
      .select("img_id").as[Long].collect().toSet

  test("streaming image ingest: near-dups drop against the persisted " +
      "fingerprint store across a query restart, undecodable payloads " +
      "are kept but never stored, redelivery is idempotent, and " +
      "compaction is invisible to readers") {
    implicit val sqlCtx = spark.sqlContext
    val storeRoot = Files.createTempDirectory("graft-img-store").toString
    val keptDir = Files.createTempDirectory("graft-img-kept").toString
    val ckpt = Files.createTempDirectory("graft-img-ckpt").toString
    val mem = MemoryStream[(Long, Array[Byte])]
    val images = mem.toDF().toDF("img_id", "img")
    def startQuery() = ImageDedupIngest.start(images, "img", "img_id",
      storeRoot, keptDir, ckpt)

    val batch0 = Seq(1L -> blockyPng(0, tweak = false),
      2L -> blockyPng(1, tweak = false), 3L -> blockyPng(2, tweak = false))
    val batch1 = Seq(
      11L -> blockyPng(0, tweak = true), // near-dup of 1 → dropped
      12L -> blockyPng(3, tweak = false), // new group → kept
      13L -> Array[Byte](9, 9, 9),        // corrupt → kept, not stored
      14L -> null.asInstanceOf[Array[Byte]]) // null → kept, not stored

    val q1 = startQuery()
    try { mem.addData(batch0: _*); q1.processAllAvailable() }
    finally q1.stop()
    // restart from the same checkpoint: batch 1 must dedup against the
    // store the PREVIOUS query run persisted
    val q2 = startQuery()
    try { mem.addData(batch1: _*); q2.processAllAvailable() }
    finally q2.stop()

    assert(keptByBatch(keptDir) ==
      Map(0L -> Set(1L, 2L, 3L), 1L -> Set(12L, 13L, 14L)))
    // the store carries every decodable fingerprint (kept or dropped),
    // and nothing for the corrupt/null payloads
    assert(storeKeys(storeRoot) == Set(1L, 2L, 3L, 11L, 12L))

    // direct redelivery of the newest batch reproduces its outputs
    val before = (keptByBatch(keptDir), storeKeys(storeRoot))
    run(storeRoot, keptDir)(batch1, 1L)
    assert((keptByBatch(keptDir), storeKeys(storeRoot)) == before)

    // compaction folds history below the newest version and changes
    // nothing a reader sees; the post-compaction retry still works
    ImageDedupIngest.compactStores(spark, storeRoot,
      sizeRatio = Double.PositiveInfinity)
    assert((keptByBatch(keptDir), storeKeys(storeRoot)) == before)
    run(storeRoot, keptDir)(batch1, 1L)
    assert((keptByBatch(keptDir), storeKeys(storeRoot)) == before)
  }

  test("image-store tombstones: deleted images vanish from the " +
      "fingerprint store, deleted content re-ingests fresh, the " +
      "key-order guard keeps the all-time max, and compaction applies " +
      "the tombstones physically") {
    val storeRoot = Files.createTempDirectory("graft-img-tomb").toString
    val keptDir = Files.createTempDirectory("graft-img-tomb-k").toString
    val go = run(storeRoot, keptDir) _
    go(Seq(1L -> blockyPng(0, tweak = false),
      2L -> blockyPng(1, tweak = false)), 0L)
    go(Seq(11L -> blockyPng(0, tweak = true), // dropped near-dup of 1
      12L -> blockyPng(5, tweak = false)), 1L)
    assert(keptByBatch(keptDir) == Map(0L -> Set(1L, 2L), 1L -> Set(12L)))

    // tombstone the whole group-0 cluster: the kept representative 1
    // AND its dropped near-twin 11 (whose stored fingerprint would
    // otherwise keep recognizing the content)
    ImageDedupIngest.deleteKeys(spark, storeRoot,
      Seq(1L, 11L).toDF("img_id"))
    assert(storeKeys(storeRoot) == Set(2L, 12L))

    // the store no longer recognizes the deleted content: a verbatim
    // re-crawl of group 0 re-ingests fresh, while group 1 still drops
    go(Seq(21L -> blockyPng(0, tweak = false),
      22L -> blockyPng(1, tweak = true)), 2L)
    assert(keptByBatch(keptDir)(2L) == Set(21L))

    // deletion never frees key space
    val guardErr = intercept[IllegalStateException] {
      go(Seq(11L -> blockyPng(9, tweak = false)), 3L)
    }
    assert(guardErr.getMessage.contains("key-order"), guardErr.getMessage)

    // compaction applies the tombstones physically (raw, anti-join-free
    // disk read) and keeps the tombstone family for the unfolded tail
    val before = (keptByBatch(keptDir), storeKeys(storeRoot))
    ImageDedupIngest.compactStores(spark, storeRoot,
      sizeRatio = Double.PositiveInfinity)
    assert((keptByBatch(keptDir), storeKeys(storeRoot)) == before,
      "compaction must be invisible to readers")
    val rawStore = new java.io.File(s"$storeRoot/phash").listFiles()
      .filter(_.getName.startsWith("v=")).map(_.toString)
      .flatMap(d => spark.read.parquet(d).select("img_id")
        .as[Long].collect())
      .toSet
    assert(!rawStore.contains(1L) && !rawStore.contains(11L), rawStore)
    assert(new java.io.File(s"$storeRoot/tombstones").listFiles()
      .exists(_.getName.startsWith("v=")),
      "tombstone family must survive compaction")
  }

  test("hash-method tripwire: restarting over a dhash-built store with " +
      "ahash fails loud instead of silently missing every historical " +
      "duplicate; solid-color (zero-fingerprint) stores never trip " +
      "the 32-bit width check") {
    val storeRoot = Files.createTempDirectory("graft-img-meth").toString
    val keptDir = Files.createTempDirectory("graft-img-meth-k").toString
    // a batch of SOLID-COLOR images: dHash legitimately all-zero
    // fingerprints (no gradient sets no bit) — the store the text-side
    // width heuristic would have false-tripped on
    def solidPng(v: Int): Array[Byte] = {
      val w = 8; val h = 8
      val px = Array.fill(w * h * 3)(v.toByte)
      ImageCodec.encodePng(w, h, px)
    }
    ImageDedupIngest.processBatch(
      Seq(1L -> solidPng(40), 2L -> solidPng(200))
        .toDF("img_id", "img"),
      0L, storeRoot, keptDir, "img", "img_id", maxDistance = 3,
      maxBucketSize = 5000, method = "dhash")
    // the next batch banding against the all-zero store must work, not
    // throw the 32-bit tripwire (and the two solids ARE hamming-0 dups
    // of each other, so the later key dropped in batch 0 already)
    assert(keptByBatch(keptDir)(0L) == Set(1L))
    ImageDedupIngest.processBatch(
      Seq(11L -> solidPng(90)).toDF("img_id", "img"),
      1L, storeRoot, keptDir, "img", "img_id", maxDistance = 3,
      maxBucketSize = 5000, method = "dhash")
    assert(!keptByBatch(keptDir).contains(1L),
      "the solid re-crawl must drop against the zero-fingerprint store")
    // method switch fails loud
    val err = intercept[IllegalStateException] {
      ImageDedupIngest.processBatch(
        Seq(21L -> solidPng(10)).toDF("img_id", "img"),
        2L, storeRoot, keptDir, "img", "img_id", maxDistance = 3,
        maxBucketSize = 5000, method = "ahash")
    }
    assert(err.getMessage.contains("method='dhash'"), err.getMessage)

    // a crash mid-marker-write leaves an empty file: treated as absent
    // and rewritten, NOT mismatched against every method string
    val marker = new java.io.File(s"$storeRoot/phash/_method")
    assert(marker.isFile)
    new java.io.FileOutputStream(marker).close() // truncate to empty
    ImageDedupIngest.processBatch(
      Seq(31L -> solidPng(60)).toDF("img_id", "img"),
      3L, storeRoot, keptDir, "img", "img_id", maxDistance = 3,
      maxBucketSize = 5000, method = "dhash")
    assert(scala.io.Source.fromFile(marker).mkString.trim == "dhash",
      "empty (crash-truncated) marker must be rewritten")
    // and the rewritten marker still trips on a method switch
    intercept[IllegalStateException] {
      ImageDedupIngest.processBatch(
        Seq(41L -> solidPng(15)).toDF("img_id", "img"),
        4L, storeRoot, keptDir, "img", "img_id", maxDistance = 3,
        maxBucketSize = 5000, method = "ahash")
    }
  }
}
