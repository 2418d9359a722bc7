package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.DedupIngest

/** End-to-end checks for the streaming incremental dedup ingest: the
  * QUICKSTART fixture corpus delivered as micro-batches, store
  * continuity across a query restart, redelivery idempotence, and
  * version compaction.
  */
class DedupIngestSpec extends SparkTestBase {
  import spark.implicits._

  // the QuickstartSpec planted corpus (see its comments): exact dup A,
  // near dups B/C, per-batch singletons, and the F bridge chain
  private def words(tag: String) = (1 to 30).map(i => s"$tag$i").toVector
  private val A = words("alpha").mkString(" ")
  private val B = words("beta").mkString(" ")
  private val bNear = B.replace("beta15", "x15")
  private val C = words("gamma").mkString(" ")
  private val cNear = C.replace("gamma7", "y7")
  private val f = words("delta")
  private val F1 = f.mkString(" ")
  private val F2 = f.updated(9, "bridge10").mkString(" ")
  private val F3 = f.updated(9, "bridge10").updated(19, "far20").mkString(" ")
  private val batches = Seq(
    Seq((1L, A), (2L, B), (3L, "first standalone text about maritime " +
      "navigation charts and tidal tables"), (4L, F1)),
    Seq((101L, A), (102L, bNear), (103L, C), (104L, F3)),
    Seq((201L, cNear), (202L, "another entirely different piece on " +
      "volcanic geology and basalt formations"), (203L, F2)))

  test("streaming ingest dedups each micro-batch against the persisted " +
      "stores, survives a query restart, redelivers idempotently, and " +
      "compacts") {
    implicit val sqlCtx = spark.sqlContext
    val storeRoot = Files.createTempDirectory("graft-ingest-store").toString
    val keptDir = Files.createTempDirectory("graft-ingest-kept").toString
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    def startQuery() = DedupIngest.start(docs, "text", "doc_id",
      storeRoot, keptDir, ckpt, threshold = 0.7)
    def keptByBatch(): Map[Long, Set[Long]] =
      spark.read.parquet(keptDir)
        .select($"ingest_batch".cast("long"), $"doc_id")
        .as[(Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (b, r) => b -> r.map(_._2).toSet }

    val q1 = startQuery()
    try {
      for (b <- batches.take(2)) { mem.addData(b: _*); q1.processAllAvailable() }
    } finally q1.stop()

    // restart from the same checkpoint: batch 2 must dedup against the
    // stores batches 0-1 persisted in the PREVIOUS query run
    val q2 = startQuery()
    try { mem.addData(batches(2): _*); q2.processAllAvailable() }
    finally q2.stop()

    assert(keptByBatch() == Map(
      0L -> Set(1L, 2L, 3L, 4L),
      1L -> Set(103L, 104L),
      2L -> Set(202L)), s"keep-sets: ${keptByBatch()}")

    // the label store reconstructs the bridged F-cluster under min 4
    def labels() = DedupIngest.loadLabelStore(spark, storeRoot,
        batches.head.toDF("doc_id", "text"), "doc_id")
      .as[(Long, Long)].collect().toMap
    val l0 = labels()
    assert(l0(203L) == 4L && l0(104L) == 4L && l0(102L) == 2L,
      s"labels: $l0")

    // redelivery idempotence: re-run the last batch with its own
    // batchId (the crash-retry path) — outputs must not change
    DedupIngest.processBatch(batches(2).toDF("doc_id", "text"), 2L,
      storeRoot, keptDir, "text", "doc_id", 64, 16, 3, 0.7, 42, 10000)
    assert(keptByBatch()(2L) == Set(202L), "retry changed the keep-set")
    assert(labels() == l0, "retry changed the label store")

    // compaction folds history below the newest version and keeps
    // reconstruction identical
    DedupIngest.compactStores(spark, storeRoot)
    assert(labels() == l0, "compaction changed the label store")
    val sigCount = DedupIngest.loadSignatureStore(spark, storeRoot,
      batches.head.toDF("doc_id", "text"), "text", "doc_id").count()
    assert(sigCount == batches.map(_.size).sum,
      s"signature store must cover every ingested doc: $sigCount")
    def versionDirs(family: String) =
      new java.io.File(s"$storeRoot/$family").listFiles()
        .filter(_.getName.startsWith("v=")).map(_.getName).toSet
    assert(versionDirs("sig") == Set("v=1", "v=2"),
      s"sig versions after compaction: ${versionDirs("sig")}")
    assert(versionDirs("labels") == Set("v=1", "v=2"),
      s"label versions after compaction: ${versionDirs("labels")}")

    // the retry guarantee compaction preserves: re-running the NEWEST
    // batch against the compacted history still sees the full store
    DedupIngest.processBatch(batches(2).toDF("doc_id", "text"), 2L,
      storeRoot, keptDir, "text", "doc_id", 64, 16, 3, 0.7, 42, 10000)
    assert(keptByBatch()(2L) == Set(202L), "post-compaction retry broke")
    assert(labels() == l0, "post-compaction retry changed labels")
  }

  test("an empty micro-batch writes empty deltas that later batches " +
      "read through the schema-pinned store readers") {
    val storeRoot = Files.createTempDirectory("graft-ingest-e").toString
    val keptDir = Files.createTempDirectory("graft-ingest-ek").toString
    val empty = batches.head.toDF("doc_id", "text").limit(0)
    DedupIngest.processBatch(empty, 0L, storeRoot, keptDir, "text",
      "doc_id", 64, 16, 3, 0.7, 42, 10000)
    // the empty version committed (parquet writes only _SUCCESS for a
    // zero-partition frame — exactly the case the pinned schemas cover)
    assert(new java.io.File(s"$storeRoot/sig/v=0/_SUCCESS").exists())
    DedupIngest.processBatch(batches.head.toDF("doc_id", "text"), 1L,
      storeRoot, keptDir, "text", "doc_id", 64, 16, 3, 0.7, 42, 10000)
    val kept = spark.read.parquet(s"$keptDir/ingest_batch=1")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L), s"kept after empty batch: $kept")
    val sigs = DedupIngest.loadSignatureStore(spark, storeRoot,
      empty, "text", "doc_id").count()
    assert(sigs == 4L, s"signature store rows: $sigs")
  }

  test("start validates its inputs loudly") {
    val notStreaming = intercept[IllegalArgumentException] {
      DedupIngest.start(batches.head.toDF("doc_id", "text"), "text",
        "doc_id", "/tmp/x", "/tmp/y", "/tmp/z")
    }
    assert(notStreaming.getMessage.contains("streaming"),
      notStreaming.getMessage)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val missingCol = intercept[IllegalArgumentException] {
      DedupIngest.start(mem.toDF().toDF("doc_id", "body"), "text",
        "doc_id", "/tmp/x", "/tmp/y", "/tmp/z")
    }
    assert(missingCol.getMessage.contains("'text'"), missingCol.getMessage)
  }
}
