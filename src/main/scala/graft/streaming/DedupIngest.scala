package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming incremental near-dup dedup — the Structured Streaming form
  * of QUICKSTART.md's crawl-batch loop (not a reference capability; the
  * reference's closest analogue is its skip-existing incremental re-run,
  * `jigsaw/io_utils.py:89,150`). Each micro-batch is deduplicated
  * keep-first against the persisted signature + label stores via
  * [[Dedup.minhashNearDuplicatesIncremental]] and
  * [[Dedup.connectedComponentsIncremental]], kept rows land in
  * `keptDir/ingest_batch=<id>/`, and both stores advance by versioned
  * DELTAS under `storeRoot` — so a later run (or a batch job) resumes
  * against everything ingested so far.
  *
  * STORE LAYOUT under `storeRoot`:
  *   - `sig/v=<batchId>/`    — the batch's minhash signatures
  *     (append-only: signatures are immutable per key; the live store is
  *     the union of all committed versions)
  *   - `labels/v=<batchId>/` — the batch's CHANGED cluster labels only,
  *     each row carrying `_v = batchId`; the live store is
  *     latest-version-per-key over all committed versions (labels are
  *     not append-only — a bridge batch relabels old clusters)
  * A version counts only once its `_SUCCESS` marker exists, so
  * half-written attempts are invisible to readers.
  *
  * EXACTLY-ONCE: `foreachBatch` re-delivers a batch after failure with
  * the SAME batchId. Every per-batch output (both deltas and the kept
  * partition) is written with wholesale `Overwrite` into
  * batchId-addressed directories, and the store readers consider only
  * versions `< batchId` — a retry recomputes from exactly the same
  * committed prefix (the operators are seeded/deterministic) and
  * overwrites the same paths, making the batch idempotent end to end.
  *
  * SCALE SHAPE per micro-batch: the batch's text is shingled (twice —
  * once inside the incremental pair op, once for the delta write; both
  * batch-sized, the corpus is never re-shingled), the signature store is
  * re-read as narrow columnar parquet, and the label store is
  * reconstructed by a latest-per-key aggregation over deltas — call
  * [[compactStores]] periodically (with the query stopped) to collapse
  * the version history and keep that reconstruction one version wide.
  */
object DedupIngest {

  private def committedVersions(spark: SparkSession, dir: String,
      below: Long): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath)
      .filter(d => fs.exists(new Path(d, "_SUCCESS")))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(_ < below)
      .sorted
  }

  private def dirs(root: String, family: String, vs: Seq[Long]) =
    vs.map(v => s"$root/$family/v=$v")

  /** The live signature store from all committed deltas below `below`
    * (empty-schema fallback derived from `batchLike`; reads are
    * schema-pinned so an empty delta directory — a batch with no
    * shingleable docs writes only `_SUCCESS` — cannot break schema
    * inference). */
  private[graft] def loadSignatureStore(spark: SparkSession,
      storeRoot: String, batchLike: DataFrame, textCol: String,
      key: String, below: Long = Long.MaxValue): DataFrame = {
    val empty = Dedup.minhashSignatures(batchLike.limit(0), textCol, key)
    val vs = committedVersions(spark, s"$storeRoot/sig", below)
    if (vs.isEmpty) empty
    else spark.read.schema(empty.schema)
      .parquet(dirs(storeRoot, "sig", vs): _*)
  }

  /** The live label store: latest-version-per-key over all committed
    * deltas below `below`. */
  private[graft] def loadLabelStore(spark: SparkSession,
      storeRoot: String, batchLike: DataFrame, key: String,
      below: Long = Long.MaxValue): DataFrame = {
    val empty = batchLike.limit(0)
      .select(col(key).as("key"), col(key).as("component"),
        lit(0L).as("_v"))
    val vs = committedVersions(spark, s"$storeRoot/labels", below)
    if (vs.isEmpty) empty.select("key", "component")
    else
      graft.operators.AggOps.latestByKey(
        spark.read.schema(empty.schema)
          .parquet(dirs(storeRoot, "labels", vs): _*),
        Seq("key"), "_v", Seq("component"))
        .select("key", "component")
  }

  /** One micro-batch, exposed for direct testing of idempotence. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      storeRoot: String, keptDir: String, textCol: String, key: String,
      numHashes: Int, bands: Int, shingleSize: Int, threshold: Double,
      seed: Long, maxBucketSize: Long): Unit = {
    val spark = batch.sparkSession
    val sigStore = loadSignatureStore(spark, storeRoot, batch, textCol,
      key, below = batchId)
    val labelStore = loadLabelStore(spark, storeRoot, batch, key,
      below = batchId)
    val (pairs, _) = Dedup.minhashNearDuplicatesIncremental(
      batch, sigStore, textCol, key, numHashes, bands, shingleSize,
      threshold, seed, cacheSignatures = true, maxBucketSize)
    val labels = Dedup.connectedComponentsIncremental(labelStore,
      pairs.localCheckpoint(false))
    val changed = labels
      .join(labelStore.withColumnRenamed("component", "_old"),
        Seq("key"), "left")
      .filter(col("_old").isNull || col("_old") =!= col("component"))
      .select(col("key"), col("component"), lit(batchId).as("_v"))
      .localCheckpoint(false)
    val kept = batch.join(
      changed.filter(col("component") =!= col("key"))
        .select(col("key").as(key)), Seq(key), "left_anti")
    // all three outputs are batchId-addressed wholesale overwrites —
    // see the exactly-once note in the object doc
    Dedup.minhashSignatures(batch, textCol, key, numHashes, bands,
        shingleSize, seed)
      .write.mode("overwrite").parquet(s"$storeRoot/sig/v=$batchId")
    changed.write.mode("overwrite")
      .parquet(s"$storeRoot/labels/v=$batchId")
    kept.write.mode("overwrite")
      .parquet(s"$keptDir/ingest_batch=$batchId")
  }

  /** Start the ingest query. `docs` is any streaming DataFrame carrying
    * `textCol` and a globally-unique `key` assigned monotonically
    * increasing across batches (the keep-first contract — see
    * QUICKSTART.md). The minhash knobs mirror
    * [[Dedup.minhashNearDuplicates]].
    */
  def start(docs: DataFrame, textCol: String, key: String,
      storeRoot: String, keptDir: String, checkpointDir: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      threshold: Double = 0.9, seed: Long = 42,
      maxBucketSize: Long = 10000): StreamingQuery = {
    require(docs.isStreaming,
      "DedupIngest.start needs a streaming DataFrame — for batch data " +
        "use the QUICKSTART.md loop over the incremental operators")
    for (c <- Seq(textCol, key); if !docs.columns.contains(c))
      throw new IllegalArgumentException(
        s"docs is missing column '$c' (have: ${docs.columns.mkString(", ")})")
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeRoot, keptDir, textCol, key,
          numHashes, bands, shingleSize, threshold, seed, maxBucketSize)
      }
      .start()
  }

  /** Collapse the version history (signatures unioned, labels resolved
    * latest-per-key). Run with the ingest query STOPPED — compaction
    * rewrites directories a running batch may be reading.
    *
    * Only versions STRICTLY BELOW the highest are folded (into the
    * second-highest), leaving two directories per family. The highest
    * version must survive untouched because `foreachBatch` commits its
    * epoch AFTER the batch function returns — a stop in that window
    * re-delivers the last batch on restart, and its retry reads
    * versions `< batchId`; folding history into the max would make
    * that retry see an empty store and overwrite the merged data with
    * a batch-sized delta. Every version below the max has provably
    * committed (offsets advance in order), so folding them is safe.
    *
    * Crash-safe by re-run: a crash between the merged write and the
    * deletes leaves duplicate rows across versions, which the next
    * compaction's whole-row dropDuplicates (signatures are immutable
    * per key) and the labels' latest-per-key resolution both collapse.
    */
  def compactStores(spark: SparkSession, storeRoot: String): Unit = {
    def compact(family: String, resolve: DataFrame => DataFrame): Unit = {
      val all = committedVersions(spark, s"$storeRoot/$family",
        Long.MaxValue)
      val vs = if (all.isEmpty) all else all.filter(_ < all.max)
      if (vs.size > 1) {
        val vInto = vs.max
        val merged = resolve(
          spark.read.parquet(dirs(storeRoot, family, vs): _*))
          .localCheckpoint(true) // sever lineage from the dirs we delete
        val fs = new Path(storeRoot)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        merged.write.mode("overwrite")
          .parquet(s"$storeRoot/$family/v=$vInto")
        vs.filter(_ != vInto).foreach(v =>
          fs.delete(new Path(s"$storeRoot/$family/v=$v"), true))
      }
    }
    compact("sig", _.dropDuplicates())
    compact("labels", df => graft.operators.AggOps.latestByKey(df,
      Seq("key"), "_v", Seq("component"))
      .select(col("key"), col("component"), col("_v")))
  }
}
