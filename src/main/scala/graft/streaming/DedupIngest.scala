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
  *   - `exact/v=<batchId>/`  — with `exactPrefilter = true`, the
  *     batch's FRESH content digests (append-only), so verbatim
  *     re-crawls drop before any shingling
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
  * [[compactStores]] periodically (with the query stopped) to fold the
  * version history into a few geometric size tiers and keep that
  * reconstruction narrow.
  */
object DedupIngest {

  /** One merged group from [[compactStores]]: the committed, adjacent
    * `versions` (all strictly below the family's max) were folded into
    * `v=<into>` (= `versions.max`), rewriting `bytes` parquet bytes. */
  final case class Fold(family: String, versions: Seq[Long], into: Long,
      bytes: Long)

  private val VersionDir = "^v=(\\d+)$".r
  private val StagingDir = "^\\.compact-v=(\\d+)$".r

  /** Finish any compaction that crashed between unlinking its fold
    * target and renaming the staged merge into place — the one window
    * where committed rows are on disk but invisible (the staged
    * directory carries its own `_SUCCESS` from the merged write).
    * Rename is atomic, so a raced second healer simply loses the rename
    * and moves on. Incomplete staging directories (no `_SUCCESS`, or
    * the target still present) are left alone here — readers never
    * delete; [[compactStores]] sweeps them. Returns true if anything
    * was healed (the caller's listing is stale). */
  private def healStagedCompactions(
      fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      entries: Seq[org.apache.hadoop.fs.FileStatus]): Boolean = {
    var attempted = false
    for (s <- entries; if s.isDirectory;
        m <- StagingDir.findFirstMatchIn(s.getPath.getName)) {
      val target = new Path(dir, s"v=${m.group(1)}")
      if (!fs.exists(target) &&
          fs.exists(new Path(s.getPath, "_SUCCESS"))) {
        attempted = true
        // rename is atomic; a raced second healer loses and finds the
        // target present. But if the rename failed AND the target is
        // still missing, the staged merge holds the ONLY copy of
        // committed rows — proceeding would silently dedup against a
        // store with a hole in it, so fail instead.
        if (!fs.rename(s.getPath, target) && !fs.exists(target))
          throw new IllegalStateException(
            s"committed rows are stranded in ${s.getPath}: a crashed " +
              s"compaction's staged merge could not be renamed to " +
              s"$target — repair the filesystem state before reading " +
              "this store")
      }
    }
    // any attempt (won or raced) invalidates the caller's listing
    attempted
  }

  private def committedVersions(spark: SparkSession, dir: String,
      below: Long): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val entries = fs.listStatus(p).toSeq
      val listed =
        if (healStagedCompactions(fs, p, entries)) fs.listStatus(p).toSeq
        else entries
      listed
        .filter(_.isDirectory)
        // only ^v=\d+$ — a foreign or leftover directory (v=1.bak, a
        // staging dir, an editor artifact) must not crash every batch
        .flatMap(s => VersionDir.findFirstMatchIn(s.getPath.getName)
          .flatMap(m => scala.util.Try(m.group(1).toLong).toOption)
          .map(v => (v, s.getPath)))
        .filter { case (_, d) => fs.exists(new Path(d, "_SUCCESS")) }
        .map(_._1)
        .filter(_ < below)
        .sorted
    }
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

  /** The live exact-digest store (the optional prefilter family) from
    * all committed deltas below `below`; schema-pinned like the
    * signature store. */
  private[graft] def loadExactStore(spark: SparkSession,
      storeRoot: String, batchLike: DataFrame, textCol: String,
      key: String, below: Long = Long.MaxValue): DataFrame = {
    val empty = Dedup.exactSignatures(batchLike.limit(0), Seq(textCol),
      key)
    val vs = committedVersions(spark, s"$storeRoot/exact", below)
    if (vs.isEmpty) empty
    else spark.read.schema(empty.schema)
      .parquet(dirs(storeRoot, "exact", vs): _*)
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

  /** The micro-batch key-order guard: every committed signature
    * version carries a one-row `_keyrange` parquet (underscore-prefixed
    * — invisible to the version's data readers) recording its min/max
    * key; a new batch's min key must exceed the max over all committed
    * ranges, enforcing the monotonically-increasing-unique-key contract
    * the whole incremental family rides on WITHOUT ever scanning the
    * store (metadata-sized: one tiny file per version, two one-row
    * aggregates). Versions written before this guard existed carry no
    * range and are skipped — best-effort for pre-existing stores. A
    * null comparison (empty batch, or an all-null range) skips the
    * check, mirroring SQL predicate semantics. */
  private def enforceKeyOrderGuard(batch: DataFrame, batchId: Long,
      storeRoot: String, key: String): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(storeRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rangeDirs = committedVersions(spark, s"$storeRoot/sig", batchId)
      .map(v => s"$storeRoot/sig/v=$v/_keyrange")
      .filter(d => fs.exists(new Path(d, "_SUCCESS")))
    if (rangeDirs.nonEmpty) {
      val viol = spark.read.parquet(rangeDirs: _*)
        .agg(max(col("maxKey")).as("_storeMax"))
        .crossJoin(batch.agg(min(col(key)).as("_batchMin")))
        .filter(col("_batchMin") <= col("_storeMax"))
        .collect()
      if (viol.nonEmpty)
        throw new IllegalStateException(
          s"key-order contract violated: batch $batchId min key " +
            s"${viol(0).get(1)} does not exceed the store's max key " +
            s"${viol(0).get(0)} — keys must be globally unique and " +
            "monotonically increasing across batches (the keep-first " +
            "contract; see DedupIngest.start); pass enforceKeyOrder = " +
            "false to disable the guard")
    }
  }

  /** One micro-batch, exposed for direct testing of idempotence. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      storeRoot: String, keptDir: String, textCol: String, key: String,
      numHashes: Int, bands: Int, shingleSize: Int, threshold: Double,
      seed: Long, maxBucketSize: Long,
      enforceKeyOrder: Boolean = true,
      exactPrefilter: Boolean = false): Unit = {
    val spark = batch.sparkSession
    if (enforceKeyOrder)
      enforceKeyOrderGuard(batch, batchId, storeRoot, key)
    // optional stage 0: drop verbatim re-crawls against the digest
    // store BEFORE any shingling — exact dups are the common case in
    // re-crawl traffic and shingling them is pure waste; a dropped
    // doc's near-dup future matches still work because its identical
    // original already sits in the signature store. The `exact/`
    // family is append-only fresh digests, batchId-addressed like the
    // others (idempotent under redelivery).
    val work =
      if (!exactPrefilter) batch
      else {
        val exactStore = loadExactStore(spark, storeRoot, batch,
          textCol, key, below = batchId)
        val (exactKept, freshSigs, _) =
          Dedup.dropExactDuplicatesIncrementalDetailed(
            batch, exactStore, Seq(textCol), key)
        val ek = exactKept.localCheckpoint(false)
        // the fresh signatures ARE the delta — writing them directly
        // avoids digesting the batch a second time
        freshSigs.write.mode("overwrite")
          .parquet(s"$storeRoot/exact/v=$batchId")
        ek
      }
    val sigStore = loadSignatureStore(spark, storeRoot, batch, textCol,
      key, below = batchId)
    val labelStore = loadLabelStore(spark, storeRoot, batch, key,
      below = batchId)
    val (pairs, _) = Dedup.minhashNearDuplicatesIncremental(
      work, sigStore, textCol, key, numHashes, bands, shingleSize,
      threshold, seed, cacheSignatures = true, maxBucketSize)
    // the delta form hands back exactly the rows to persist — a full
    // updated relation would need a corpus×corpus comparison join
    // against the prior store every micro-batch to find them
    val changed = Dedup.connectedComponentsIncrementalDelta(labelStore,
        pairs.localCheckpoint(false))
      .select(col("key"), col("component"), lit(batchId).as("_v"))
      .localCheckpoint(false)
    val kept = work.join(
      changed.filter(col("component") =!= col("key"))
        .select(col("key").as(key)), Seq(key), "left_anti")
    // all outputs are batchId-addressed wholesale overwrites — see the
    // exactly-once note in the object doc
    Dedup.minhashSignatures(work, textCol, key, numHashes, bands,
        shingleSize, seed)
      .write.mode("overwrite").parquet(s"$storeRoot/sig/v=$batchId")
    // the guard sidecar rides after the data commit: a crash between
    // the two leaves a committed version the guard merely skips
    batch.agg(min(col(key)).as("minKey"), max(col(key)).as("maxKey"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$storeRoot/sig/v=$batchId/_keyrange")
    changed.write.mode("overwrite")
      .parquet(s"$storeRoot/labels/v=$batchId")
    kept.write.mode("overwrite")
      .parquet(s"$keptDir/ingest_batch=$batchId")
  }

  /** Start the ingest query. `docs` is any streaming DataFrame carrying
    * `textCol` and a globally-unique `key` assigned monotonically
    * increasing across batches (the keep-first contract — see
    * QUICKSTART.md). That contract is ENFORCED per batch by default
    * via metadata-sized version key ranges (see
    * [[enforceKeyOrderGuard]]) — a violated contract would not error,
    * it would silently corrupt keep-first semantics and cluster
    * labels; pass `enforceKeyOrder = false` only when the upstream key
    * assignment is trusted and the two tiny per-batch aggregates
    * matter. The minhash knobs mirror
    * [[Dedup.minhashNearDuplicates]].
    */
  def start(docs: DataFrame, textCol: String, key: String,
      storeRoot: String, keptDir: String, checkpointDir: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      threshold: Double = 0.9, seed: Long = 42,
      maxBucketSize: Long = 10000,
      enforceKeyOrder: Boolean = true,
      exactPrefilter: Boolean = false): StreamingQuery = {
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
          numHashes, bands, shingleSize, threshold, seed, maxBucketSize,
          enforceKeyOrder, exactPrefilter)
      }
      .start()
  }

  /** Collapse the version history (signatures unioned, labels resolved
    * latest-per-key) under a SIZE-TIERED policy. Run with the ingest
    * query STOPPED — compaction rewrites directories a running batch
    * may be reading.
    *
    * POLICY — tiered, not monolithic: folding the whole history into
    * one version every call is an O(store) rewrite per call, which at
    * corpus scale means periodically rewriting the entire signature
    * store. Instead, adjacent committed versions are grouped oldest →
    * newest with the classic merge rule: a run of newer versions folds
    * into the next older one only once the run's bytes reach within
    * `sizeRatio` of it (`newerBytes × sizeRatio ≥ olderBytes`). The
    * surviving tiers grow geometrically, so each byte is rewritten
    * O(log_ratio(store/delta)) times over the store's lifetime and a
    * large settled version is touched only when the data accumulated
    * after it is comparable to it. Pass `sizeRatio =
    * Double.PositiveInfinity` for the old fold-everything behavior.
    * Groups are contiguous and fold into the group's own maximum
    * version, so every directory `v=N` always holds rows from versions
    * ≤ N and the readers' `below = batchId` prefix filter stays exact.
    *
    * Only versions STRICTLY BELOW the highest are ever folded. The
    * highest version must survive untouched because `foreachBatch`
    * commits its epoch AFTER the batch function returns — a stop in
    * that window re-delivers the last batch on restart, and its retry
    * reads versions `< batchId`; folding history into the max would
    * make that retry see an empty store and overwrite the merged data
    * with a batch-sized delta. Every version below the max has provably
    * committed (offsets advance in order), so folding them is safe.
    *
    * CRASH SAFETY — staged commit: each group's merge is written to
    * `.compact-v=<into>` (invisible to readers, with its own `_SUCCESS`
    * once complete), then committed by unlinking `v=<into>` and
    * atomically renaming the staging directory over it, and only then
    * are the other source versions deleted. Every committed version
    * therefore remains readable until the merged data is fully on
    * disk. A crash inside the two-metadata-op unlink/rename window
    * leaves the merge complete but unlinked — the next reader or
    * compaction heals it by finishing the rename
    * ([[healStagedCompactions]]). A crash after the rename but before
    * the source deletes leaves duplicate rows across versions, which
    * the store semantics already collapse (signatures are immutable
    * per key; labels resolve latest-per-key) and the next compaction
    * removes.
    *
    * Returns the folds performed, with the parquet bytes each rewrote
    * — the observability hook for sizing `sizeRatio`.
    */
  def compactStores(spark: SparkSession, storeRoot: String,
      sizeRatio: Double = 4.0): Seq[Fold] = {
    require(sizeRatio >= 1.0, s"sizeRatio must be >= 1, got $sizeRatio")
    val fs = new Path(storeRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // adjacent-run grouping: push versions oldest -> newest, cascading
    // a merge whenever the newest tier is within sizeRatio of the one
    // below it; cascades let accumulated small tiers climb into the
    // settled large ones exactly when they have earned the rewrite
    def tiers(sized: Seq[(Long, Long)]): List[(Vector[Long], Long)] = {
      var stack = List.empty[(Vector[Long], Long)] // head = newest tier
      for ((v, bytes) <- sized) {
        stack ::= (Vector(v), bytes)
        // the isPosInfinity arm dodges 0 bytes × Infinity = NaN for
        // empty deltas under the fold-everything ratio
        while (stack.lengthCompare(2) >= 0 && (sizeRatio.isPosInfinity ||
            stack.head._2 * sizeRatio >= stack(1)._2)) {
          val (nv, nb) :: (ov, ob) :: rest = stack: @unchecked
          stack = (ov ++ nv, ob + nb) :: rest
        }
      }
      stack.reverse
    }

    def compact(family: String,
        resolve: DataFrame => DataFrame): Seq[Fold] = {
      val famDir = s"$storeRoot/$family"
      // sweep staging leftovers a crash may have orphaned: completed
      // ones were healed by committedVersions below the first read;
      // whatever remains is an incomplete attempt whose sources are
      // all still committed, so it is safe to drop
      val all = committedVersions(spark, famDir, Long.MaxValue)
      if (fs.exists(new Path(famDir)))
        for (s <- fs.listStatus(new Path(famDir));
            if StagingDir.findFirstMatchIn(s.getPath.getName).isDefined)
          fs.delete(s.getPath, true)
      val vs = if (all.isEmpty) all else all.filter(_ < all.max)
      val sized = vs.map(v =>
        v -> fs.getContentSummary(new Path(s"$famDir/v=$v")).getLength)
      for ((group, _) <- tiers(sized); if group.size > 1) yield {
        val vInto = group.max
        val staging = new Path(s"$famDir/.compact-v=$vInto")
        val target = new Path(s"$famDir/v=$vInto")
        resolve(spark.read.parquet(dirs(storeRoot, family, group): _*))
          .write.mode("overwrite").parquet(staging.toString)
        // carry the key-order guard's range sidecars through the fold
        // (union of whichever sources have one — a missing source range
        // was unguarded anyway, and understating never false-positives)
        val srcRanges = group
          .map(v => s"$famDir/v=$v/_keyrange")
          .filter(d => fs.exists(new Path(d, "_SUCCESS")))
        if (srcRanges.nonEmpty)
          spark.read.parquet(srcRanges: _*)
            .agg(min(col("minKey")).as("minKey"),
              max(col("maxKey")).as("maxKey"))
            .coalesce(1).write.mode("overwrite")
            .parquet(new Path(staging, "_keyrange").toString)
        fs.delete(target, true)
        if (!fs.rename(staging, target) && !fs.exists(target))
          throw new IllegalStateException(
            s"compaction commit failed: could not rename $staging " +
              s"over $target")
        group.filter(_ != vInto).foreach(v =>
          fs.delete(new Path(s"$famDir/v=$v"), true))
        Fold(family, group, vInto, fs.getContentSummary(target).getLength)
      }
    }

    compact("sig", _.dropDuplicates()) ++
      compact("exact", _.dropDuplicates()) ++
      compact("labels", df => graft.operators.AggOps.latestByKey(df,
        Seq("key"), "_v", Seq("component"))
        .select(col("key"), col("component"), col("_v")))
  }
}
