package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * score every corpus row, per-query top-k via window. One pass over the
  * corpus, no corpus self-shuffle: at 100 TB this is a map-side scan.
  *
  * Scale path: random-hyperplane LSH — bucket corpus and queries by sign
  * bits, join on bucket, verify exact cosine only within buckets. Trades
  * recall for turning the scan into a hash join on bucket keys.
  */
object Similarity {

  // All dot products here — the per-ROW norms and the per-PAIR scores —
  // ride the native codegen'd ArrayDotProduct expression via
  // VectorFunctions.dot: no UDF serialization boundary, no
  // interpreted-per-element HOF tree, stays inside the generated loop.

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k. `queries` must be small enough to broadcast
    * (it is hash-joined against every corpus row).
    * Output: (query_key, neighbor key, cosine, rank) excluding self-matches.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, embCol: String,
      key: String, k: Int): DataFrame = {
    val q = queries.select(col(key).as("query_id"),
      asDouble(col(embCol)).as("_q_emb"),
      norm(col(embCol)).as("_q_n"))
    val scored = corpus
      .select(col(key), asDouble(col(embCol)).as("_c_emb"),
        norm(col(embCol)).as("_c_n"))
      .join(broadcast(q), col(key) =!= col("query_id"))
      .select(col("query_id"), col(key).as("neighbor_id"),
        (dot(col("_q_emb"), col("_c_emb"))
          / (col("_q_n") * col("_c_n"))).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes: `numBits` vectors of `dim` gaussians
    * from a seeded RNG — computed once per operator call and captured in
    * the bucketing kernel's closure.
    */
  private def hyperplanes(dim: Int, numBits: Int,
      seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id for an embedding: bit i = (v · plane_i) > 0.
    *
    * JVM-loop kernel, not a Catalyst HOF tree: the per-ROW cost is
    * numBits × dim multiply-adds, and the previous `aggregate`+`zip_with`
    * formulation evaluated every one of them as an interpreted expression
    * (the same ~100× tax [[graft.operators.Dedup.Kernels]] documents).
    * Values are bit-identical to that formulation: same seeded plane
    * order, same strict `> 0` sign rule, bit i weighted 2^i. Null
    * embeddings AND embeddings containing a null element bucket to null
    * and so drop out of the bucket equi-join (the old HOF form gave them
    * bucket 0 via null dot products; downstream results were identical
    * because the cosine verify already dropped such pairs — but a typed
    * Seq[Double] UDF would CRASH on a null element, so the boxed element
    * type here is load-bearing).
    */
  def lshBucket(emb: Column, dim: Int, numBits: Int = 16,
      seed: Long = 42): Column = {
    val planes = hyperplanes(dim, numBits, seed)
    val kernel = udf((v: Seq[java.lang.Double]) => {
      if (v == null || v.contains(null)) null
      else {
        var acc = 0L
        var b = 0
        while (b < planes.length) {
          val p = planes(b)
          val n = math.min(v.length, p.length)
          var d = 0.0
          var i = 0
          while (i < n) { d += v(i) * p(i); i += 1 }
          if (d > 0) acc |= (1L << b)
          b += 1
        }
        java.lang.Long.valueOf(acc)
      }
    }: java.lang.Long)
    kernel(asDouble(emb))
  }

  /** LSH-bucketed near-neighbor pairs: same-bucket candidates verified with
    * exact cosine ≥ threshold. Output: (key_a, key_b, cosine), key_a < key_b.
    */
  def lshNeighborPairs(corpus: DataFrame, embCol: String, key: String,
      dim: Int, numBits: Int = 16, threshold: Double = 0.8,
      seed: Long = 42): DataFrame = {
    // norms hoisted per row; pair cost is one fast dot + a divide
    val bucketed = corpus.select(col(key),
      asDouble(col(embCol)).as("_emb"),
      norm(col(embCol)).as("_n"),
      lshBucket(col(embCol), dim, numBits, seed).as("_bucket"))
    val a = bucketed.select(col(key).as("key_a"),
      col("_emb").as("_emb_a"), col("_n").as("_n_a"), col("_bucket"))
    val b = bucketed.select(col(key).as("key_b"),
      col("_emb").as("_emb_b"), col("_n").as("_n_b"), col("_bucket"))
    a.join(b, Seq("_bucket"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        (dot(col("_emb_a"), col("_emb_b"))
          / (col("_n_a") * col("_n_b"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("key_a", "key_b")
  }

  /** Deterministic "training-free" IVF centroids: the first `nlist` corpus
    * rows by content hash of the key — no training pass, adequate when the
    * corpus has no strong cluster structure.
    */
  private def sampledCentroids(corpus: DataFrame, embCol: String,
      key: String, nlist: Int): DataFrame = corpus
    .select(col(key), asDouble(col(embCol)).as("_cv"))
    .orderBy(xxhash64(col(key)), col(key)).limit(nlist)
    // ≤ nlist rows here: number them in one partition WITHOUT a window
    // (an unpartitioned WindowExec warns and a constant partition key is
    // constant-folded away) — sort the single partition and use the
    // in-partition row offset.
    .repartition(1).sortWithinPartitions(col(key))
    .withColumn("_cid", (monotonically_increasing_id() + 1).cast("int"))
    .select("_cid", "_cv")

  /** Spherical k-means (Lloyd) refinement of the IVF centroids — the
    * quality path when the corpus IS clustered: hash-sampled init, then
    * `iters` rounds of assign-to-nearest + component-wise mean +
    * re-normalize. Output schema matches [[sampledCentroids]]:
    * (`_cid` int, `_cv` array<double>), centroids unit-length.
    *
    * Scale shape per round: the centroids live on the driver between
    * rounds (same bounded-collect class as the label dictionaries —
    * nlist × dim doubles), so assignment is a map-only JVM kernel over
    * the closure-captured centroid array — NO corpus shuffle, unlike the
    * broadcast-join + argmin aggregation [[ivfTopK]] needs for its
    * (queryable) assignment output. The only shuffle per round is the
    * component mean: posexplode to (cid, component) then an avg hash
    * aggregate — partial aggregation applies, and the shuffle carries
    * nlist × dim rows, not the corpus. A cluster that loses all members
    * keeps its previous centroid instead of vanishing.
    *
    * Component means average double sums whose partition order Spark does
    * not fix, so centroids are deterministic only to FP addition
    * reordering — use full probe (`nprobe = nlist`) where bit-stable
    * results matter; the top-k is then exhaustive and centroid jitter
    * cannot surface.
    */
  def kmeansCentroids(corpus: DataFrame, embCol: String, key: String,
      nlist: Int, iters: Int, cacheVecs: Boolean = true): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // Every Lloyd round launches its own job over the projection
    // (assignment + component mean), so without caching the SOURCE is
    // re-scanned and re-projected once per round — at 100 TB, `iters`
    // full-corpus scans dominate the training cost. Persist the narrow
    // (key, emb) relation across rounds when more than one round will
    // read it: MEMORY_AND_DISK spills rather than OOMs, and the relation
    // is the embedding column plus a key — a fraction of the source
    // table. This method is eager (it collects centroids every round),
    // so the unpersist in `finally` is deterministic — unlike lazy
    // operators, which must localCheckpoint instead (see
    // Dedup.minhashNearDuplicates). Set cacheVecs=false where executor
    // storage is scarcer than the re-scan is expensive.
    val projected = corpus.select(col(key), asDouble(col(embCol)).as("_emb"))
    val doCache = cacheVecs && iters > 1
    val vecs = if (doCache)
      projected.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else projected
    try kmeansLoop(vecs, corpus, embCol, key, nlist, iters)
    finally if (doCache) vecs.unpersist(blocking = false)
  }

  private def kmeansLoop(vecs: DataFrame, corpus: DataFrame, embCol: String,
      key: String, nlist: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    // cid-ascending order makes the kernel's keep-first tie-break match
    // min(struct(_d, _cid)) — equal dots resolve to the smallest cid
    var cents: Seq[(Int, Array[Double])] =
      sampledCentroids(corpus, embCol, key, nlist)
        .as[(Int, Array[Double])].collect().toSeq
        .map { case (cid, v) => (cid, normalize(v)) }
        .sortBy(_._1)
    for (_ <- 0 until iters) {
      val cids = cents.map(_._1).toArray
      val cvs = cents.map(_._2).toArray
      // map-only argmax-dot assignment (unit centroids: max-dot =
      // max-cosine); JVM loop kernel, not a Catalyst HOF tree — nlist ×
      // dim multiply-adds per row (see lshBucket for the rationale).
      // Null embeddings and null elements assign to null and drop out of
      // the mean (posexplode generates nothing for a null array).
      val assign = udf((v: Seq[java.lang.Double]) => {
        if (v == null || v.contains(null)) null
        else {
          var best = 0
          var bestD = Double.NegativeInfinity
          var c = 0
          while (c < cvs.length) {
            val p = cvs(c)
            val n = math.min(v.length, p.length)
            var d = 0.0
            var i = 0
            while (i < n) { d += v(i) * p(i); i += 1 }
            if (d > bestD) { bestD = d; best = c }
            c += 1
          }
          java.lang.Integer.valueOf(cids(best))
        }
      }: java.lang.Integer)
      // component-wise mean: explode to (cid, pos, x), avg, re-assemble
      // in component order (array_sort on the (pos, mean) struct sorts by
      // the leading pos field). The assignment is projected BELOW the
      // explode — in the same select, the generate would re-evaluate the
      // kernel once per exploded component (dim× per vector)
      val means = vecs
        .select(assign(col("_emb")).as("_cid"), col("_emb"))
        .filter(col("_cid").isNotNull)
        .select(col("_cid"), posexplode(col("_emb")).as(Seq("_pos", "_x")))
        .groupBy(col("_cid"), col("_pos"))
        .agg(avg(col("_x")).as("_m"))
        .groupBy(col("_cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("_pos"), col("_m")))),
          s => s.getField("_m")).as("_cv"))
      val updated = means.as[(Int, Array[Double])].collect().toMap
      cents = cents.map { case (cid, old) =>
        (cid, updated.get(cid).map(normalize).getOrElse(old))
      }
    }
    cents.toDF("_cid", "_cv")
  }

  /** IVF-style ANN (the second scale path besides sign-bit LSH): pick
    * `nlist` deterministic centroids (content-hash sample of the corpus,
    * optionally refined by `kmeansIters` rounds of spherical k-means),
    * assign every corpus row to its nearest centroid (one broadcast pass),
    * then answer each query by searching only the `nprobe` nearest
    * centroids' lists. Recall/cost knob = nprobe/nlist; the corpus scan
    * becomes a hash join on the centroid id. `kmeansIters = 0` (default)
    * keeps the training-free sampled centroids; on clustered corpora a few
    * Lloyd rounds align the lists with the real clusters and raise recall
    * at the same nprobe (see [[kmeansCentroids]] for the determinism
    * caveat).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, embCol: String,
      key: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      kmeansIters: Int = 0): DataFrame = {
    val centroids =
      if (kmeansIters > 0)
        kmeansCentroids(corpus, embCol, key, nlist, kmeansIters)
      else sampledCentroids(corpus, embCol, key, nlist)
    // assign each corpus row to nearest centroid (broadcast nested pass).
    // argmin via min(struct(_d, _cid, ...)): a hash aggregate with MAP-SIDE
    // combine, so the shuffle carries one row per corpus key — a window
    // would instead shuffle the full nlist-times-expanded relation
    // (embeddings included) and sort it. The (_d, _cid) prefix is unique
    // per key (distinct centroid ids), so the trailing payload fields can
    // never influence the comparison.
    val assigned = corpus
      .select(col(key), asDouble(col(embCol)).as("_emb"),
        norm(col(embCol)).as("_n"))
      .join(broadcast(centroids))
      .withColumn("_d", -dot(col("_emb"), col("_cv")))
      .groupBy(col(key))
      .agg(min(struct(col("_d"), col("_cid"), col("_emb"), col("_n")))
        .as("_best"))
      .select(col(key), col("_best._emb").as("_emb"),
        col("_best._n").as("_n"), col("_best._cid").as("_cid"))
    // each query probes its nprobe nearest centroid lists
    val probes = queries
      .select(col(key).as("query_id"), asDouble(col(embCol)).as("_q_emb"),
        norm(col(embCol)).as("_q_n"))
      .join(broadcast(centroids))
      .withColumn("_d", -dot(col("_q_emb"), col("_cv")))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("_d"), col("_cid"))))
      .filter(col("_rk") <= nprobe)
      .select(col("query_id"), col("_q_emb"), col("_q_n"), col("_cid"))
    probes.join(assigned, Seq("_cid"))
      .filter(col("query_id") =!= col(key))
      .select(col("query_id"), col(key).as("neighbor_id"),
        (dot(col("_q_emb"), col("_emb"))
          / (col("_q_n") * col("_n"))).as("cosine"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** Exact all-pairs cosine ≥ threshold — the brute-force baseline the LSH
    * and IVF paths approximate. O(n²): only for bounded or pre-filtered
    * corpora; at scale use [[lshNeighborPairs]]. Output: (key_a, key_b,
    * cosine) with key_a < key_b.
    */
  def cosinePairs(corpus: DataFrame, embCol: String, key: String,
      threshold: Double): DataFrame = {
    val withN = corpus.select(col(key), asDouble(col(embCol)).as("_emb"),
      norm(col(embCol)).as("_n"))
    val a = withN.select(col(key).as("key_a"), col("_emb").as("_emb_a"),
      col("_n").as("_n_a"))
    val b = withN.select(col(key).as("key_b"), col("_emb").as("_emb_b"),
      col("_n").as("_n_b"))
    a.crossJoin(b)
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        (dot(col("_emb_a"), col("_emb_b"))
          / (col("_n_a") * col("_n_b"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Embedding-cosine near-duplicate keys: pairs above threshold collapsed
    * to "drop the larger key" survivors (connected-components-free greedy,
    * adequate for sparse duplicate graphs).
    */
  def embeddingDedupDropList(corpus: DataFrame, embCol: String, key: String,
      dim: Int, numBits: Int = 16, threshold: Double = 0.95,
      seed: Long = 42): DataFrame =
    lshNeighborPairs(corpus, embCol, key, dim, numBits, threshold, seed)
      .select(col("key_b").as(key)).distinct()
}
