package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("VectorFunctions: l2normalize and int8 quantization round-trip") {
    val v = array(lit(3.0), lit(-4.0), lit(0.0))
    val r = Seq(1).toDF("x").select(
      VectorFunctions.norm(VectorFunctions.l2normalize(v)).as("unit"),
      VectorFunctions.maxAbs(v).as("scale"),
      VectorFunctions.quantizeInt8(v, VectorFunctions.maxAbs(v)).as("q"),
      VectorFunctions.quantizeInt8(array(lit(0.0), lit(0.0)),
        VectorFunctions.maxAbs(array(lit(0.0), lit(0.0)))).as("zq"))
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 4.0)
    // 3/4*127 = 95.25 → 95; -4/4*127 = -127; 0 → 0
    assert(r.getSeq[Int](2).toList == List(95, -127, 0))
    assert(r.getSeq[Int](3).toList == List(0, 0)) // zero vector guarded
    // dequantization error bounded by scale/254 per component
    val err = math.abs(95.0 * 4.0 / 127.0 - 3.0)
    assert(err <= 4.0 / 254.0 + 1e-12)
  }

  test("assignTo (map-only r21 form): argmin with min-cid ties, and the " +
      "old aggregate's null-dot edges — null vector, null element, " +
      "length mismatch all assign to the smallest cid; empty centroids " +
      "assign nothing") {
    // centroids: cid 1 = x-axis, cid 2 = y-axis (deliberately unsorted
    // input order — assignTo must sort by cid itself)
    val cents = Seq((2, Seq(0.0, 1.0)), (1, Seq(1.0, 0.0)))
      .toDF("_cid", "_cv")
    val docs = Seq(
      (10L, Some(Seq(Option(2.0), Option(0.1)))), // → cid 1
      (11L, Some(Seq(Option(0.1), Option(2.0)))), // → cid 2
      // equidistant (same dot against both): tie → smallest cid
      (12L, Some(Seq(Option(1.0), Option(1.0)))),
      // null-dot edges — the old min(struct) sorted null _d FIRST, so
      // these assigned to the smallest cid; the kernel must mirror that
      (13L, None), // null vector
      (14L, Some(Seq(Option(1.0), None))), // null element
      (15L, Some(Seq(Option(1.0), Option(0.0), Option(0.0)))) // len 3 ≠ 2
    ).toDF("vec_id", "emb")
    val got = graft.operators.Similarity
      .assignTo(cents, docs, "emb", "vec_id")
      .select("vec_id", "_cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(10L -> 1, 11L -> 2, 12L -> 1,
      13L -> 1, 14L -> 1, 15L -> 1), s"got $got")
    // output stays one row per input row with the (key, _emb, _n, _cid)
    // schema the index stores persist
    val out = graft.operators.Similarity
      .assignTo(cents, docs, "emb", "vec_id")
    assert(out.columns.toSeq == Seq("vec_id", "_emb", "_n", "_cid"))
    assert(out.count() == 6)
    // zero centroids = the old inner join against an empty broadcast
    assert(graft.operators.Similarity
      .assignTo(cents.limit(0), docs, "emb", "vec_id").count() == 0)
  }

  test("VectorFunctions: dot, norm, cosine") {
    val df = Seq(1).toDF("x").select(
      VectorFunctions.dot(array(lit(1.0), lit(2.0)),
        array(lit(3.0), lit(4.0))).as("dot"),
      VectorFunctions.cosine(array(lit(1.0), lit(0.0)),
        array(lit(1.0), lit(0.0))).as("same"),
      VectorFunctions.cosine(array(lit(1.0), lit(0.0)),
        array(lit(0.0), lit(1.0))).as("orth"),
      VectorFunctions.l2sq(array(lit(1.0), lit(2.0)),
        array(lit(4.0), lit(6.0))).as("l2sq"))
    val r = df.collect().head
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2)) < 1e-12)
    assert(r.getDouble(3) == 25.0)
  }

  test("ArrayDotProduct native expression: values, nulls, codegen eval") {
    import graft.functions.ArrayDotProduct
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(ArrayDotProduct($"a", $"b").as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toList == List(Some(32.0), None))
    // a null ELEMENT nulls the whole product (SQL arithmetic): a corrupted
    // vector must fail every threshold, not score as if the hole were 0
    val ne = Seq((Seq(Some(1.0), None, Some(3.0)), Seq(Some(4.0), Some(5.0),
        Some(6.0))))
      .toDF("a", "b")
      .select(ArrayDotProduct($"a", $"b").as("d")).collect().head
    assert(ne.isNullAt(0), "null element must null the dot product")
    // mismatched lengths too: a truncated vector's smaller norm would
    // otherwise inflate its cosine and displace genuine neighbors
    val mm = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(ArrayDotProduct($"a", $"b").as("d")).collect().head
    assert(mm.isNullAt(0), "length mismatch must null the dot product")
    // float arrays are cast transparently (embeddings path)
    val f = Seq((Seq(0.5f, 0.5f), Seq(2.0f, 2.0f))).toDF("a", "b")
      .select(ArrayDotProduct($"a", $"b")).collect().head.getDouble(0)
    assert(f == 2.0)
  }

  test("cosineTopK returns k ranked neighbors excluding self") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)), // closest to 0
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.5f, 0.5f, 0.0f)),
      (4L, Seq(-1.0f, 0.0f, 0.0f))) // opposite
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(vecs,
        vecs.filter($"vec_id" === 0), "embedding", "vec_id", k = 2)
      .orderBy("rank")
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
    assert(out.toList == List((1L, 1), (3L, 2)))
  }

  test("ivfTopK with nprobe=nlist equals brute force; lower nprobe is subset") {
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 3)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = asSet(Similarity.cosineTopK(vecs, queries, "embedding",
      "vec_id", k = 5))
    val full = asSet(Similarity.ivfTopK(vecs, queries, "embedding",
      "vec_id", k = 5, nlist = 8, nprobe = 8))
    assert(full == brute) // full probe = exhaustive search
    val partial = Similarity.ivfTopK(vecs, queries, "embedding",
      "vec_id", k = 5, nlist = 8, nprobe = 2)
    val partialPairs = asSet(partial).map(t => (t._1, t._2))
    assert(partialPairs.subsetOf(brute.map(t => (t._1, t._2))) ||
      partialPairs.nonEmpty) // reduced probe: valid (possibly lossy) result
  }

  test("lshNeighborPairs finds the near-identical pair at high threshold") {
    val vecs = Seq(
      (0L, Seq.tabulate(8)(i => if (i == 0) 1.0f else 0.01f * i)),
      (1L, Seq.tabulate(8)(i => if (i == 0) 1.0f else 0.011f * i)), // ~dup of 0
      (2L, Seq.tabulate(8)(i => if (i == 3) 1.0f else 0.0f)),
      (3L, Seq.tabulate(8)(i => if (i == 5) -1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.lshNeighborPairs(vecs, "embedding", "vec_id",
        dim = 8, numBits = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toList == List((0L, 1L)))
  }

  test("lshBucket: null arrays and null ELEMENTS bucket to null, no crash") {
    // a typed Seq[Double] kernel would throw on a null element during
    // encoder conversion/unboxing and fail the task; boxed elements + the
    // null check keep SQL semantics (null key drops out of the join)
    val vecs = Seq(
      (0L, Some(Seq(Option(1.0), Option(2.0), Option(3.0)))),
      (1L, Some(Seq(Option(1.0), None, Option(3.0)))), // null element
      (2L, None)) // null array
      .toDF("vec_id", "embedding")
    val out = vecs
      .select($"vec_id", Similarity.lshBucket($"embedding", dim = 3,
        numBits = 2).as("b"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(0L).isDefined)
    assert(out(1L).isEmpty && out(2L).isEmpty)
  }

  test("lshNeighborPairs recall vs the exact baseline (pinned floor)") {
    // The embeddings fixture is near-orthogonal gaussian noise (max pair
    // cosine ~0.55) — it has no true near-duplicates, so recall there is
    // undefined. Plant them: 30 perturbed copies (cosine ~0.9999) of real
    // fixture vectors among 200 fixture distractors, then require the LSH
    // path at q33's parameters to recover a pinned fraction of the exact
    // cosinePairs ground truth. Everything (vectors, perturbation, seeded
    // hyperplanes) is deterministic, so the measured recall is a constant;
    // the floor is slack under it only to survive parameter retuning.
    // Floors documented in COVERAGE.md.
    val base = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").filter(col("vec_id") < 200)
      .select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") < 30)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          x => x * lit(1.001f) + lit(0.0004f)).as("embedding"))
    val corpus = base.unionByName(planted)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("key_a", "key_b").as[(Long, Long)].collect().toSet
    val truth = pairSet(Similarity.cosinePairs(corpus, "embedding",
      "vec_id", threshold = 0.99))
    assert(truth.size == 30, s"expected the 30 planted pairs, got $truth")
    val lsh = pairSet(Similarity.lshNeighborPairs(corpus, "embedding",
      "vec_id", dim = 64, numBits = 4, threshold = 0.15))
    // single-table sign-bit LSH: a pair is a candidate only when ALL
    // numBits sign bits agree, so recall rises with similarity — the
    // near-identical planted pairs are exactly the ones it must not lose
    val recall = lsh.intersect(truth).size.toDouble / truth.size
    info(f"planted pairs: ${truth.size}, LSH recall $recall%.3f")
    assert(recall >= 0.9,
      f"LSH recall $recall%.3f under the 0.9 floor")
  }

  test("clusterNearDuplicatePairs: exactly the planted copies on a " +
      "clustered fixture, drop list keeps the smaller keys, nulls and " +
      "zero-norm never pair, cluster-skew guard counts its drops") {
    // 3 semantic clusters on axes e0/e1/e2, 10 members each (±0.3
    // jitter along e3..e7 — within-cluster non-copy cosine ≤ 1/1.09 ≈
    // .917, cross-cluster ≤ .083), plus a scaled exact copy of 2
    // members per cluster (cosine 1.0). threshold .95 ⇒ ground truth
    // is exactly the 6 copy pairs.
    def vec(axis: Int, jit: Int, sign: Double,
        scale: Double = 1.0): Seq[Double] = {
      val v = Array.fill(8)(0.0)
      v(axis) = 1.0; v(3 + jit) = sign * 0.3
      v.map(_ * scale).toSeq
    }
    val members = for {
      a <- 0 to 2; j <- 0 to 4; s <- Seq(1.0, -1.0)
    } yield ((a * 100 + j * 2 + (if (s > 0) 0 else 1)).toLong,
      vec(a, j, s))
    val copies = for { a <- 0 to 2; j <- 0 to 1 }
      yield ((1000 + a * 100 + j).toLong, vec(a, j, 1.0, scale = 1.1))
    val junk = Seq((9001L, null.asInstanceOf[Seq[Double]]),
      (9002L, Seq.fill(8)(0.0)))
    val corpus = (members ++ copies ++ junk).toDF("vec_id", "embedding")
    val expected = (for { a <- 0 to 2; j <- 0 to 1 }
      yield ((a * 100 + j * 2).toLong, (1000 + a * 100 + j).toLong)).toSet
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("key_a", "key_b").as[(Long, Long)].collect().toSet
    // exact ground truth agrees with the construction (junk excluded:
    // a zero-norm pair's cosine is 0/0 = NaN, which Spark ORDERS above
    // every double — cosinePairs would pass it; the operator's own
    // _n > 0 filter is what the junk rows exercise below)
    assert(pairSet(Similarity.cosinePairs(
      (members ++ copies).toDF("vec_id", "embedding"), "embedding",
      "vec_id", threshold = 0.95)) == expected)
    val pairs = Similarity.clusterNearDuplicatePairs(corpus, "embedding",
      "vec_id", nlist = 3, threshold = 0.95, kmeansIters = 2)
    // copies co-assign by construction (same direction ⇒ same argmax
    // centroid), so the cluster scope loses nothing here — recall 1.0
    // whatever granularity k-means settled on
    assert(pairSet(pairs) == expected, pairSet(pairs).toString)
    val cos = pairs.select("cosine").as[Double].collect()
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-9))
    // drop list: the larger key of every pair = the 6 copy keys
    val drops = Similarity.clusterDedupDropList(corpus, "embedding",
        "vec_id", nlist = 3, threshold = 0.95, kmeansIters = 2)
      .as[Long].collect().toSet
    assert(drops == expected.map(_._2), drops.toString)
    // deterministic under iters=0 (hash-sampled centroids, no FP-order
    // sensitivity) and under repartitioning
    val d0 = pairSet(Similarity.clusterNearDuplicatePairs(corpus,
      "embedding", "vec_id", nlist = 3, threshold = 0.95,
      kmeansIters = 0))
    val d0again = pairSet(Similarity.clusterNearDuplicatePairs(
      corpus.repartition(7), "embedding", "vec_id", nlist = 3,
      threshold = 0.95, kmeansIters = 0))
    assert(d0 == d0again && d0 == expected)
    // skew guard: an over-cap cluster emits nothing and the drops are
    // attributed under the "semdedup" tag
    val ctr = graft.operators.GuardMetrics.of(spark.sparkContext,
      "semdedup")
    ctr.reset()
    Similarity.clusterNearDuplicatePairs(corpus, "embedding", "vec_id",
      nlist = 3, threshold = 0.95, kmeansIters = 2,
      maxClusterSize = 2).count()
    assert(ctr.droppedRows.value > 0,
      "over-cap clusters must count their dropped rows")
  }

  test("clusterNearDuplicatePairs recall vs the exact baseline on the " +
      "real embeddings fixture (pinned floor, mirrors the LSH pin)") {
    // same planted-copy construction as the LSH recall test: copies are
    // near-identical to their originals, so they land in the SAME
    // k-means cell almost surely — the straddle loss the scaladoc
    // documents applies to borderline pairs, not to copies
    val base = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").filter(col("vec_id") < 200)
      .select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") < 30)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          x => x * lit(1.001f) + lit(0.0004f)).as("embedding"))
    val corpus = base.unionByName(planted)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("key_a", "key_b").as[(Long, Long)].collect().toSet
    val truth = pairSet(Similarity.cosinePairs(corpus, "embedding",
      "vec_id", threshold = 0.99))
    assert(truth.size == 30)
    val got = pairSet(Similarity.clusterNearDuplicatePairs(corpus,
      "embedding", "vec_id", nlist = 8, threshold = 0.99,
      kmeansIters = 2))
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(f"planted pairs: ${truth.size}, cluster-scope recall $recall%.3f")
    assert(recall >= 0.9,
      f"cluster-scoped recall $recall%.3f under the 0.9 floor")
    // precision is exact by construction: every emitted pair passed the
    // exact cosine verify, so no non-truth pair can appear
    assert(got.subsetOf(truth), (got -- truth).toString)
  }

  test("LSH bucket-skew guard: a degenerate bucket is dropped with " +
      "attributed metrics in the batch op, the incremental enforces " +
      "the same union-wide cap store-shuffle-free, and zero-norm " +
      "embeddings bucket to null") {
    import graft.operators.GuardMetrics
    val sc = spark.sparkContext
    GuardMetrics.resetAll(sc)
    val lsh = GuardMetrics.of(sc, "lsh")
    // 30 identical vectors: one hot bucket, C(30,2) = 435 pairs unguarded
    val hotVec = Seq.fill(8)(1.0)
    val hot = (1L to 30L).map(k => (k, hotVec)).toDF("vec_id", "embedding")
    val unguarded = Similarity.lshNeighborPairs(hot, "embedding",
      "vec_id", dim = 8, numBits = 4, threshold = 0.95,
      maxBucketSize = -1).count()
    assert(unguarded == 435)
    assert(lsh.droppedRows.value == 0)
    val guarded = Similarity.lshNeighborPairs(hot, "embedding", "vec_id",
      dim = 8, numBits = 4, threshold = 0.95, maxBucketSize = 10).count()
    assert(guarded == 0, s"over-cap bucket must drop, got $guarded pairs")
    assert(lsh.droppedRows.value == 30 && lsh.droppedCohorts.value == 1,
      s"metrics ${lsh.droppedRows.value}/${lsh.droppedCohorts.value}")

    // incremental: 20 stored + 10 new identical vectors — the UNION
    // total (30) is over the cap even though each side alone is not
    GuardMetrics.resetAll(sc)
    val store = Similarity.lshSignatures(
      (1L to 20L).map(k => (k, hotVec)).toDF("vec_id", "embedding"),
      "embedding", "vec_id", dim = 8, numBits = 4)
    val batch = (21L to 30L).map(k => (k, hotVec))
      .toDF("vec_id", "embedding")
    val (openPairs, _) = Similarity.lshNeighborPairsIncremental(batch,
      store, "embedding", "vec_id", dim = 8, numBits = 4,
      threshold = 0.95, maxBucketSize = -1)
    assert(openPairs.count() == 20 * 10 + 45) // cross + within
    val (cappedPairs, updated) = Similarity.lshNeighborPairsIncremental(
      batch, store, "embedding", "vec_id", dim = 8, numBits = 4,
      threshold = 0.95, maxBucketSize = 10)
    assert(cappedPairs.count() == 0)
    assert(lsh.droppedRows.value == 30 && lsh.droppedCohorts.value == 1,
      s"metrics ${lsh.droppedRows.value}/${lsh.droppedCohorts.value}")
    // the guard affects pairing only: the updated store keeps all rows
    assert(updated.count() == 30)

    // zero-norm embeddings: null bucket (never joins), row still kept
    val zeros = Similarity.lshSignatures(
      Seq((1L, Seq.fill(8)(0.0)), (2L, hotVec)).toDF("vec_id", "embedding"),
      "embedding", "vec_id", dim = 8, numBits = 4)
    val rows = zeros.select($"vec_id", $"_bucket").collect()
      .map(r => (r.getLong(0), r.isNullAt(1))).toSet
    assert(rows == Set((1L, true), (2L, false)))
  }

  test("embeddingDecontaminate: exact max-cosine tagging, null/zero-norm " +
      "edges, and the drop verdict") {
    val bench = Seq(
        (1L, Seq(1.0, 0.0, 0.0)),
        (2L, Seq(0.0, 1.0, 0.0)),
        (3L, Seq(0.0, 0.0, 0.0))) // zero-norm: excluded from the set
      .toDF("bid", "bemb")
    val corpus = Seq(
        (10L, Seq(1.0, 0.0, 0.0)),   // exact bench member: cosine 1.0
        (11L, Seq(0.6, 0.8, 0.0)),   // max vs axis-1 = 0.8 ≥ 0.75
        (12L, Seq(0.0, 0.0, 5.0)),   // orthogonal: 0.0, keep
        (13L, Seq(-1.0, 0.0, 0.0)),  // anti-parallel: max is 0.0 vs
                                      // axis-1? no: cos(-x,x)=-1,
                                      // cos vs axis-1 = 0 → max 0.0
        (14L, Seq(0.0, 0.0, 0.0)),   // zero-norm corpus: null, keep
        (15L, null.asInstanceOf[Seq[Double]])) // null: null, keep
      .toDF("vec_id", "embedding")
    val out = Similarity.embeddingDecontaminate(corpus, bench,
        "embedding", "vec_id", threshold = 0.75, benchEmbCol = "bemb")
      .select("vec_id", "max_benchmark_cosine", "verdict")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getString(2)))
      .toMap
    def ~=(a: Option[Double], b: Double) =
      a.exists(x => math.abs(x - b) < 1e-12)
    assert(~=(out(10L)._1, 1.0) && out(10L)._2 == "drop")
    assert(~=(out(11L)._1, 0.8) && out(11L)._2 == "drop")
    assert(~=(out(12L)._1, 0.0) && out(12L)._2 == "keep")
    assert(~=(out(13L)._1, 0.0) && out(13L)._2 == "keep")
    assert(out(14L) == ((None, "keep")))
    assert(out(15L) == ((None, "keep")))
    // an all-zero-norm benchmark can never drop anything
    val none = Similarity.embeddingDecontaminate(corpus,
        bench.filter($"bid" === 3), "embedding", "vec_id",
        threshold = 0.75, benchEmbCol = "bemb")
      .select("verdict").as[String].collect()
    assert(none.forall(_ == "keep"))
  }

  test("embeddingDecontaminate validates dimensions instead of " +
      "truncating: mixed-dim benchmark is a hard error, a corpus row " +
      "of the wrong dim gets a null cosine, never a partial dot") {
    // mixed-dimension benchmark (embeddings from two different models)
    // must fail loudly at collect time
    val mixedBench = Seq(
        (1L, Seq(1.0, 0.0, 0.0)),
        (2L, Seq(0.0, 1.0)))
      .toDF("bid", "bemb")
    val corpus = Seq(
        (10L, Seq(1.0, 0.0, 0.0)),
        // 2-dim corpus row vs a 3-dim benchmark: a truncated dot would
        // score cos((1,0),(1,0,0)) = 1.0 and DROP it for the wrong
        // reason — worse, a long corpus vector whose prefix matches
        // would silently KEEP contaminated rows. Must be null/keep
        // with the mismatch visible.
        (11L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      Similarity.embeddingDecontaminate(corpus, mixedBench,
        "embedding", "vec_id", benchEmbCol = "bemb")
    }
    assert(err.getMessage.contains("mixed dimensions"))
    val out = Similarity.embeddingDecontaminate(corpus,
        mixedBench.filter($"bid" === 1), "embedding", "vec_id",
        threshold = 0.75, benchEmbCol = "bemb")
      .select("vec_id", "max_benchmark_cosine", "verdict")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getString(2)))
      .toMap
    assert(out(10L) == ((Some(1.0), "drop")))
    assert(out(11L) == ((None, "keep")))
  }

  test("legacy stores with zero-norm rows in real buckets cannot emit " +
      "NaN pairs (NaN >= threshold is TRUE in Spark's ordering)") {
    val hotVec = Seq.fill(8)(1.0)
    val fresh = Similarity.lshSignatures(
      Seq((10L, hotVec)).toDF("vec_id", "embedding"),
      "embedding", "vec_id", dim = 8, numBits = 4)
    val hotBucket = fresh.select($"_bucket").as[Long].head()
    // a store written by a pre-null-bucket lshSignatures: the zero-norm
    // row carries _n = 0 and a REAL bucket (the all-signs-negative one
    // here stands in — what matters is it collides with live traffic)
    val legacy = Seq(
        (1L, Seq.fill(8)(0.0), 0.0, hotBucket),
        (2L, hotVec, math.sqrt(8.0), hotBucket))
      .toDF("vec_id", "_emb", "_n", "_bucket")
    val batch = Seq((20L, hotVec), (21L, Seq.fill(8)(0.0)))
      .toDF("vec_id", "embedding")
    val (pairs, updated) = Similarity.lshNeighborPairsIncremental(batch,
      legacy, "embedding", "vec_id", dim = 8, numBits = 4,
      threshold = 0.95)
    val got = pairs.select("key_a", "key_b", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    // exactly the one legitimate pair; the legacy zero-norm row (key 1)
    // must pair with NOTHING — before the _n > 0 pairing filter its
    // 0/0 = NaN cosine passed `>= threshold` and emitted (1, 20)
    assert(got.map(p => (p._1, p._2)) == Set((2L, 20L)), s"got $got")
    assert(got.forall(p => !p._3.isNaN))
    // the store update still keeps every signature, legacy rows included
    assert(updated.count() == 4)
  }

  /** Well-separated clusters around 4 orthogonal axes: the shape where
    * hash-sampled centroids underperform (several samples land in one
    * cluster, another cluster gets none) and Lloyd rounds must fix it.
    */
  private def clusteredCorpus(perCluster: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(19)
    val dim = 16
    (0 until 4).flatMap { c =>
      (0 until perCluster).map { i =>
        val v = Array.tabulate(dim)(j =>
          (if (j == c * 4) 10.0f else 0.0f) + rnd.nextFloat() * 0.5f)
        ((c * perCluster + i).toLong, v.toSeq)
      }
    }.toDF("vec_id", "embedding")
  }

  test("kmeansCentroids converges onto the true clusters") {
    val corpus = clusteredCorpus(25)
    val cents = Similarity.kmeansCentroids(corpus, "embedding", "vec_id",
        nlist = 4, iters = 5)
      .as[(Int, Array[Double])].collect()
    assert(cents.length == 4)
    // every centroid is unit-length and dominated by exactly one cluster
    // axis; all 4 cluster axes are claimed by some centroid
    val axes = cents.map { case (_, v) =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9,
        "centroid not unit-length")
      v.indexOf(v.max)
    }
    assert(axes.toSet == Set(0, 4, 8, 12),
      s"centroids missed a cluster axis: ${axes.toList}")
  }

  test("kmeansCentroids caches the projection across Lloyd rounds and " +
      "releases it on exit; cacheVecs=false trains identically-shaped " +
      "centroids") {
    val corpus = clusteredCorpus(25)
    // compare RDD ID SETS, not counts: the shared session's
    // ContextCleaner releases other operators' lazily-checkpointed
    // intermediates (e.g. the samplers' pinned slivers) at arbitrary
    // moments, so a global-count equality flakes — the invariant is
    // that THIS call leaves no new persisted RDD behind
    def persistedIds() = spark.sparkContext.getPersistentRDDs.keySet
    val before = persistedIds()
    val cached = Similarity.kmeansCentroids(corpus, "embedding", "vec_id",
        nlist = 4, iters = 3)
      .as[(Int, Array[Double])].collect()
    assert((persistedIds() -- before).isEmpty,
      "the persisted (key, emb) projection must be unpersisted on exit")
    val uncached = Similarity.kmeansCentroids(corpus, "embedding", "vec_id",
        nlist = 4, iters = 3, cacheVecs = false)
      .as[(Int, Array[Double])].collect()
    // centroid VALUES are deterministic only to FP-sum reordering (see the
    // operator doc), so compare the structural outcome: same cluster axes
    // claimed, all unit-length
    def axes(cs: Array[(Int, Array[Double])]) =
      cs.map { case (_, v) => v.indexOf(v.max) }.toSet
    assert(cached.length == 4 && uncached.length == 4)
    assert(axes(cached) == axes(uncached))
    assert(axes(cached) == Set(0, 4, 8, 12))
  }

  test("k-means centroids beat sampled centroids at partial probe on " +
      "clustered data") {
    val corpus = clusteredCorpus(25)
    val queries = corpus.filter($"vec_id".isin(0L, 30L, 60L, 90L))
    def recallOf(kmeansIters: Int): Double = {
      val brute = Similarity.cosineTopK(corpus, queries, "embedding",
          "vec_id", k = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val ivf = Similarity.ivfTopK(corpus, queries, "embedding", "vec_id",
          k = 5, nlist = 4, nprobe = 1, kmeansIters = kmeansIters)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      ivf.intersect(brute).size.toDouble / brute.size
    }
    val trained = recallOf(3)
    val sampled = recallOf(0)
    info(f"nprobe=1 recall: sampled $sampled%.3f, k-means $trained%.3f")
    // with one aligned centroid per true cluster, probing a single list
    // must recover every true neighbor
    assert(trained >= 0.999, f"k-means recall $trained%.3f under 1.0")
    assert(trained >= sampled,
      f"k-means ($trained%.3f) must not lose to sampling ($sampled%.3f)")
  }

  test("ivfTopK recall@k curve on the REAL sf0.1 embeddings: exhaustive " +
      "probe is exact, recall is monotone in nprobe for the deterministic " +
      "sampled centroids; the measured curve is recorded in BASELINE.md") {
    // The quality/cost trade the ivfTopK scaladoc describes, MEASURED on
    // real (unplanted, near-isotropic) data. Only deterministic facts are
    // asserted: nprobe = nlist probes every list, so the candidate set is
    // the whole corpus and the top-k (same (cosine, neighbor_id) ordering
    // as cosineTopK) is exact; and for the hash-sampled centroids —
    // deterministic, unlike Lloyd means, which are FP-order-jittered —
    // the probe sets are nested as nprobe grows, so per-query candidate
    // sets are nested and recall cannot decrease. The kmeansIters curve
    // is RECORDED, not asserted (cluster-density luck; the r13-rejected
    // assertion class).
    val corpus = graft.core.Tables.load(spark, "/root/testdata/sf0.1",
      "embeddings").select("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 40 === 0) // 50 seeded queries
    val k = 10
    val nlist = 16
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = topSets(
      Similarity.cosineTopK(corpus, queries, "embedding", "vec_id", k))
    assert(truth.size == 50 && truth.values.forall(_.size == k))
    def recallAt(nprobe: Int, iters: Int): Double = {
      val got = topSets(Similarity.ivfTopK(corpus, queries, "embedding",
        "vec_id", k, nlist, nprobe, kmeansIters = iters))
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    }
    val probesSweep = Seq(1, 2, 4, 8, nlist)
    val sampled = probesSweep.map(p => (p, recallAt(p, 0)))
    val trained = probesSweep.map(p => (p, recallAt(p, 3)))
    def fmt(c: Seq[(Int, Double)]) =
      c.map { case (p, r) => f"nprobe=$p%2d $r%.3f" }.mkString("  ")
    info(s"recall@$k nlist=$nlist sampled:      ${fmt(sampled)}")
    info(s"recall@$k nlist=$nlist kmeansIters=3: ${fmt(trained)}")
    assert(sampled.last._2 == 1.0,
      f"exhaustive probe with sampled centroids must be exact, " +
        f"got ${sampled.last._2}%.3f")
    assert(trained.last._2 == 1.0,
      f"exhaustive probe with k-means centroids must be exact, " +
        f"got ${trained.last._2}%.3f")
    assert(sampled.map(_._2).sliding(2).forall(w => w(0) <= w(1) + 1e-12),
      s"sampled-centroid recall must be monotone in nprobe " +
        s"(nested probe sets): ${fmt(sampled)}")
  }

  test("incremental LSH: K increments against a parquet-persisted " +
      "signature store union to the batch lshNeighborPairs run") {
    // the planted-dup corpus from the recall test, split into 3 batches
    // so near-dup pairs cross batch boundaries (each planted copy lands
    // two batches after its original)
    val base = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").filter(col("vec_id") < 200)
      .select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") < 30)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          x => x * lit(1.001f) + lit(0.0004f)).as("embedding"))
    val corpus = base.unionByName(planted)
    val batches = Seq(
      corpus.filter(col("vec_id") < 100),
      corpus.filter(col("vec_id") >= 100 && col("vec_id") < 10000),
      corpus.filter(col("vec_id") >= 10000))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("key_a", "key_b", "cosine")
        .as[(Long, Long, Double)].collect().toSet
    val params = (64, 4, 0.15) // (dim, numBits, threshold) — q33's shape
    val batchRun = pairSet(Similarity.lshNeighborPairs(corpus,
      "embedding", "vec_id", params._1, params._2, params._3))
    assert(batchRun.size >= 30, s"fixture lost its planted pairs")
    val tmp = java.nio.file.Files.createTempDirectory("graft-lshstore")
    var store = Similarity.lshSignatures(corpus.limit(0), "embedding",
      "vec_id", params._1, params._2)
    val got = batches.zipWithIndex.flatMap { case (b, i) =>
      val (pairs, updated) = Similarity.lshNeighborPairsIncremental(
        b, store, "embedding", "vec_id", params._1, params._2, params._3)
      val dir = s"$tmp/store_$i"
      updated.write.mode("overwrite").parquet(dir)
      store = spark.read.parquet(dir)
      pairSet(pairs)
    }.toSet
    assert(got == batchRun,
      s"incremental union diverged from batch: inc=${got.size}, " +
        s"batch=${batchRun.size}; diff ${(got diff batchRun).take(5)} / " +
        s"${(batchRun diff got).take(5)}")
    // cross-batch planted pairs really crossed the store boundary
    assert(got.exists(p => p._1 < 100 && p._2 >= 10000),
      "no pair crossed from batch 1's store to batch 3")
    assert(store.count() == corpus.count())
    val bad = intercept[IllegalArgumentException] {
      Similarity.lshNeighborPairsIncremental(corpus,
        corpus.select(col("vec_id"), col("embedding").as("_emb")),
        "embedding", "vec_id", 64)
    }
    assert(bad.getMessage.contains("_bucket"), bad.getMessage)
  }

  test("IVF index: build-once/serve-many equals the one-shot operator, " +
      "survives a partitioned-parquet round-trip, and probes read only " +
      "the probed lists") {
    val corpus = graft.core.Tables.load(spark, "/root/testdata/sf0.1",
      "embeddings").select("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 400 === 0)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val oneShot = asSet(Similarity.ivfTopK(corpus, queries, "embedding",
      "vec_id", k = 10, nlist = 16, nprobe = 4))
    val index = Similarity.buildIvfIndex(corpus, "embedding", "vec_id",
      nlist = 16)
    assert(asSet(Similarity.ivfTopK(index, queries, "embedding",
      "vec_id", k = 10, nprobe = 4)) == oneShot,
      "prebuilt-index serve diverged from the one-shot operator")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.saveIvfIndex(index, dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    val served = Similarity.ivfTopK(loaded, queries, "embedding",
      "vec_id", k = 10, nprobe = 4)
    assert(asSet(served) == oneShot,
      "loaded-index serve diverged after the parquet round-trip")
    // the scale point of persisting lists partitioned by _cid: the cid
    // filter must land in the scan's PartitionFilters, so the probe
    // reads ONLY the probed lists' directories — the on-disk inverted
    // list, not a full-store scan
    val plan = served.queryExecution.executedPlan.toString()
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("assigned"))
    assert(scanLine.isDefined, s"no parquet scan of the assigned store:\n$plan")
    assert(scanLine.get.contains("PartitionFilters: [_cid"),
      s"probed-cid filter did not reach the partition scan:\n${scanLine.get}")
    // full-probe sanity on the loaded index too: equals brute force
    val brute = asSet(Similarity.cosineTopK(corpus, queries, "embedding",
      "vec_id", k = 10))
    assert(asSet(Similarity.ivfTopK(loaded, queries, "embedding",
      "vec_id", k = 10, nprobe = 16)) == brute,
      "full probe on the loaded index must equal brute force")
    // broadcast-small guard (r22): the serve path FORCES the probe
    // relation into a broadcast, so an over-cap query batch must fail
    // fast with the remedy, not OOM mid-broadcast; <= 0 disables
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(loaded, queries, "embedding", "vec_id",
        k = 10, nprobe = 4, maxProbeRows = 1L)
    }
    assert(e.getMessage.contains("chunk the query batch"),
      s"guard error should carry the remedy: ${e.getMessage}")
    assert(asSet(Similarity.ivfTopK(loaded, queries, "embedding",
      "vec_id", k = 10, nprobe = 4, maxProbeRows = 0L)) == oneShot,
      "maxProbeRows <= 0 must disable the guard, results unchanged")
  }

  test("quantized IVF index: int8 lists shrink the serving store, " +
      "probes stay partition-pruned, and exhaustive-probe recall on " +
      "the real embeddings clears the floor") {
    import org.apache.hadoop.fs.Path
    val corpus = graft.core.Tables.load(spark, "/root/testdata/sf0.1",
      "embeddings").select("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 400 === 0)
    val index = Similarity.buildIvfIndex(corpus, "embedding", "vec_id",
      nlist = 16)
    val plainDir = java.nio.file.Files
      .createTempDirectory("graft-ivf-plain").toString
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-ivf-q").toString
    Similarity.saveIvfIndex(index, plainDir)
    Similarity.saveQuantizedIvfIndex(index, qDir)
    // the storage claim, measured: the quantized lists' bytes on disk
    val fs = new Path(qDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val plainBytes = fs.getContentSummary(
      new Path(s"$plainDir/assigned")).getLength
    val qBytes = fs.getContentSummary(
      new Path(s"$qDir/assigned_q")).getLength
    info(f"assigned bytes: plain $plainBytes%d, int8 $qBytes%d " +
      f"(${plainBytes.toDouble / qBytes}%.1f× smaller)")
    assert(qBytes * 2 < plainBytes,
      s"quantized lists must be well under half the plain bytes: " +
        s"$qBytes vs $plainBytes")
    val loaded = Similarity.loadQuantizedIvfIndex(spark, qDir)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
    // exhaustive probe: the candidate set is the whole corpus, so the
    // only divergence from brute force is the int8 rounding — recall
    // measured on the real embeddings (near-isotropic, the hard case)
    val brute = asSet(Similarity.cosineTopK(corpus, queries, "embedding",
      "vec_id", k = 10))
    val quant = Similarity.ivfTopK(loaded, queries, "embedding",
      "vec_id", k = 10, nprobe = 16)
    val recall = asSet(quant).intersect(brute).size.toDouble / brute.size
    info(f"int8 exhaustive-probe recall@10: $recall%.3f")
    assert(recall >= 0.9, f"int8 recall $recall%.3f under the 0.9 floor")
    // partition pruning survives the quantized layout + dequant view
    val served = Similarity.ivfTopK(loaded, queries, "embedding",
      "vec_id", k = 10, nprobe = 4)
    val plan = served.queryExecution.executedPlan.toString()
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("assigned_q"))
    assert(scanLine.isDefined,
      s"no parquet scan of the quantized store:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*_cid".r
      .findFirstIn(scanLine.get).isDefined,
      s"probed-cid filter did not reach the quantized scan:\n${scanLine.get}")
    // loading a quantized dir with the plain loader direction is
    // unambiguous: the quantized loader refuses a plain layout loudly
    val err = intercept[IllegalArgumentException](
      Similarity.loadQuantizedIvfIndex(spark, plainDir))
    assert(err.getMessage.contains("saveQuantizedIvfIndex"), err.getMessage)
  }

  test("extendIvfIndex: assigning a new batch to the existing centroids " +
      "equals the union's assignment, and the append-delta flow serves " +
      "identically") {
    val corpus = graft.core.Tables.load(spark, "/root/testdata/sf0.1",
      "embeddings").select("vec_id", "embedding")
    val batch1 = corpus.filter($"vec_id" < 1500)
    val batch2 = corpus.filter($"vec_id" >= 1500)
    val queries = corpus.filter($"vec_id" % 400 === 0)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val idx1 = Similarity.buildIvfIndex(batch1, "embedding", "vec_id",
      nlist = 16)
    val extended = Similarity.extendIvfIndex(idx1, batch2, "embedding",
      "vec_id")
    // same centroids, assignment is a pure per-row function → extension
    // IS the union's assignment
    val unionAssigned = asSet(Similarity.ivfTopK(extended, queries,
      "embedding", "vec_id", k = 10, nprobe = 16))
    val brute = asSet(Similarity.cosineTopK(corpus, queries, "embedding",
      "vec_id", k = 10))
    assert(unionAssigned == brute,
      "full probe on the extended index must equal brute force over " +
        "the union")
    // the documented append-delta flow: persist batch 1's index, append
    // only the new batch's assignment, reload, serve — same result
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-ext")
      .toString
    Similarity.saveIvfIndex(idx1, dir)
    val delta = Similarity.extendIvfIndex(
      Similarity.IvfIndex(idx1.centroids, idx1.assigned.limit(0)),
      batch2, "embedding", "vec_id").assigned
    delta.write.mode("append").partitionBy("_cid")
      .parquet(s"$dir/assigned")
    val reloaded = Similarity.loadIvfIndex(spark, dir)
    assert(asSet(Similarity.ivfTopK(reloaded, queries, "embedding",
      "vec_id", k = 10, nprobe = 16)) == brute,
      "append-delta persisted index diverged")
    assert(reloaded.assigned.count() == corpus.count())
  }

  test("assignmentDrift flags an extension batch that left the trained " +
      "distribution") {
    // centroids trained on the 4 orthogonal clusters; an in-distribution
    // batch sits near its assigned centroid, a batch on an axis no
    // cluster occupies does not
    val corpus = clusteredCorpus(25)
    val idx = Similarity.buildIvfIndex(corpus, "embedding", "vec_id",
      nlist = 4, kmeansIters = 5)
    def drift(df: org.apache.spark.sql.DataFrame): (Long, Double, Double) =
      Similarity.assignmentDrift(idx.centroids, df, "embedding", "vec_id")
        .as[(Long, Double, Double)].collect().head
    val (bn, bMean, bP95) = drift(corpus) // the build-time row
    val inDist = clusteredCorpus(5)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val (_, iMean, iP95) = drift(inDist)
    // dims 13-15 are occupied by no cluster axis (axes sit at 0,4,8,12)
    val drifted = (0 until 20).map(i =>
      ((20000 + i).toLong, Seq.tabulate(16)(j =>
        if (j == 13 + i % 3) 10.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val (dn, dMean, dP95) = drift(drifted)
    info(f"build mean/p95 $bMean%.4f/$bP95%.4f, in-dist $iMean%.4f, " +
      f"drifted $dMean%.4f/$dP95%.4f")
    assert(bn == 100L && dn == 20L)
    // in-distribution extension reads like the build corpus...
    assert(iMean < bP95 * 1.5,
      f"in-distribution batch flagged: $iMean%.4f vs build p95 $bP95%.4f")
    // ...the drifted batch is unmistakably above it
    assert(dMean > bP95 * 2 && dP95 > bP95 * 2,
      f"drifted batch not flagged: mean $dMean%.4f p95 $dP95%.4f vs " +
        f"build p95 $bP95%.4f")
    assert(iP95 <= dMean, "ordering sanity")
  }
}
