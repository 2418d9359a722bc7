package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators._

/** ScalaCheck laws for the core algebra (SURVEY.md §5.2) — the closing
  * piece of the survey's own test strategy. Each property checks the Spark
  * operator against an independent plain-Scala MODEL of its contract over
  * 100 generated inputs, so the laws hold for arbitrary corpora, not the
  * fixtures: filters are set algebra, joinSets is union with keep-first,
  * samplers draw exactly and deterministically, splits partition with the
  * reference's exact size contracts, and the fused label-transform
  * pipeline equals both sequential application and the one-label-at-a-time
  * interpreter.
  *
  * [[PropertySpec]] predates this suite with a handful of hand-sampled
  * generator cases; this one runs full ScalaCheck `forAll` at
  * `minSuccessfulTests = 100` per law, the SURVEY §5.2 target.
  */
class AlgebraLawsSpec extends SparkTestBase {
  import spark.implicits._

  // window-scaled (TestDepth): the SURVEY §5.2 target of 100 cases per
  // law is the SPARK_GRAFT_FULL_TESTS depth; the default run keeps every
  // law at a window-sized case count
  private val Cases = TestDepth.scaled(100, 25)

  /** The laws that pin their own (lower) full-depth counts — multiple
    * Spark runs per case — scale by the same knob: full/4, floor 8. */
  private def scaledCases(full: Int): Int =
    TestDepth.scaled(full, math.max(8, full / 4))

  private def check(name: String, prop: Prop,
      cases: Int = Cases): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(result.passed, s"$name: ${result.status}")
  }

  // ---- generators ------------------------------------------------------

  private val tagPool = Vector("t1", "t2", "t3", "tA", "tB", "tC")

  /** (key -> tag set) corpora; keys unique by construction. */
  private val corpusGen: Gen[List[(String, List[String])]] = for {
    n <- Gen.choose(2, 24)
    tagSets <- Gen.listOfN(n,
      Gen.someOf(tagPool).map(_.toList).map(ts =>
        if (ts.isEmpty) List(TagOps.UntaggedTag) else ts))
  } yield tagSets.zipWithIndex.map { case (ts, i) => (f"img$i%03d", ts) }

  private def toDF(corpus: List[(String, List[String])]): DataFrame =
    corpus.toDF("image_id", "tags")

  private val filterGen: Gen[List[String]] =
    Gen.choose(1, 3).flatMap(k => Gen.pick(k, tagPool).map(_.toList))

  // ---- filters ---------------------------------------------------------

  test("law: andFilter = model intersection (⊆ every single-tag filter)") {
    check("andFilter", Prop.forAll(corpusGen, filterGen) { (corpus, tags) =>
      val got = TagOps.andFilter(toDF(corpus), tags)
        .select("image_id").as[String].collect().toSet
      val model = corpus.filter { case (_, ts) =>
        tags.forall(ts.contains) }.map(_._1).toSet
      val singles = tags.map(t =>
        corpus.filter(_._2.contains(t)).map(_._1).toSet)
      got == model && singles.forall(got.subsetOf(_))
    })
  }

  test("law: orFilter = union of single-tag memberships") {
    check("orFilter", Prop.forAll(corpusGen, filterGen) { (corpus, tags) =>
      val got = TagOps.orFilter(toDF(corpus), tags)
        .select("image_id").as[String].collect().toSet
      got == corpus.filter { case (_, ts) =>
        tags.exists(ts.contains) }.map(_._1).toSet
    })
  }

  // ---- joinSets --------------------------------------------------------

  /** Two overlapping sets with an origin-marking payload plus an in-set
    * row permutation seed. */
  private val joinGen = for {
    corpus <- corpusGen
    aFrac <- Gen.choose(1, corpus.size)
    bFrac <- Gen.choose(1, corpus.size)
    permSeed <- Gen.choose(0L, Long.MaxValue)
  } yield (corpus.take(aFrac), corpus.takeRight(bFrac), permSeed)

  test("law: joinSets = keyed union keeping the EARLIEST set's row; " +
      "idempotent; invariant under in-set row order") {
    check("joinSets", Prop.forAll(joinGen) { case (a, b, permSeed) =>
      def mk(rows: List[(String, List[String])], origin: String) =
        rows.map { case (k, ts) => (k, ts, origin) }
          .toDF("image_id", "tags", "origin")
      val joined = TagOps.joinSets(Seq(mk(a, "a"), mk(b, "b")))
        .select("image_id", "origin").as[(String, String)].collect().toSet
      // model: every key of either set, origin "a" wherever a has the key
      val model = (a.map(_._1).map(k => (k, "a")) ++
        b.map(_._1).filterNot(a.map(_._1).contains).map(k => (k, "b"))).toSet
      val rnd = new scala.util.Random(permSeed)
      val permuted = TagOps.joinSets(Seq(
          mk(rnd.shuffle(a), "a"), mk(rnd.shuffle(b), "b")))
        .select("image_id", "origin").as[(String, String)].collect().toSet
      val self = TagOps.joinSets(Seq(mk(a, "a"), mk(a, "b")))
        .select("image_id", "origin").as[(String, String)].collect().toSet
      joined == model && permuted == model &&
        self == a.map(_._1).map(k => (k, "a")).toSet
    }, cases = scaledCases(60)) // 4 Spark runs per case
  }

  // ---- samplers --------------------------------------------------------

  private val sampleGen = for {
    corpus <- corpusGen
    n <- Gen.choose(0, 30)
    seed <- Gen.choose(0L, Long.MaxValue)
    parts <- Gen.choose(1, 8)
  } yield (corpus, n, seed, parts)

  test("law: sampleExact draws exactly min(n, |df|) input rows, " +
      "deterministically for a fixed seed and layout") {
    check("sampleExact", Prop.forAll(sampleGen) {
      case (corpus, n, seed, _) =>
        val df = toDF(corpus)
        val got = TagOps.sampleExact(df, n, seed)
          .select("image_id").as[String].collect().toSet
        val again = TagOps.sampleExact(df, n, seed)
          .select("image_id").as[String].collect().toSet
        got.size == math.min(n, corpus.size) &&
          got.subsetOf(corpus.map(_._1).toSet) && got == again
    })
  }

  test("law: deterministicSample = the n smallest md5(salt||key) digests " +
      "(plain-Scala model), invariant under repartitioning") {
    // the engine-portability contract: the draw is a pure function of
    // content, so ANY layout of ANY engine reproduces it
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    check("deterministicSample", Prop.forAll(sampleGen) {
      case (corpus, n, _, parts) =>
        val model = corpus.map(_._1)
          .sortBy(k => (md5hex("graft" + k), k)).take(n).toSet
        val got = Splits.deterministicSample(
            toDF(corpus).repartition(parts), n, "image_id")
          .select("image_id").as[String].collect().toSet
        got == model
    })
  }

  test("law: stratifiedSample = per-stratum smallest digests, at most " +
      "perStratum each, all strata represented") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val caseGen = for {
      corpus <- corpusGen
      per <- Gen.choose(1, 5)
    } yield (corpus, per)
    check("stratifiedSample", Prop.forAll(caseGen) { case (corpus, per) =>
      // stratum = first tag (deterministic per row)
      val df = corpus.map { case (k, ts) => (k, ts.head) }
        .toDF("image_id", "stratum")
      val got = Splits.stratifiedSample(df, "stratum", per, "image_id")
        .select("image_id", "stratum").as[(String, String)].collect().toSet
      val model = corpus.map { case (k, ts) => (k, ts.head) }
        .groupBy(_._2).values.flatMap(rows =>
          rows.sortBy { case (k, _) => (md5hex("graft" + k), k) }.take(per))
        .toSet
      got == model
    })
  }

  test("law: stratifiedSample exactness is margin-independent — any " +
      "pre-filter margin (deep undershoot included) reproduces the " +
      "plain-Scala model exactly, null strata included") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val caseGen = for {
      corpus <- corpusGen
      per <- Gen.choose(1, 5)
      // negative margins force arbitrary undershoot mixes (some strata
      // fall back to their full window, some survive on their own
      // digest draw); positive margins exercise the common sliver path;
      // -Infinity drives the threshold to its floor so EVERY stratum
      // takes the all-short fallback exclusively — the adversarial
      // bottom of the range (see digestThreshold's uniformity scaladoc)
      margin <- Gen.oneOf(Gen.const(Double.NegativeInfinity),
        Gen.choose(-50.0, 0.0), Gen.choose(0.0, 12.0))
    } yield (corpus, per, margin)
    check("stratifiedMargin", Prop.forAll(caseGen) {
      case (corpus, per, margin) =>
        // stratum = first tag, with one tag mapped to NULL so the
        // null-stratum path rides every margin mix
        def stratum(ts: List[String]): String =
          if (ts.head == "tA") null else ts.head
        val df = corpus.map { case (k, ts) => (k, stratum(ts)) }
          .toDF("image_id", "stratum")
        val got = Splits.stratifiedSampleImpl(df, "stratum", per,
            "image_id", "graft", margin)
          .select("image_id", "stratum").as[(String, String)]
          .collect().toSet
        val model = corpus.map { case (k, ts) => (k, stratum(ts)) }
          .groupBy(_._2).values.flatMap(rows =>
            rows.sortBy { case (k, _) => (md5hex("graft" + k), k) }
              .take(per))
          .toSet
        got == model
    }, cases = scaledCases(60))
  }

  test("law: temperatureSample exactness is margin-independent — any " +
      "pre-filter margin (down to -Infinity, the all-domains-short " +
      "fallback) reproduces the Hamilton-quota + digest-pick model") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val caseGen = for {
      d <- Gen.choose(1, 5)
      sizes <- Gen.listOfN(d, Gen.choose(1, 8))
      n <- Gen.choose(0, 20)
      tau <- Gen.oneOf(0.0, 0.3, 0.7, 1.0, 1.7)
      margin <- Gen.oneOf(Gen.const(Double.NegativeInfinity),
        Gen.choose(-50.0, 0.0), Gen.choose(0.0, 12.0))
    } yield (sizes, n, tau, margin)
    check("temperatureMargin", Prop.forAll(caseGen) {
      case (sizes, n, tau, margin) =>
        val rows = sizes.zipWithIndex.flatMap { case (sz, d) =>
          (0 until sz).map(i => ((d * 100 + i).toLong, s"dom$d"))
        }
        val df = rows.toDF("id", "dom")
        // the same independent quota model as PropertySpec's
        // default-margin test — the law is that NO margin changes it
        val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong)
          .toSeq.sortBy(_._1)
        val w = counts.map { case (_, nd) => math.pow(nd.toDouble, tau) }
        val tot = w.sum
        val ideal = w.map(x => n * x / tot)
        val base = ideal.map(math.floor(_).toLong)
        val bonus = counts.indices
          .sortBy(i => (-(ideal(i) - base(i)), counts(i)._1))
          .take(math.max(0L, n - base.sum).toInt).toSet
        val quota = counts.indices.map(i => counts(i)._1 ->
          math.min(counts(i)._2,
            base(i) + (if (bonus(i)) 1L else 0L))).toMap
        val expected = rows.groupBy(_._2).flatMap { case (d, rs) =>
          rs.map(_._1).sortBy(k => (md5hex(s"graft$k"), k))
            .take(quota(d).toInt)
        }.toSet
        val got = Splits.temperatureSampleImpl(df, "dom", n, tau, "id",
            "graft", margin)
          .select("id").as[Long].collect().toSet
        got == expected
    }, cases = scaledCases(40))
  }

  test("pin: zero-quota domains at margin = -Infinity ride the " +
      "explicit short-circuit, not 0 × -Inf = NaN arithmetic (r19 " +
      "advice) — n = 0 samples nothing, and a Hamilton allocation " +
      "leaving a tail domain at quota 0 excludes exactly that domain") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = (0 until 8).map(i => (i.toLong, "big")) :+ (100L, "tiny")
    val df = rows.toDF("id", "dom")
    // n = 0: every domain's quota is 0; -∞ margin must yield empty
    assert(Splits.temperatureSampleImpl(df, "dom", 0, 1.0, "id", "graft",
      Double.NegativeInfinity).isEmpty)
    // n = 1, tau = 1: ideal shares 8/9 and 1/9 — "big" takes the
    // largest-remainder bonus, "tiny" sits at quota 0 and must be
    // excluded while "big" still yields its smallest-digest row
    val got = Splits.temperatureSampleImpl(df, "dom", 1, 1.0, "id",
        "graft", Double.NegativeInfinity)
      .select("id").as[Long].collect().toSet
    val want = Set((0L until 8L).minBy(k => (md5hex(s"graft$k"), k)))
    assert(got == want, s"got $got, want $want")
  }

  test("law: weightedSample = top-n by u^(1/w) under the md5-derived " +
      "draw (plain-Scala model); non-positive weights excluded") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // the operator's exact arithmetic: 13 hex chars = 52 bits, and
    // (bits + 1) / (2^52 + 1) ∈ (0,1] — bit-identical doubles, so the
    // model comparison is exact, the engine-portability contract
    def u(k: String): Double =
      (java.lang.Long.parseLong(md5hex("graft" + k).substring(0, 13), 16)
        + 1.0) / 4503599627370497.0
    val caseGen = for {
      corpus <- corpusGen
      n <- Gen.choose(0, 30)
      weights <- Gen.listOfN(corpus.size,
        Gen.frequency(8 -> Gen.choose(0.1, 10.0), 1 -> Gen.const(0.0),
          1 -> Gen.const(-1.0)))
    } yield (corpus.map(_._1).zip(weights), n)
    check("weightedSample", Prop.forAll(caseGen) { case (rows, n) =>
      val df = rows.toDF("image_id", "w")
      val got = Splits.weightedSample(df, n, "image_id", "w")
        .select("image_id").as[String].collect().toSet
      val eligible = rows.filter(_._2 > 0)
      val model = eligible
        .map { case (k, w) => (k, math.pow(u(k), 1.0 / w)) }
        .sortBy { case (k, r) => (-r, k) }.take(n).map(_._1).toSet
      got == model && got.size == math.min(n, eligible.size)
    })
  }

  // ---- splits ----------------------------------------------------------

  private val splitGen = for {
    corpus <- corpusGen
    pct <- Gen.choose(0.05, 0.95)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (corpus, pct, seed)

  test("law: testDevSplit partitions the input with exactly " +
      "max(1, floor(n*p)) test rows, deterministic per seed") {
    check("testDevSplit", Prop.forAll(splitGen) { case (corpus, pct, seed) =>
      val df = toDF(corpus)
      def run() = Splits.testDevSplit(df, pct, seed)
        .select("image_id", "split").as[(String, String)].collect()
      val got = run()
      val byKey = got.toMap
      val nTest = got.count(_._2 == "test")
      byKey.keySet == corpus.map(_._1).toSet && // partition: no loss/dup
        got.length == corpus.size &&
        nTest == math.max(1L, math.floor(corpus.size * pct).toLong) &&
        got.forall(r => r._2 == "test" || r._2 == "dev") &&
        run().toMap == byKey // seed-deterministic
    }, cases = scaledCases(60)) // 2 runs, each 3 internal jobs
  }

  private val kfoldGen = for {
    corpus <- corpusGen
    k <- Gen.choose(2, 6)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (corpus, k, seed)

  test("law: kfold partitions the input into folds 1..k balanced within 1") {
    check("kfold", Prop.forAll(kfoldGen) { case (corpus, k, seed) =>
      val got = Splits.kfold(toDF(corpus), k, seed)
        .select("image_id", "fold").as[(String, Int)].collect()
      val sizes = got.groupBy(_._2).view.mapValues(_.length).toMap
      val n = corpus.size
      got.map(_._1).toSet == corpus.map(_._1).toSet &&
        got.length == n &&
        sizes.keySet.subsetOf((1 to k).toSet) &&
        // every fold that exists is within 1 of every other; absent
        // folds only when n < k (their size would be the 0/1 floor)
        (sizes.values.max - sizes.values.min) <= 1 &&
        (n >= k) == (sizes.keySet == (1 to k).toSet) &&
        sizes.values.sum == n
    })
  }

  // ---- label transforms ------------------------------------------------

  private val labelPool = Vector("car", "bus", "person", "tree", "sky")
  private val transformGen: Gen[List[LabelTransform]] = {
    val one: Gen[LabelTransform] = Gen.oneOf(
      for {
        o <- Gen.oneOf(labelPool)
        t <- Gen.oneOf(labelPool :+ "merged")
      } yield Rename(o, t),
      for {
        k <- Gen.choose(1, 3)
        os <- Gen.pick(k, labelPool)
        t <- Gen.oneOf(labelPool :+ "merged")
      } yield Merge(os.toList, t))
    Gen.choose(1, 4).flatMap(Gen.listOfN(_, one))
  }

  test("law: fused label-transform compile ≡ sequential application ≡ " +
      "the per-label interpreter (rename∘rename composes)") {
    // the interpreter: what transforms.py:48-51 does to ONE label
    def model(label: String, ts: List[LabelTransform]): String =
      ts.foldLeft(label) {
        case (l, Rename(o, t)) => if (l == o) t else l
        case (l, Merge(os, t)) => if (os.contains(l)) t else l
      }
    val caseGen = for {
      ts <- transformGen
      n <- Gen.choose(1, 15)
      labels <- Gen.listOfN(n, Gen.oneOf(labelPool))
    } yield (ts, labels)
    check("labelTransforms", Prop.forAll(caseGen) { case (ts, labels) =>
      val df = labels.zipWithIndex.map { case (l, i) => (i, l) }
        .toDF("id", "label")
      val fused = LabelTransforms.applyTo(df, "label", ts)
        .as[(Int, String)].collect().sortBy(_._1).map(_._2).toList
      val sequential = ts.foldLeft(df)((d, t) =>
          LabelTransforms.applyTo(d, "label", Seq(t)))
        .as[(Int, String)].collect().sortBy(_._1).map(_._2).toList
      fused == labels.map(model(_, ts)) && fused == sequential
    }, cases = scaledCases(60)) // the sequential run compiles up to 4 plans per case
  }

  test("law: hashSplit is a pure function of (salt, key) — total, " +
      "layout-invariant, and stable across runs") {
    val fractions = Seq("test" -> 0.2, "train" -> 1.0)
    check("hashSplit", Prop.forAll(sampleGen) { case (corpus, _, _, parts) =>
      val base = Splits.hashSplit(toDF(corpus), "image_id", fractions)
        .select("image_id", "split").as[(String, String)].collect().toMap
      val repart = Splits.hashSplit(
          toDF(corpus).repartition(parts), "image_id", fractions)
        .select("image_id", "split").as[(String, String)].collect().toMap
      base.keySet == corpus.map(_._1).toSet &&
        base.values.forall(v => v == "test" || v == "train") &&
        repart == base
    })
  }

  // ---- incremental dedup ----------------------------------------------

  /** Doc corpora with REAL near-dup structure (overlapping token-window
    * families with drops/extras, so exact dups, near dups, and
    * unrelated docs all occur), plus a random K-way batch assignment —
    * including empty batches and the empty initial store.
    */
  private val incDedupGen = for {
    n <- Gen.choose(0, 16)
    texts <- Gen.listOfN(n, for {
      fam <- Gen.choose(0, 3)
      drop <- Gen.choose(0, 2)
      extra <- Gen.someOf(Vector("x1", "x2"))
    } yield (Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india")
      .drop(fam).take(6).drop(drop) ++ extra).mkString(" "))
    k <- Gen.choose(1, 4)
    assign <- Gen.listOfN(n, Gen.choose(0, 3))
  } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
    k, assign.map(_ % k))

  test("law: K-batch incremental minhash (guard off) ≡ the batch run " +
      "over the union — arbitrary corpora, splits, empty batches, " +
      "empty initial store") {
    // the union claim the operator doc makes exact when no bucket
    // crosses the cap: every pair surfaces exactly once, at the
    // increment where its later endpoint arrives, with the same
    // verified jaccard. Spark-vs-Spark (same signature kernels), so
    // equality is exact, not a recall band.
    check("incrementalMinhash", Prop.forAll(incDedupGen) {
      case (docs, k, assign) =>
        val df = docs.toDF("doc_id", "text")
        def batchRun = Dedup.minhashNearDuplicates(df, "text", "doc_id",
            numHashes = 16, bands = 8, shingleSize = 1, threshold = 0.5,
            cacheShingles = false, maxBucketSize = 0)
          .select("key_a", "key_b", "jaccard")
          .as[(Long, Long, Double)].collect().toSet
        var store = Dedup.minhashSignatures(df.limit(0), "text", "doc_id",
          numHashes = 16, bands = 8, shingleSize = 1)
        val got = (0 until k).flatMap { i =>
          val b = docs.zip(assign).collect { case (d, a) if a == i => d }
          val bdf =
            if (b.isEmpty) df.limit(0) else b.toDF("doc_id", "text")
          val (pairs, updated) = Dedup.minhashNearDuplicatesIncremental(
            bdf, store, "text", "doc_id", numHashes = 16, bands = 8,
            shingleSize = 1, threshold = 0.5, cacheSignatures = false,
            maxBucketSize = 0)
          store = updated
          pairs.select("key_a", "key_b", "jaccard")
            .as[(Long, Long, Double)].collect()
        }.toSet
        got == batchRun && store.count() == docs.size
    }, cases = scaledCases(25)) // K+2 Spark runs per case
  }

  test("law: K-batch incremental simhash (guard off) ≡ the batch run " +
      "over the union — arbitrary corpora, splits, empty batches, " +
      "empty initial store") {
    // same generator and contract as the minhash law; the overlapping
    // token families make close fingerprints common, so the hamming ≤ 3
    // band is well exercised. Spark-vs-Spark (same simhash kernel), so
    // equality is exact.
    check("incrementalSimhash", Prop.forAll(incDedupGen) {
      case (docs, k, assign) =>
        val df = docs.toDF("doc_id", "text")
        def batchRun = Dedup.simhashNearDuplicates(df, "text", "doc_id",
            maxDistance = 3, maxBucketSize = 0)
          .select("key_a", "key_b", "hamming")
          .as[(Long, Long, Int)].collect().toSet
        var store = Dedup.simhashSignatures(df.limit(0), "text", "doc_id")
        val got = (0 until k).flatMap { i =>
          val b = docs.zip(assign).collect { case (d, a) if a == i => d }
          val bdf =
            if (b.isEmpty) df.limit(0) else b.toDF("doc_id", "text")
          val (pairs, updated) = Dedup.simhashNearDuplicatesIncremental(
            bdf, store, "text", "doc_id", maxDistance = 3,
            maxBucketSize = 0)
          store = updated
          pairs.select("key_a", "key_b", "hamming")
            .as[(Long, Long, Int)].collect()
        }.toSet
        got == batchRun && store.count() == docs.size
    }, cases = scaledCases(25)) // K+2 Spark runs per case
  }

  private val incCcGen = for {
    n <- Gen.choose(0, 14)
    edges <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 11L)
      d <- Gen.choose(1L, 5L)
    } yield (a, a + d))
    k <- Gen.choose(1, 4)
    assign <- Gen.listOfN(n, Gen.choose(0, 3))
  } yield (edges, k, assign.map(_ % k))

  test("law: K-batch incremental connected components ≡ the batch run " +
      "over the union edge set — arbitrary graphs, splits, empty " +
      "batches, empty initial store") {
    // the contraction argument made executable: threading the label
    // store through K arbitrary edge batches (old-old merges, chains,
    // duplicate edges, any delivery order within the batch split) ends
    // at exactly the batch run's labels — same key coverage, same
    // min-key canonical representatives. The dense 12-key space forces
    // frequent cross-batch merges and new-global-min relabels.
    check("incrementalComponents", Prop.forAll(incCcGen) {
      case (edges, k, assign) =>
        val df = edges.toDF("key_a", "key_b")
        def batchRun = Dedup.connectedComponents(df)
          .as[(Long, Long)].collect().toSet
        var store = Dedup.connectedComponents(df.limit(0))
        // the DELTA form threaded in parallel as an override-merged
        // shadow map — per batch it must land on exactly the same
        // relation as the full form
        var shadow = Map.empty[Long, Long]
        for (i <- 0 until k) {
          val b = edges.zip(assign).collect { case (e, a) if a == i => e }
          val bdf =
            if (b.isEmpty) df.limit(0) else b.toDF("key_a", "key_b")
          val shadowDf =
            if (shadow.isEmpty) Dedup.connectedComponents(df.limit(0))
            else shadow.toSeq.toDF("key", "component")
          val delta = Dedup.connectedComponentsIncrementalDelta(
            shadowDf, bdf).as[(Long, Long)].collect().toMap
          shadow = shadow ++ delta
          store = Dedup.connectedComponentsIncremental(store, bdf)
            .localCheckpoint(false)
        }
        val full = store.as[(Long, Long)].collect().toSet
        full == batchRun && shadow.toSet == full
    }, cases = scaledCases(20)) // 2K+1 component solves per case
  }

  private val incExactGen = for {
    n <- Gen.choose(0, 16)
    contents <- Gen.listOfN(n,
      Gen.oneOf("a", "b", "c", "d", "e", "f", "", "aa"))
    k <- Gen.choose(1, 4)
    assign <- Gen.listOfN(n, Gen.choose(0, 3))
  } yield (contents, k, assign.map(_ % k))

  test("law: K-batch incremental exact dedup ≡ the one-shot run over " +
      "the union — exact equality is transitive, so no superset " +
      "caveat; keys monotone with batch order") {
    // the operator's parity contract needs keys assigned monotonically
    // increasing across batches (the normal crawl pipeline): the
    // one-shot run keeps the min key per content group, the incremental
    // run keeps the first arrival — monotone ids make them the same doc
    check("incrementalExact", Prop.forAll(incExactGen) {
      case (contents, k, assign) =>
        val docs = contents.zip(assign).sortBy(_._2).zipWithIndex
          .map { case ((t, b), i) => (i.toLong, t, b) }
        val df = docs.map(d => (d._1, d._2)).toDF("doc_id", "text")
        def batchRun = Dedup.dropExactDuplicates(df, Seq("text"),
          "doc_id").select("doc_id").as[Long].collect().toSet
        var store = Dedup.exactSignatures(df.limit(0), Seq("text"),
          "doc_id")
        val keptAll = (0 until k).flatMap { i =>
          val b = docs.collect { case (id, t, bb) if bb == i => (id, t) }
          val bdf =
            if (b.isEmpty) df.limit(0) else b.toDF("doc_id", "text")
          val (kept, updated) = Dedup.dropExactDuplicatesIncremental(
            bdf, store, Seq("text"), "doc_id")
          store = updated.localCheckpoint(false)
          kept.select("doc_id").as[Long].collect()
        }.toSet
        keptAll == batchRun && store.count() == contents.distinct.size
    }, cases = scaledCases(25))
  }
}
