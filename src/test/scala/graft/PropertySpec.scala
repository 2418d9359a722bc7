package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators._

/** Property-based operator laws (SURVEY.md §5 strategy #2). ScalaCheck
  * generators build small random tag corpora (sampled with fixed seeds for
  * reproducibility); properties assert the set-algebra contracts hold for
  * arbitrary inputs, not just fixtures.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val tagPool = Seq("t1", "t2", "t3", "tA", "tB")
  private val corpusGen: Gen[Map[String, Seq[String]]] = for {
    n <- Gen.choose(2, 24)
    tagSets <- Gen.listOfN(n, Gen.someOf(tagPool).map(_.toSeq))
  } yield tagSets.zipWithIndex
    .map { case (ts, i) => f"img$i%03d" -> ts }.toMap

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def toDF(corpus: Map[String, Seq[String]]) =
    corpus.toSeq.map { case (id, ts) =>
      (id, if (ts.isEmpty) Seq(TagOps.UntaggedTag) else ts)
    }.toDF("image_id", "tags")

  test("AND result ⊆ every single-tag filter; OR = union of memberships") {
    samples(corpusGen, 6).foreach { corpus =>
      val df = toDF(corpus).cache()
      val filters = Seq("t1", "tA")
      val andIds = TagOps.andFilter(df, filters)
        .select("image_id").as[String].collect().toSet
      val orIds = TagOps.orFilter(df, filters)
        .select("image_id").as[String].collect().toSet
      val singles = filters.map(t => TagOps.andFilter(df, Seq(t))
        .select("image_id").as[String].collect().toSet)
      assert(andIds == singles.reduce(_ intersect _))
      assert(orIds == singles.reduce(_ union _))
      df.unpersist()
    }
  }

  test("joinSets membership = union; idempotent") {
    samples(corpusGen, 6).foreach { corpus =>
      val df = toDF(corpus).cache()
      val a = TagOps.orFilter(df, Seq("t1", "t2"))
      val b = TagOps.orFilter(df, Seq("tA", "tB"))
      val joined = TagOps.joinSets(Seq(a, b))
      val expect = a.select("image_id").as[String].collect().toSet ++
        b.select("image_id").as[String].collect().toSet
      assert(joined.select("image_id").as[String].collect().toSet == expect)
      assert(TagOps.joinSets(Seq(a, a)).count() == a.count())
      df.unpersist()
    }
  }

  test("splits partition the input with exact sizes for any n, p") {
    val nGen = Gen.choose(2, 60)
    val pGen = Gen.choose(0.05, 0.8)
    samples(Gen.zip(nGen, pGen), 8).foreach { case (n, p) =>
      val df = (1 to n).map(i => f"id$i%04d").toDF("image_id")
      val split = Splits.testDevSplit(df, p, seed = 1)
      val counts = split.groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expTest = math.max(1L, math.floor(n * p).toLong)
      assert(counts.getOrElse("test", 0L) == expTest,
        s"n=$n p=$p counts=$counts")
      assert(counts.values.sum == n)
    }
  }

  test("binned joins equal the brute force for arbitrary data — negative " +
      "bounds, random widths, inverted and zero-length intervals") {
    // the fixtures elsewhere use non-negative values; this pins the floor
    // division's behavior across zero (floor(-5/16) = -1, not 0) and the
    // width-independence of the result
    val rowGen = for {
      k <- Gen.choose(0, 2)
      lo <- Gen.choose(-300L, 300L)
      len <- Gen.oneOf(Gen.const(0L), Gen.choose(-60L, -1L),
        Gen.choose(1L, 90L))
    } yield (k.toLong, lo, lo + len)
    val setGen = Gen.listOfN(60, rowGen)
    def gen(seed: Long) =
      setGen.apply(Gen.Parameters.default, Seed(seed)).get
    for (seed <- 1 to 4; width <- Seq(7L, 64L)) {
      val ls = gen(seed.toLong)
      val rs = gen(seed + 100L)
      val l = ls.zipWithIndex.map { case ((k, a, b), i) =>
        (i.toLong, k, a, b) }.toDF("lid", "k", "l_lo", "l_hi")
      val r = rs.zipWithIndex.map { case ((k, a, b), i) =>
        (1000L + i, k, a, b) }.toDF("rid", "k", "r_lo", "r_hi")
      // point-in-interval (points = left los)
      val pts = l.select($"lid", $"k", $"l_lo".as("at"))
      val gotRange = Joins.rangeJoin(pts, r, Seq("k"), "at", "r_lo", "r_hi",
          binWidth = width, maxBinSize = 0)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      val expRange = pts.join(r.withColumnRenamed("k", "k2"),
          $"k" === $"k2" && $"at" >= $"r_lo" && $"at" < $"r_hi")
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(gotRange == expRange, s"rangeJoin seed=$seed width=$width")
      // interval overlap, duplicate-free
      val gotOv = Joins.intervalOverlapJoin(l, r, Seq("k"),
          "l_lo", "l_hi", "r_lo", "r_hi", binWidth = width,
          maxBinSize = 0)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
      val expOv = l.join(r.withColumnRenamed("k", "k2"),
          $"k" === $"k2" && $"l_lo" < $"r_hi" && $"r_lo" < $"l_hi")
        .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
      assert(gotOv == gotOv.distinct,
        s"overlap duplicated pairs seed=$seed width=$width")
      assert(gotOv == expOv, s"overlap seed=$seed width=$width")
    }
  }

  test("transform composition: rename chains compose left-to-right") {
    val labelsGen = Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d"))
    samples(labelsGen, 8).foreach { labels =>
      val df = labels.toDF("label")
      val chain = Seq(Rename("a", "b"), Rename("b", "c"))
      val out = LabelTransforms.applyTo(df, "label", chain)
        .as[String].collect().toList
      val expected = labels.map {
        case "a" | "b" => "c"
        case other => other
      }
      assert(out == expected)
    }
  }

  test("shard sizes differ by at most 1 and cover all rows for any n") {
    samples(Gen.choose(1, 2600), 5).foreach { n =>
      val df = (1 to n).map(i => f"id$i%05d").toDF("image_id")
      val sizes = Splits.shardAssign(df,
          Seq(org.apache.spark.sql.functions.col("image_id")))
        .groupBy("shard").count()
        .collect().map(_.getLong(1))
      assert(sizes.sum == n)
      assert(sizes.length == n / 1000 + 1)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  // ---- random text corpora for the text-pipeline laws: small shared
  // vocabulary (forces n-gram collisions), lengths 0..18 incl. empties
  private val wordPool = Seq("aa", "bb", "cc", "dd", "ee")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 18)
    ws <- Gen.listOfN(n, Gen.oneOf(wordPool))
  } yield ws.mkString(" ")
  private val textCorpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    ts <- Gen.listOfN(n, textGen)
  } yield ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def toks(t: String): Array[String] =
    t.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Brute-force reference for the span family: per-occurrence n-grams
    * with the kernels' short-doc rule, islands over covered positions.
    */
  private def bruteGrams(t: String, n: Int): Seq[(Int, Int, String)] = {
    val tk = toks(t)
    if (tk.isEmpty) Nil
    else if (tk.length < n) Seq((0, tk.length, tk.mkString(" ")))
    else (0 to tk.length - n).map(i =>
      (i, i + n, tk.slice(i, i + n).mkString(" ")))
  }
  private def islands(cov: Set[Int]): Seq[(Int, Int)] =
    if (cov.isEmpty) Nil
    else {
      val s = cov.toSeq.sorted
      s.tail.foldLeft(List((s.head, s.head + 1))) {
        case ((cs, ce) :: rest, p) =>
          if (p == ce) (cs, ce + 1) :: rest else (p, p + 1) :: (cs, ce) :: rest
        case (Nil, p) => List((p, p + 1))
      }.reverse
    }

  test("repeatedSpans ≡ brute force for arbitrary corpora; the mask " +
      "drops exactly the covered tokens") {
    for (corpus <- samples(textCorpusGen, 6); n <- Seq(2, 3);
        minCount <- Seq(2, 4)) {
      val df = corpus.toDF("doc_id", "text")
      val counts = corpus.flatMap(d => bruteGrams(d._2, n))
        .groupBy(_._3).view.mapValues(_.size).toMap
      val expected = corpus.flatMap { case (k, t) =>
        val cov = bruteGrams(t, n)
          .filter(g => counts(g._3) >= minCount)
          .flatMap(g => g._1 until g._2).toSet
        islands(cov).map { case (s, e) => (k, s, e) }
      }.toSet
      val got = Dedup.repeatedSpans(df, "text", "doc_id", n, minCount)
        .as[(Long, Int, Int)].collect().toSet
      assert(got == expected,
        s"n=$n minCount=$minCount corpus=$corpus:\n$got\nvs\n$expected")
      val masked = Dedup.maskRepeatedSpans(df, "text", "doc_id", n,
          minCount)
        .select("doc_id", "masked_text").as[(Long, String)]
        .collect().toMap
      for ((k, t) <- corpus) {
        val cov = expected.collect {
          case (`k`, s, e) => s until e }.flatten.toSet
        val want = toks(t).zipWithIndex
          .collect { case (w, i) if !cov(i) => w }.mkString(" ")
        assert(masked(k) == want, s"doc $k of $corpus")
      }
    }
  }

  test("contaminatedSpans ≡ brute force benchmark membership for " +
      "arbitrary corpus/benchmark splits") {
    for (corpus <- samples(textCorpusGen, 6); n <- Seq(2, 3)) {
      val (benchRows, corpusRows) = corpus.partition(_._1 % 3 == 0)
      if (benchRows.nonEmpty && corpusRows.nonEmpty) {
        val benchSet = benchRows
          .flatMap(d => bruteGrams(d._2, n).map(_._3)).toSet
        val expected = corpusRows.flatMap { case (k, t) =>
          val cov = bruteGrams(t, n).filter(g => benchSet(g._3))
            .flatMap(g => g._1 until g._2).toSet
          islands(cov).map { case (s, e) => (k, s, e) }
        }.toSet
        val got = TextOps.contaminatedSpans(
            corpusRows.toDF("doc_id", "text"),
            benchRows.toDF("doc_id", "text"), "text", "doc_id", n)
          .as[(Long, Int, Int)].collect().toSet
        assert(got == expected, s"n=$n corpus=$corpus")
      }
    }
  }

  test("contaminationReport ≡ brute-force per-benchmark-item leak " +
      "stats for arbitrary corpus/benchmark splits") {
    for (corpus <- samples(textCorpusGen, 6); n <- Seq(2, 3)) {
      val (benchRows, corpusRows) = corpus.partition(_._1 % 3 == 0)
      if (benchRows.nonEmpty && corpusRows.nonEmpty) {
        val corpusSets = corpusRows
          .map { case (k, t) => k -> bruteGrams(t, n).map(_._3).toSet }
        val expected = benchRows.map { case (b, t) =>
          val bg = bruteGrams(t, n).map(_._3).toSet
          val leaked = bg.count(g => corpusSets.exists(_._2(g)))
          val ldocs = corpusSets.count(_._2.exists(bg))
          val frac = if (bg.isEmpty) 0.0 else leaked.toDouble / bg.size
          (b, (bg.size.toLong, leaked.toLong, frac, ldocs.toLong,
            if (leaked == 0) "clean" else "leaked"))
        }.toMap
        val got = TextOps.contaminationReport(
            corpusRows.toDF("doc_id", "text"),
            benchRows.toDF("doc_id", "text"), "text", "doc_id",
            "doc_id", n)
          .select("doc_id", "bench_ngrams", "leaked_ngrams",
            "leak_frac", "leaking_docs", "verdict")
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getLong(4), r.getString(5))))
          .toMap
        assert(got == expected, s"n=$n corpus=$corpus")
      }
    }
  }

  test("temperatureSample ≡ brute-force Hamilton quotas + digest pick " +
      "for arbitrary domain distributions, n, tau") {
    val distGen: Gen[Seq[Int]] = for {
      d <- Gen.choose(1, 5)
      sizes <- Gen.listOfN(d, Gen.choose(1, 8))
    } yield sizes
    val caseGen = Gen.zip(distGen, Gen.choose(0, 20),
      Gen.oneOf(0.0, 0.3, 0.5, 1.0, 1.7))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    samples(caseGen, 10).foreach { case (sizes, n, tau) =>
      val rows = sizes.zipWithIndex.flatMap { case (sz, d) =>
        (0 until sz).map(i => ((d * 100 + i).toLong, s"dom$d"))
      }
      val df = rows.toDF("id", "dom")
      // independent quota reimplementation (sorted-domain sum order)
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
      // expected keys: per domain, the quota smallest md5 digests
      val expected = rows.groupBy(_._2).flatMap { case (d, rs) =>
        rs.map(_._1).sortBy(k => (md5hex(s"graft$k"), k))
          .take(quota(d).toInt)
      }.toSet
      val got = Splits.temperatureSample(df, "dom", n, tau, "id")
        .select("id").as[Long].collect().toSet
      assert(got == expected, s"sizes=$sizes n=$n tau=$tau " +
        s"quota=$quota got=$got expected=$expected")
    }
  }

  test("packChunks conserves the token stream: exact seqLen everywhere " +
      "but the tail, contiguous ids, reconstruction = input multiset") {
    for (corpus <- samples(textCorpusGen, 6); seqLen <- Seq(3, 7, 11)) {
      val out = TextOps.packChunks(corpus.toDF("doc_id", "text"), "text",
          "doc_id", seqLen, boundary = "<e>")
        .orderBy("seq_id")
        .select("seq_id", "n_tokens", "seq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val totalTokens = corpus.map(d => toks(d._2).length + 1L).sum
      assert(out.map(_._1).toSeq == (0L until out.length.toLong),
        "sequence ids must be contiguous from 0")
      assert(out.map(_._2).sum == totalTokens, "token conservation")
      out.dropRight(1).foreach { case (id, nt, _) =>
        assert(nt == seqLen, s"non-final seq $id carried $nt tokens") }
      out.foreach { case (_, nt, s) =>
        assert(toks(s).length.toLong == nt) }
      // splitting the stream at boundaries recovers the units
      val stream = out.map(_._3).mkString(" ").split(" ")
      val groups = scala.collection.mutable.ArrayBuffer(
        Seq.empty[String])
      stream.foreach {
        case "<e>" => groups += Seq.empty
        case w => groups(groups.length - 1) :+= w
      }
      assert(groups.last.isEmpty)
      assert(groups.dropRight(1).map(_.mkString(" ")).sorted.toSeq ==
        corpus.map(d => toks(d._2).mkString(" ")).sorted,
        s"reconstruction mismatch for $corpus")
    }
  }
}
