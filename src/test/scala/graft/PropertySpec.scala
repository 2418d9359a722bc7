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
}
