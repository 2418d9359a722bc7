package graft

import org.apache.spark.sql.functions._

import graft.operators.Splits

class SplitsSpec extends SparkTestBase {
  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(i => f"id_$i%04d").toDF("image_id")

  test("testDevSplit: exact counts, min-1 test row, partition of input") {
    val df = ids(10)
    val split = Splits.testDevSplit(df, 0.2, seed = 42)
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("test" -> 2L, "dev" -> 8L))
    // membership partitions the input
    assert(split.select("image_id").as[String].collect().sorted.toList
      == df.as[String].collect().sorted.toList)
    // min-1: floor(5 * 0.1) = 0 → still 1 test row
    val tiny = Splits.testDevSplit(ids(5), 0.1, seed = 42)
    assert(tiny.filter($"split" === "test").count() == 1)
    // deterministic
    val again = Splits.testDevSplit(df, 0.2, seed = 42)
    assert(split.collect().toSet == again.collect().toSet)
  }

  test("testDevSplit errors on n <= 1 (reference contract)") {
    intercept[IllegalArgumentException] {
      Splits.testDevSplit(ids(1), 0.2)
    }
  }

  test("kfold: folds balanced within 1 and partition the input") {
    val df = ids(10)
    val folds = Splits.kfold(df, k = 3, seed = 0)
    val sizes = folds.groupBy("fold").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(1, 2, 3))
    assert(sizes.values.sum == 10)
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(sizes(1) == 4) // n % k extra rows go to the first folds
  }

  test("shardAssign: n/1000+1 shards, round-robin sizes") {
    val df = ids(2500)
    val sharded = Splits.shardAssign(df, Seq(col("image_id")))
    val sizes = sharded.groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L)) // 2500/1000 + 1 = 3
    assert(sizes.values.sum == 2500)
    assert(sizes.values.max - sizes.values.min <= 1)
    // round-robin: first three rows land on shards 0,1,2
    val first = sharded.orderBy("image_id").limit(3)
      .select("shard").as[Long].collect().toList
    assert(first == List(0L, 1L, 2L))
  }

  test("deterministicSample: exact n, engine-independent, stable") {
    val df = ids(500)
    val s1 = Splits.deterministicSample(df, n = 20, key = "image_id")
      .select("image_id").as[String].collect().toSet
    assert(s1.size == 20)
    // stable across invocations and partitioning
    val s2 = Splits.deterministicSample(df.repartition(7), 20, "image_id")
      .select("image_id").as[String].collect().toSet
    assert(s1 == s2)
    // different salt → different draw
    val s3 = Splits.deterministicSample(df, 20, "image_id", salt = "other")
      .select("image_id").as[String].collect().toSet
    assert(s1 != s3)
    // n >= size → everything
    assert(Splits.deterministicSample(ids(5), 10, "image_id").count() == 5)
  }

  test("stratifiedSample: exact per-stratum counts, capped by stratum size") {
    val df = ((1 to 300).map(i => (i.toLong, Seq("a", "b", "c")(i % 3)))
      :+ (100000L, "rare")).toDF("image_id", "stratum")
    val out = Splits.stratifiedSample(df, "stratum", perStratum = 10,
      key = "image_id")
    val counts = out.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 10L, "b" -> 10L, "c" -> 10L, "rare" -> 1L))
    // deterministic under repartitioning
    val again = Splits.stratifiedSample(df.repartition(11), "stratum", 10,
      "image_id")
    assert(out.select("image_id").as[Long].collect().toSet ==
      again.select("image_id").as[Long].collect().toSet)
  }

  test("weightedSample: deterministic, weight-biased, excludes w <= 0") {
    val df = ((1 to 200).map(i => (i.toLong, 1.0))
      :+ (1000L, 100000.0) // overwhelming weight → effectively certain
      :+ (2000L, 0.0) :+ (3000L, -5.0)) // never eligible
      .toDF("id", "w")
    val s1 = Splits.weightedSample(df, n = 20, key = "id", weightCol = "w")
      .select("id").as[Long].collect().toSet
    assert(s1.size == 20)
    assert(s1.contains(1000L), "heavy item must be drawn")
    assert(!s1.contains(2000L) && !s1.contains(3000L))
    // stable under repartitioning
    val s2 = Splits.weightedSample(df.repartition(9), 20, "id", "w")
      .select("id").as[Long].collect().toSet
    assert(s1 == s2)
    // bias: over many disjoint salts, heavy-of-two wins most draws
    val pair = Seq((1L, 1.0), (2L, 9.0)).toDF("id", "w")
    val wins = (1 to 40).count { i =>
      Splits.weightedSample(pair, 1, "id", "w", salt = s"s$i")
        .select("id").as[Long].collect().head == 2L
    }
    assert(wins > 25, s"weight-9 item won only $wins/40 draws") // E[wins]=36
  }

  test("temperatureSample: largest-remainder n_d^tau quotas, digest " +
      "order within domains, caps, tau endpoints, null exclusion") {
    // domains: a×8, b×2, c×4, plus 2 null-domain rows (excluded)
    val df = ((1 to 8).map(i => (i.toLong, "a")) ++
      (11 to 12).map(i => (i.toLong, "b")) ++
      (21 to 24).map(i => (i.toLong, "c")) ++
      Seq((91L, null.asInstanceOf[String]), (92L, null.asInstanceOf[String])))
      .toDF("id", "dom")
    def domCounts(out: org.apache.spark.sql.DataFrame) =
      out.groupBy("dom").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // tau=0.5, n=7: weights √8:√2:√4 → ideals 3.17/1.59/2.24 →
    // bases 3/1/2, leftover 1 → largest remainder (b, .59) gets it
    val t = Splits.temperatureSample(df, "dom", n = 7, tau = 0.5,
      key = "id")
    assert(domCounts(t) == Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
    // within-domain selection is the digest order: per domain the pick
    // equals stratifiedSample at that domain's quota
    for ((d, q) <- Seq(("a", 3), ("b", 2), ("c", 2))) {
      val want = Splits.stratifiedSample(df.filter($"dom" === d), "dom",
        q, "id").select("id").as[Long].collect().toSet
      val got = t.filter($"dom" === d).select("id").as[Long]
        .collect().toSet
      assert(got == want, s"domain $d: $got != $want")
    }
    // deterministic under repartitioning
    val again = Splits.temperatureSample(df.repartition(9), "dom", 7,
      0.5, "id")
    assert(t.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet)

    // tau=1: natural proportions, 7·(8/14, 2/14, 4/14) = 4/1/2 exactly
    assert(domCounts(Splits.temperatureSample(df, "dom", 7, 1.0, "id"))
      == Map("a" -> 4L, "b" -> 1L, "c" -> 2L))
    // tau=0: uniform thirds, equal remainders tie-break to 'a'
    assert(domCounts(Splits.temperatureSample(df, "dom", 7, 0.0, "id"))
      == Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
    // quotas cap at the domain size, capped share is NOT redistributed:
    // tau=0, n=12 → ideal 4 each, b caps at 2 → 10 rows total
    val capped = Splits.temperatureSample(df, "dom", 12, 0.0, "id")
    assert(domCounts(capped) == Map("a" -> 4L, "b" -> 2L, "c" -> 4L))
    // n >= total non-null rows → every non-null row, never a null
    val all = Splits.temperatureSample(df, "dom", 100, 0.7, "id")
    assert(domCounts(all) == Map("a" -> 8L, "b" -> 2L, "c" -> 4L))
    // n=0 → empty, schema preserved
    val empty = Splits.temperatureSample(df, "dom", 0, 0.5, "id")
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "dom"))
  }

  test("digest-threshold pre-filter: forced-undershoot margins fall " +
      "back to the full window and reproduce the default result " +
      "exactly, null strata included") {
    val df = ((1 to 300).map(i => (i.toLong, Seq("a", "b", "c")(i % 3)))
      ++ Seq((1001L, null.asInstanceOf[String]),
        (1002L, null.asInstanceOf[String]),
        (1003L, null.asInstanceOf[String])))
      .toDF("image_id", "stratum")
    def keys(out: org.apache.spark.sql.DataFrame): Set[Long] =
      out.select("image_id").as[Long].collect().toSet
    val want = keys(Splits.stratifiedSample(df, "stratum", 2, "image_id"))
    // null stratum is a stratum: 2 of the 3 null rows are in the sample
    assert(want.count(_ > 1000L) == 2, want)
    // margin so low every threshold drops every row → every stratum
    // takes the widen path — the result must not change
    assert(keys(Splits.stratifiedSampleImpl(df, "stratum", 2,
      "image_id", "graft", margin = -1000.0)) == want)
    // margin near the expectation: strata undershoot or survive on
    // their own digest draw — whichever mix lands must stay exact
    assert(keys(Splits.stratifiedSampleImpl(df, "stratum", 2,
      "image_id", "graft", margin = -12.0)) == want)

    val nonNull = df.filter($"stratum".isNotNull)
    val wantT = keys(Splits.temperatureSample(nonNull, "stratum", 5,
      0.5, "image_id"))
    assert(keys(Splits.temperatureSampleImpl(nonNull, "stratum", 5, 0.5,
      "image_id", "graft", margin = -1000.0)) == wantT)
    // reliableLineage (persist instead of localCheckpoint) is a pure
    // storage-strategy swap — identical results
    assert(keys(Splits.stratifiedSample(df, "stratum", 2, "image_id",
      reliableLineage = true)) == want)

    // reserved internal names fail loud, not silently clobbered
    val err = intercept[IllegalArgumentException] {
      Splits.stratifiedSample(df.withColumn("_rk", lit(1)), "stratum",
        2, "image_id")
    }
    assert(err.getMessage.contains("_rk"), err.getMessage)

    // the domain-cardinality cap fails fast BEFORE an unbounded driver
    // collect (the ngramLm maxTypes posture), for both samplers
    val cap1 = intercept[IllegalArgumentException] {
      Splits.stratifiedSample(df, "image_id", 1, "image_id",
        maxStrata = 10)
    }
    assert(cap1.getMessage.contains("maxStrata"), cap1.getMessage)
    val cap2 = intercept[IllegalArgumentException] {
      Splits.temperatureSample(nonNull, "image_id", 5, 0.5, "image_id",
        maxDomains = 10)
    }
    assert(cap2.getMessage.contains("maxDomains"), cap2.getMessage)
  }

  test("exactTopQuota mixed undershoot: a non-null domain falling back " +
      "to its full window must not drop the confirmed null domain's " +
      "sample through three-valued isin negation") {
    // hand quotas drive the branches deterministically: threshold -1
    // forces domain \"a\" to zero survivors (short → full-window
    // fallback), max52 keeps every null-domain row in the sliver
    // (confirmed ok). The buggy negation (!isShort with a null _dom)
    // silently dropped the null domain's rows from the sliver side.
    val max52 = (1L << 52) - 1
    val df = ((1 to 5).map(i => (i.toLong, "a"))
      ++ Seq((101L, null.asInstanceOf[String]),
        (102L, null.asInstanceOf[String]),
        (103L, null.asInstanceOf[String])))
      .toDF("image_id", "dom")
    val out = Splits.exactTopQuota(df, $"dom",
      Seq(("a", 2L, -1L, 5L), (null, 2L, max52, 3L)), "image_id",
      "graft")
      .select("image_id").as[Long].collect().toSet
    assert(out.count(_ <= 5L) == 2, s"short domain must fall back: $out")
    assert(out.count(_ > 100L) == 2,
      s"the confirmed null domain's sample was dropped: $out")
  }

  test("hashSplit: deterministic, shuffle-free, roughly proportional") {
    val df = ids(2000)
    val s1 = Splits.hashSplit(df, "image_id")
    val counts = s1.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    val testFrac = counts.getOrElse("test", 0L).toDouble / 2000
    assert(testFrac > 0.15 && testFrac < 0.25, s"test frac $testFrac")
    assert(s1.collect().toSet == Splits.hashSplit(df, "image_id").collect().toSet)
  }

  test("withRunningTotal: exclusive distributed prefix sum in sort " +
      "order, nulls count zero, loud type check") {
    import spark.implicits._
    val df = Seq((3L, Some(10L)), (1L, Some(5L)), (4L, None),
        (2L, Some(7L)), (5L, Some(2L)))
      .toDF("k", "v")
      .repartition(4) // bases must compose across partitions
    val out = Splits.withRunningTotal(df, Seq(col("k")), "v", "_cum")
      .select("k", "_cum").as[(Long, Long)].collect().toMap
    // sorted by k: v = 5, 7, 10, null(0), 2 → exclusive sums
    assert(out == Map(1L -> 0L, 2L -> 5L, 3L -> 12L, 4L -> 22L,
      5L -> 22L))
    val err = intercept[IllegalArgumentException] {
      Splits.withRunningTotal(df.withColumn("v", col("v").cast("int")),
        Seq(col("k")), "v")
    }
    assert(err.getMessage.contains("bigint"), err.getMessage)
    // scale sanity: 10k rows across 32 partitions, cum(k) closed-form
    val big = spark.range(10000).select(col("id").as("k"),
      lit(1L).as("v"))
    val bigOut = Splits.withRunningTotal(big, Seq(col("k")), "v")
      .filter(col("k").isin(0L, 5000L, 9999L))
      .select("k", "_cum").as[(Long, Long)].collect().toMap
    assert(bigOut == Map(0L -> 0L, 5000L -> 5000L, 9999L -> 9999L))
  }
}
