package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Joins
import graft.plans.RangeJoinRewrite

/** The optimizer rule that turns point-in-interval theta-joins into the
  * binned equi-join: plan shape (no nested-loop join), result parity with
  * both the naive plan and the explicit [[Joins.rangeJoin]] operator, both
  * orientations, width inference, and the disable knob.
  */
class RangeJoinRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private val points = Seq((1L, 5L), (2L, 15L), (3L, 25L), (4L, 250L))
    .toDF("pid", "at")
  // iid 13 is inverted (end < start): contains nothing, must not blow up
  private val intervals = Seq((10L, 0L, 10L), (11L, 10L, 20L),
    (12L, 240L, 260L), (13L, 30L, 20L)).toDF("iid", "start", "end")
  private val expected = Set((1L, 10L), (2L, 11L), (4L, 12L))

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").as[(Long, Long)].collect().toSet

  /** Arbitrary [start, end) columns carry no inferable width — the rule
    * requires the explicit conf for those (see RangeJoinRewrite doc).
    */
  private def withBinWidth[A](w: Long)(body: => A): A = {
    spark.conf.set(RangeJoinRewrite.BinWidthKey, w.toString)
    try body finally spark.conf.unset(RangeJoinRewrite.BinWidthKey)
  }

  test("keyless range theta-join plans as a binned equi-join, not BNLJ") {
    withBinWidth(16) {
      val joined = points.join(intervals,
        $"at" >= $"start" && $"at" < $"end")
      val plan = physical(joined)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("_graft_bin"), s"no bin key in:\n$plan")
      assert(pairs(joined) == expected)
    }
  }

  test("no inferable width and no conf → plan left alone (no blind bins)") {
    // a guessed width in the wrong unit could explode the interval side;
    // the rule must decline rather than gamble
    val joined = points.join(intervals,
      $"at" >= $"start" && $"at" < $"end")
    val plan = physical(joined)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"rule should not have fired without a width:\n$plan")
    assert(pairs(joined) == expected)
  }

  test("disable knob restores vanilla planning, same results") {
    spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
    try withBinWidth(16) {
      val joined = points.join(intervals,
        $"at" >= $"start" && $"at" < $"end")
      assert(physical(joined).contains("BroadcastNestedLoopJoin"))
      assert(pairs(joined) == expected)
    } finally spark.conf.unset(RangeJoinRewrite.EnabledKey)
  }

  test("sliding-window upper bound infers the bin width from the literal") {
    val starts = intervals.select($"iid", $"start")
    val joined = points.join(starts,
      $"at" >= $"start" && $"at" < $"start" + 20L)
    val plan = physical(joined)
    assert(plan.contains("_graft_bin"), s"rewrite did not fire:\n$plan")
    // width 20 (the window length), not the 3600 conf default
    assert(plan.contains("/ 20.0"), s"inferred width missing in:\n$plan")
    val manual = points.crossJoin(starts)
      .filter($"at" >= $"start" && $"at" < $"start" + 20L)
    assert(pairs(joined) == pairs(manual))
  }

  test("point on the RIGHT side rewrites too") {
    withBinWidth(16) {
      val joined = intervals.join(points,
        $"at" >= $"start" && $"at" < $"end")
      val plan = physical(joined)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire:\n$plan")
      assert(pairs(joined) == expected)
    }
  }

  test("composes with equi keys and matches Joins.rangeJoin") {
    withBinWidth(16) {
      val l = points.withColumn("k", $"pid" % 2)
      val r = intervals.withColumn("k", $"iid" % 2)
      val joined = l.as("l").join(r.as("r"),
        col("l.k") === col("r.k") && $"at" >= $"start" && $"at" < $"end")
        .select($"pid", $"iid")
      val plan = physical(joined)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire:\n$plan")
      val viaOperator = Joins.rangeJoin(l, r.withColumnRenamed("k", "k2")
          .withColumnRenamed("iid", "iid2").withColumnRenamed("k2", "k"),
          Seq("k"), "at", "start", "end", binWidth = 16L)
        .select($"pid", col("iid2").as("iid"))
      assert(pairs(joined) == pairs(viaOperator))
    }
  }

  test("raw SQL through the extension point gets the rewrite") {
    withBinWidth(16) {
      points.createOrReplaceTempView("rr_points")
      intervals.createOrReplaceTempView("rr_intervals")
      val joined = spark.sql(
        """SELECT pid, iid FROM rr_points p JOIN rr_intervals i
          |ON p.at >= i.start AND p.at < i.end""".stripMargin)
      assert(!physical(joined).contains("BroadcastNestedLoopJoin"))
      assert(joined.as[(Long, Long)].collect().toSet == expected)
    }
  }

  test("sliding-window SQL needs NO conf: the width comes from the plan") {
    points.createOrReplaceTempView("rr_points")
    intervals.select($"iid", $"start").createOrReplaceTempView("rr_starts")
    val joined = spark.sql(
      """SELECT pid, iid FROM rr_points p JOIN rr_starts i
        |ON p.at >= i.start AND p.at < i.start + 20""".stripMargin)
    assert(!physical(joined).contains("BroadcastNestedLoopJoin"))
    val manual = points.crossJoin(intervals.select($"iid", $"start"))
      .filter($"at" >= $"start" && $"at" < $"start" + 20)
    assert(joined.as[(Long, Long)].collect().toSet == pairs(manual))
  }

  test("explicit malformed or non-positive binWidth fails loudly") {
    // the user opted in; silently declining the rewrite would be
    // undiagnosable, so both bad shapes must raise a message naming the key
    for (bad <- Seq("0", "-5", "1h")) {
      spark.conf.set(RangeJoinRewrite.BinWidthKey, bad)
      try {
        val e = intercept[Throwable] {
          points.join(intervals, $"at" >= $"start" && $"at" < $"end")
            .queryExecution.executedPlan
        }
        val messages = Iterator.iterate(e)(_.getCause)
          .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
        assert(messages.contains("binWidth"), s"for '$bad': $messages")
      } finally spark.conf.unset(RangeJoinRewrite.BinWidthKey)
    }
  }

  test("two range dimensions: one pair binned, the other stays residual " +
      "when its width is not inferable") {
    withBinWidth(16) {
      val pts = Seq((1L, 5L, 100L), (2L, 15L, 200L), (3L, 25L, 300L))
        .toDF("pid", "at", "at2")
      val ivs = Seq((10L, 0L, 10L, 90L, 110L), (11L, 10L, 20L, 150L, 160L),
        (12L, 20L, 30L, 250L, 350L)).toDF("iid", "s1", "e1", "s2", "e2")
      val joined = pts.join(ivs,
        $"at" >= $"s1" && $"at" < $"e1" &&
          $"at2" >= $"s2" && $"at2" < $"e2")
      val plan = physical(joined)
      assert(plan.contains("_graft_bin"), s"no rewrite in:\n$plan")
      // dim 2's [s2, e2) carries no sliding literal and the conf width is
      // in dim 1's units — it must NOT be binned
      assert(!plan.contains("_graft_bin2"),
        s"uninferable second dimension must stay residual:\n$plan")
      val manual = pts.crossJoin(ivs)
        .filter($"at" >= $"s1" && $"at" < $"e1" &&
          $"at2" >= $"s2" && $"at2" < $"e2")
      assert(pairs(joined) == pairs(manual))
      assert(pairs(joined) == Set((1L, 10L), (3L, 12L))) // iid 11 fails dim 2
    }
  }

  test("two sliding-window dimensions bin together: both equi keys, no " +
      "conf needed") {
    // time-window AND value-band — the 2-D shape; both widths come from
    // the `< start + C` literals, so the rewrite is conf-free
    val pts = Seq((1L, 5L, 100L), (2L, 15L, 200L), (3L, 25L, 300L),
      (4L, 5L, 300L)).toDF("pid", "at", "v")
    val ivs = Seq((10L, 0L, 95L), (11L, 10L, 150L), (12L, 20L, 290L),
      (13L, 0L, 290L)).toDF("iid", "s1", "s2")
    val joined = pts.join(ivs,
      $"at" >= $"s1" && $"at" < $"s1" + 20L &&
        $"v" >= $"s2" && $"v" < $"s2" + 30L)
    val plan = physical(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"2-D rewrite did not fire:\n$plan")
    assert(plan.contains("_graft_bin_pt2") && plan.contains("_graft_bin2"),
      s"second dimension lost its bin key:\n$plan")
    val manual = pts.crossJoin(ivs)
      .filter($"at" >= $"s1" && $"at" < $"s1" + 20L &&
        $"v" >= $"s2" && $"v" < $"s2" + 30L)
    assert(pairs(joined) == pairs(manual))
    // (1,10): at 5∈[0,20), v 100∈[95,125); (3,12): at 25∈[20,40),
    // v 300∈[290,320); (4,13): at 5∈[0,20), v 300∈[290,320);
    // (2,11): at 15∈[10,30) but v 200∉[150,180) — dim 2 must reject it
    assert(pairs(joined) == Set((1L, 10L), (3L, 12L), (4L, 13L)))
  }


  test("raw 2-D SQL gets both bin keys through the extension point") {
    val pts = Seq((1L, 5L, 100L), (2L, 15L, 200L), (3L, 25L, 300L),
      (4L, 5L, 300L)).toDF("pid", "at", "v")
    val ivs = Seq((10L, 0L, 95L), (11L, 10L, 150L), (12L, 20L, 290L),
      (13L, 0L, 290L)).toDF("iid", "s1", "s2")
    pts.createOrReplaceTempView("rr2_points")
    ivs.createOrReplaceTempView("rr2_ivs")
    val joined = spark.sql(
      """SELECT pid, iid FROM rr2_points p JOIN rr2_ivs i
        |ON p.at >= i.s1 AND p.at < i.s1 + 20
        |AND p.v >= i.s2 AND p.v < i.s2 + 30""".stripMargin)
    val plan = physical(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("_graft_bin2"), s"2-D SQL rewrite did not fire:\n$plan")
    assert(joined.as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (3L, 12L), (4L, 13L)))
  }

  test("timestamp bounds with NO interval literal are left alone even " +
      "with the conf width set (its unit is numeric-only)") {
    withBinWidth(16) {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      val pts = Seq((1L, t("2024-01-01 10:00:05"))).toDF("pid", "at")
      val ivs = Seq((10L, t("2024-01-01 10:00:00"), t("2024-01-01 10:01:00")))
        .toDF("iid", "start", "end")
      val joined = pts.join(ivs, $"at" >= $"start" && $"at" < $"end")
      assert(!physical(joined).contains("_graft_bin"))
      assert(pairs(joined) == Set((1L, 10L)))
    }
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val tsPoints = Seq(
    (1L, ts("2024-01-01 10:00:05")), (2L, ts("2024-01-01 11:30:00")),
    (3L, ts("2024-01-02 09:59:59")), (4L, ts("2024-03-01 00:00:00")))
    .toDF("pid", "at")
  private val tsStarts = Seq(
    (10L, ts("2024-01-01 09:30:00")), (11L, ts("2024-01-01 11:00:00")),
    (12L, ts("2024-01-02 09:00:00")), (13L, ts("2024-06-01 00:00:00")))
    .toDF("iid", "start")

  test("timestamp sliding window (ts < start + INTERVAL) rewrites with " +
      "the interval's micros as the bin width — no conf, no epoch " +
      "conversion by the user") {
    val cond = expr("at >= start AND at < start + INTERVAL '1' HOUR")
    val joined = tsPoints.join(tsStarts, cond)
    val plan = physical(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"timestamp rewrite did not fire:\n$plan")
    assert(plan.contains("_graft_bin"), s"no bin key in:\n$plan")
    // 3.6e9 micros = the 1-hour literal
    assert(plan.contains("3.6E9"), s"micros width missing in:\n$plan")
    val manual = tsPoints.crossJoin(tsStarts).filter(cond)
    assert(pairs(joined) == pairs(manual))
    assert(pairs(joined) == Set((1L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("timestamp range join in raw SQL, and as LEFT OUTER") {
    tsPoints.createOrReplaceTempView("ts_points")
    tsStarts.createOrReplaceTempView("ts_starts")
    val inner = spark.sql(
      """SELECT pid, iid FROM ts_points p JOIN ts_starts i
        |ON p.at >= i.start AND p.at < i.start + INTERVAL '1' HOUR"""
        .stripMargin)
    assert(!physical(inner).contains("BroadcastNestedLoopJoin") &&
      physical(inner).contains("_graft_bin"))
    assert(inner.as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 11L), (3L, 12L)))
    val outer = spark.sql(
      """SELECT pid, iid FROM ts_points p LEFT JOIN ts_starts i
        |ON p.at >= i.start AND p.at < i.start + INTERVAL '1' HOUR"""
        .stripMargin)
    assert(!physical(outer).contains("BroadcastNestedLoopJoin") &&
      physical(outer).contains("_graft_bin"))
    assert(outer.as[(Long, Option[Long])].collect().toSet ==
      Set((1L, Some(10L)), (2L, Some(11L)), (3L, Some(12L)), (4L, None)))
  }

  test("timestamp interval OVERLAP (both sides sliding) rewrites " +
      "conf-free and matches the brute force") {
    val a = tsPoints.select($"pid", $"at".as("a_s"))
    val b = tsStarts.select($"iid", $"start".as("b_s"))
    val cond = expr("a_s < b_s + INTERVAL '2' HOUR " +
      "AND b_s < a_s + INTERVAL '1' HOUR")
    val joined = a.join(b, cond)
    val plan = physical(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("_graft_bin_l"),
      s"timestamp overlap rewrite did not fire:\n$plan")
    val manual = a.crossJoin(b).filter(cond)
    assert(pairs(joined) == pairs(manual))
    assert(pairs(joined).nonEmpty, "fixture produced no overlaps")
  }

  test("DATE bounds with a day-interval literal rewrite on the epoch-days " +
      "image (date + INTERVAL resolves to date_add, width = the day " +
      "count)") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val pts = Seq((1L, d("2024-01-05")), (2L, d("2024-02-20")),
      (3L, d("2024-06-01"))).toDF("pid", "at")
    val ivs = Seq((10L, d("2024-01-01")), (11L, d("2024-02-15")),
      (12L, d("2024-03-01"))).toDF("iid", "start")
    val cond = expr("at >= start AND at < start + INTERVAL '30' DAY")
    val joined = pts.join(ivs, cond)
    val plan = physical(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("_graft_bin"),
      s"date range join did not rewrite:\n$plan")
    val manual = pts.crossJoin(ivs).filter(cond)
    assert(pairs(joined) == pairs(manual))
    assert(pairs(joined) == Set((1L, 10L), (2L, 11L)))
    // backward forms: `- INTERVAL` folds to date_add(-n); date_sub has
    // its own node — both must infer the width
    for (c <- Seq("start BETWEEN at - INTERVAL '30' DAY AND at",
        "start BETWEEN date_sub(at, 30) AND at")) {
      val b = pts.join(ivs, expr(c))
      assert(!physical(b).contains("BroadcastNestedLoopJoin") &&
        physical(b).contains("_graft_bin"),
        s"backward date window '$c' did not rewrite:\n${physical(b)}")
      assert(pairs(b) == pairs(pts.crossJoin(ivs).filter(expr(c))))
    }
  }

  test("streaming joins are left alone: the native interval join's " +
      "time-range state pruning must not be replaced by bins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[(String, java.sql.Timestamp)]
    val rmem = MemoryStream[(String, java.sql.Timestamp)]
    val joined = graft.streaming.Streams.rangeJoinStream(
      lmem.toDF().toDF("k", "lts"), rmem.toDF().toDF("k", "rts"),
      key = "k", leftTs = "lts", rightTs = "rts", windowMs = 3600000L)
    // logical-plan check (no need to run the stream): the rewrite must
    // decline, leaving the raw time-range condition for the state manager
    val analyzed = joined.queryExecution.analyzed
    val optimized = spark.sessionState.optimizer.execute(analyzed)
    assert(!optimized.toString.contains("_graft_bin"),
      s"streaming join was binned:\n$optimized")
  }

  test("BETWEEN x - C AND x (the backward window) infers the width from " +
      "the subtraction, numeric and timestamp") {
    // numeric: w in [v - 50, v]
    val l = Seq((1L, 100L), (2L, 300L)).toDF("lid", "v")
    val r = Seq((10L, 60L), (11L, 290L), (12L, 500L)).toDF("rid", "w")
    val nCond = $"w" >= $"v" - 50L && $"w" <= $"v"
    val nJoined = l.join(r, nCond)
    val nPlan = physical(nJoined)
    assert(!nPlan.contains("BroadcastNestedLoopJoin") &&
      nPlan.contains("_graft_bin"),
      s"backward numeric window did not rewrite:\n$nPlan")
    assert(pairs2b(nJoined) == pairs2b(l.crossJoin(r).filter(nCond)))
    assert(pairs2b(nJoined) == Set((1L, 10L), (2L, 11L)))
    // timestamp: start in [at - 1h, at]
    val tl = tsPoints
    val tr = tsStarts
    val tCond = expr("start BETWEEN at - INTERVAL '1' HOUR AND at")
    val tJoined = tl.join(tr, tCond)
    val tPlan = physical(tJoined)
    assert(!tPlan.contains("BroadcastNestedLoopJoin") &&
      tPlan.contains("_graft_bin"),
      s"backward timestamp window did not rewrite:\n$tPlan")
    assert(pairs(tJoined) == pairs(tl.crossJoin(tr).filter(tCond)))
  }

  test("two-sided band BETWEEN x - C1 AND x + C2 infers width C1 + C2") {
    val l = Seq((1L, 100L), (2L, 300L)).toDF("lid", "v")
    val r = Seq((10L, 80L), (11L, 320L), (12L, 600L)).toDF("rid", "w")
    val cond = $"w" >= $"v" - 30L && $"w" < $"v" + 40L
    val joined = l.join(r, cond)
    val plan = physical(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("_graft_bin"),
      s"two-sided band did not rewrite:\n$plan")
    // width 70 = 30 + 40
    assert(plan.contains("/ 70.0"), s"expected inferred width 70 in:\n$plan")
    assert(pairs2b(joined) == pairs2b(l.crossJoin(r).filter(cond)))
    assert(pairs2b(joined) == Set((1L, 10L), (2L, 11L)))
  }

  private def pairs2b(df: DataFrame): Set[(Long, Long)] =
    df.select("lid", "rid").as[(Long, Long)].collect().toSet

  test("fractional two-sided band: the width is the exact offset " +
      "difference ceiled ONCE (per-offset ceiling understated it)") {
    // w in [v - 1.5, v - 0.2]: true length 1.3 → width 2; ceiling each
    // offset separately gives ceil(-0.2) - ceil(-1.5) = 0 - (-1) = 1,
    // which can spread an interval over 3 bins and break the documented
    // ≤2-bins-per-interval envelope
    val l = Seq((1L, 100.0), (2L, 300.0)).toDF("lid", "v")
    val r = Seq((10L, 98.9), (11L, 299.0), (12L, 600.0)).toDF("rid", "w")
    val cond = $"w" >= $"v" - 1.5 && $"w" <= $"v" - 0.2
    val joined = l.join(r, cond)
    val plan = physical(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("_graft_bin"),
      s"fractional band did not rewrite:\n$plan")
    assert(plan.contains("/ 2.0"), s"expected width ceil(1.3)=2 in:\n$plan")
    assert(pairs2b(joined) == pairs2b(l.crossJoin(r).filter(cond)))
    assert(pairs2b(joined) == Set((1L, 10L), (2L, 11L)))
  }

  test("year-month intervals decline: no fixed micros length to bin on") {
    val joined = tsPoints.join(tsStarts,
      expr("at >= start AND at < start + INTERVAL '1' MONTH"))
    val plan = physical(joined)
    assert(!plan.contains("_graft_bin"),
      s"variable-length interval must not bin:\n$plan")
    val manual = tsPoints.crossJoin(tsStarts)
      .filter(expr("at >= start AND at < start + INTERVAL '1' MONTH"))
    assert(pairs(joined) == pairs(manual))
  }

  test("null bounds and null points drop out (SQL semantics)") {
    withBinWidth(16) {
      val np = Seq((1L, Some(5L)), (5L, None)).toDF("pid", "at")
      val ni = Seq((10L, Some(0L), Some(10L)), (14L, None, Some(9L)),
        (15L, Some(0L), None)).toDF("iid", "start", "end")
      val joined = np.join(ni, $"at" >= $"start" && $"at" < $"end")
      assert(physical(joined).contains("_graft_bin"))
      assert(pairs(joined) == Set((1L, 10L)))
    }
  }

  // --- interval-OVERLAP form: both sides are intervals, one bound pair
  //     pointing each way across the join ---

  private val ovRnd = new scala.util.Random(13)
  private def ovSide(n: Int, base: Long, name: String) =
    (1 to n).map(i => (base + i, ovRnd.nextInt(400).toLong))
      .toDF(name, name.take(1) + "_s")

  test("two-sliding-window overlap rewrites conf-free, duplicate-free, " +
      "and matches the brute force") {
    val a = ovSide(120, 0, "aid")      // [a_s, a_s + 24)
    val b = ovSide(120, 1000, "bid")   // [b_s, b_s + 40)
    val joined = a.join(b,
      $"a_s" < $"b_s" + 40L && $"b_s" < $"a_s" + 24L)
    val plan = physical(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"overlap rewrite did not fire:\n$plan")
    // _graft_bin_l is the overlap form's left-side bin — its presence
    // proves the symmetric branch ran, not a degenerate containment
    assert(plan.contains("_graft_bin_l"), s"no overlap bins in:\n$plan")
    val expected = a.crossJoin(b)
      .filter($"a_s" < $"b_s" + 40L && $"b_s" < $"a_s" + 24L)
    def ids(df: DataFrame) =
      df.select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
    val got = ids(joined)
    assert(got == got.distinct, "multi-bin overlap pairs duplicated — " +
      "canonical-bin emission broken")
    assert(got == ids(expected))
    assert(got.nonEmpty, "fixture produced no overlaps — weaken it")
  }

  test("overlap of arbitrary intervals needs the conf width; without it " +
      "the plan is left alone") {
    // aid=3 is INVERTED (end < start) yet satisfies the raw predicate
    // against the wide bid=10 (10 < 25 AND 5 < 5 is false; use (12, 3, 20):
    // 10 < 20 AND 3 < 5) — the rewrite must keep such rows, matching the
    // vanilla plan it replaces (they were lost before round 8)
    val a = Seq((1L, 0L, 10L), (2L, 20L, 35L), (3L, 10L, 5L))
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 5L, 25L), (11L, 40L, 50L), (12L, 3L, 20L))
      .toDF("bid", "b_lo", "b_hi")
    val cond = $"a_lo" < $"b_hi" && $"b_lo" < $"a_hi"
    val naive = a.join(b, cond)
    assert(physical(naive).contains("BroadcastNestedLoopJoin"),
      "no inferable width and no conf: the rule must decline")
    val vanilla = pairs2(naive)
    assert(vanilla.contains((3L, 12L)),
      "fixture must exercise an inverted-interval match")
    withBinWidth(16) {
      val joined = a.join(b, cond)
      val plan = physical(joined)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        plan.contains("_graft_bin_l"),
        s"conf-width overlap rewrite did not fire:\n$plan")
      assert(pairs2(joined) == vanilla)
    }
  }

  private def pairs2(df: DataFrame): Set[(Long, Long)] =
    df.select("aid", "bid").as[(Long, Long)].collect().toSet

  test("raw overlap SQL through the extension point gets the rewrite") {
    ovSide(80, 0, "aid").createOrReplaceTempView("ov_a")
    ovSide(80, 1000, "bid").createOrReplaceTempView("ov_b")
    val joined = spark.sql(
      """SELECT aid, bid FROM ov_a a JOIN ov_b b
        |ON a.a_s < b.b_s + 40 AND b.b_s < a.a_s + 24""".stripMargin)
    val plan = physical(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("_graft_bin_l"),
      s"SQL overlap rewrite did not fire:\n$plan")
    val manual = spark.table("ov_a").crossJoin(spark.table("ov_b"))
      .filter($"a_s" < $"b_s" + 40L && $"b_s" < $"a_s" + 24L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(joined.as[(Long, Long)].collect().toSet == manual)
  }

  test("AQE on (the production default): every rewrite branch fires and " +
      "no nested-loop join survives into the FINAL adaptive plan") {
    // PlanShapeSpec's shuffle-shape pins force AQE off (static planning);
    // this pin covers the configuration every real run uses — the rule
    // runs before AQE re-plans, so its bins must survive runtime
    // re-optimization, and the executed (isFinalPlan=true) plan must not
    // have fallen back to a nested loop
    val saved = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      def finalPlan(df: DataFrame): String = {
        df.collect() // finalize the adaptive plan before reading it
        val p = physical(df)
        assert(p.contains("isFinalPlan=true"),
          s"expected an executed adaptive plan:\n$p")
        p
      }
      def assertBinned(p: String, branch: String): Unit = {
        assert(!p.contains("BroadcastNestedLoopJoin") &&
          !p.contains("CartesianProduct"),
          s"$branch fell back to a nested loop under AQE:\n$p")
        assert(p.contains("_graft_bin"), s"$branch bins lost under AQE:\n$p")
      }
      withBinWidth(16) { // containment, conf width (the q57/q67 shape)
        val c = points.join(intervals, $"at" >= $"start" && $"at" < $"end")
        assert(pairs(c) == expected)
        assertBinned(finalPlan(c), "containment")
      }
      // 2-D inferred widths (the q68 shape)
      val pts2 = Seq((1L, 5L, 100L), (3L, 25L, 300L)).toDF("pid", "at", "v")
      val ivs2 = Seq((10L, 0L, 95L), (12L, 20L, 290L)).toDF("iid", "s1", "s2")
      val d2 = pts2.join(ivs2, $"at" >= $"s1" && $"at" < $"s1" + 20L &&
        $"v" >= $"s2" && $"v" < $"s2" + 30L)
      val d2p = finalPlan(d2)
      assertBinned(d2p, "2-D containment")
      assert(d2p.contains("_graft_bin2"), s"second dimension lost:\n$d2p")
      // symmetric overlap, inferred width (the q70 shape)
      val a = ovSide(40, 0, "aid")
      val b = ovSide(40, 1000, "bid")
      val ov = a.join(b, $"a_s" < $"b_s" + 40L && $"b_s" < $"a_s" + 24L)
      val ovp = finalPlan(ov)
      assertBinned(ovp, "overlap")
      assert(ovp.contains("_graft_bin_l"), s"overlap bins lost:\n$ovp")
      withBinWidth(16) { // left-outer containment (the q74 shape)
        val lo = points.join(intervals,
          $"at" >= $"start" && $"at" < $"end", "left_outer")
        val lop = finalPlan(lo)
        assertBinned(lop, "left-outer containment")
        // unmatched pid 3 must still null-extend under the adaptive plan
        assert(lo.collect().exists(r => r.getLong(0) == 3L && r.isNullAt(2)),
          "left-outer null row lost under AQE")
      }
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  // --- non-inner join types: the containment rewrite fires when the
  //     point is on the preserved side (which is never exploded), and
  //     declines when the preserved side would have to explode ---

  /** Vanilla result with the rule disabled — the semantics the rewrite
    * must reproduce row-for-row, nulls and multiplicity included.
    */
  private def vanillaRows(build: => DataFrame): Set[Seq[Any]] = {
    spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
    try build.collect().map(_.toSeq).toSet
    finally spark.conf.unset(RangeJoinRewrite.EnabledKey)
  }

  test("LEFT OUTER containment (point on the left) rewrites: unmatched " +
      "and null points keep their null rows, no nested loop") {
    withBinWidth(16) {
      // pid 3 matches nothing; pid 5 has a null point — both must emit
      // exactly once with null interval columns
      val np = Seq((1L, Some(5L)), (2L, Some(15L)), (3L, Some(29L)),
        (4L, Some(250L)), (5L, Option.empty[Long])).toDF("pid", "at")
      def build = np.join(intervals,
        $"at" >= $"start" && $"at" < $"end", "left_outer")
      val expectedRows = vanillaRows(build)
      val joined = build
      val plan = physical(joined)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"left-outer rewrite did not fire:\n$plan")
      assert(plan.contains("_graft_bin"), s"no bin key in:\n$plan")
      val got = joined.collect().map(_.toSeq).toSet
      assert(got == expectedRows)
      assert(got.exists(r => r.head == 3L && r.last == null),
        "unmatched left row lost its null row")
      assert(got.exists(r => r.head == 5L && r.last == null),
        "null-point left row lost its null row")
    }
  }

  test("LEFT OUTER with the point on the RIGHT declines: rewriting would " +
      "explode the preserved side") {
    withBinWidth(16) {
      def build = intervals.join(points,
        $"at" >= $"start" && $"at" < $"end", "left_outer")
      val expectedRows = vanillaRows(build)
      val joined = build
      val plan = physical(joined)
      assert(!plan.contains("_graft_bin"),
        s"must not explode a preserved side:\n$plan")
      assert(joined.collect().map(_.toSeq).toSet == expectedRows)
    }
  }

  test("RIGHT OUTER containment (point on the right) rewrites and keeps " +
      "unmatched point rows") {
    withBinWidth(16) {
      val np = Seq((1L, 5L), (2L, 15L), (3L, 29L), (4L, 250L))
        .toDF("pid", "at")
      def build = intervals.join(np,
        $"at" >= $"start" && $"at" < $"end", "right_outer")
      val expectedRows = vanillaRows(build)
      val joined = build
      val plan = physical(joined)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        plan.contains("_graft_bin"),
        s"right-outer rewrite did not fire:\n$plan")
      val got = joined.collect().map(_.toSeq).toSet
      assert(got == expectedRows)
      assert(got.exists(r => r.head == null && r.contains(3L)),
        "unmatched right point lost its null row")
    }
  }

  test("LEFT SEMI and LEFT ANTI containment rewrite and partition the " +
      "point set exactly") {
    withBinWidth(16) {
      val np = Seq((1L, 5L), (2L, 15L), (3L, 29L), (4L, 250L))
        .toDF("pid", "at")
      val semi = np.join(intervals,
        $"at" >= $"start" && $"at" < $"end", "left_semi")
      val anti = np.join(intervals,
        $"at" >= $"start" && $"at" < $"end", "left_anti")
      for ((df, kind) <- Seq((semi, "semi"), (anti, "anti"))) {
        val plan = physical(df)
        assert(!plan.contains("BroadcastNestedLoopJoin") &&
          plan.contains("_graft_bin"),
          s"$kind rewrite did not fire:\n$plan")
      }
      val semiIds = semi.select("pid").as[Long].collect().toSet
      val antiIds = anti.select("pid").as[Long].collect().toSet
      assert(semiIds == Set(1L, 2L, 4L))
      assert(antiIds == Set(3L))
      // bin-copy multiplicity must not leak into semi output
      assert(semi.count() == 3L, "semi join duplicated a matched row")
    }
  }

  test("EXISTS / NOT EXISTS range subqueries get the binned semi/anti " +
      "plan") {
    // RewritePredicateSubquery turns these into LeftSemi/LeftAnti joins in
    // a batch AFTER the extension-injected operator-optimization rules, so
    // the spark.sql.extensions path alone never sees them; GraftSession
    // also registers the rule via experimental.extraOptimizations (the
    // User Provided Optimizers batch, which runs last) to catch them
    points.createOrReplaceTempView("rr_ex_points")
    intervals.select($"iid", $"start").createOrReplaceTempView("rr_ex_starts")
    val exists = spark.sql(
      """SELECT pid FROM rr_ex_points p WHERE EXISTS (
        |  SELECT 1 FROM rr_ex_starts i
        |  WHERE p.at >= i.start AND p.at < i.start + 20)""".stripMargin)
    val notExists = spark.sql(
      """SELECT pid FROM rr_ex_points p WHERE NOT EXISTS (
        |  SELECT 1 FROM rr_ex_starts i
        |  WHERE p.at >= i.start AND p.at < i.start + 20)""".stripMargin)
    for ((df, kind) <- Seq((exists, "EXISTS"), (notExists, "NOT EXISTS"))) {
      val plan = physical(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        plan.contains("_graft_bin"),
        s"$kind range subquery kept a nested-loop plan:\n$plan")
    }
    // semantics vs the brute-force membership sets
    val contained = points.crossJoin(intervals.select($"start"))
      .filter($"at" >= $"start" && $"at" < $"start" + 20L)
      .select("pid").as[Long].collect().toSet
    assert(exists.as[Long].collect().toSet == contained)
    assert(notExists.as[Long].collect().toSet ==
      points.select("pid").as[Long].collect().toSet -- contained)
  }

  test("a fresh extensions-only session gets the late-batch registration " +
      "(EXISTS range subqueries bin without GraftSession's explicit hook)") {
    // newSession() starts with EMPTY ExperimentalMethods and a fresh
    // sessionState built from the spark.sql.extensions conf alone — the
    // deployment shape of a cluster user who only sets the conf. The
    // injected optimizer-rule builder must perform the late registration
    // itself when the optimizer is assembled.
    val fresh = spark.newSession()
    import fresh.implicits._
    val np = Seq((1L, 5L), (3L, 29L)).toDF("pid", "at")
    val ns = Seq((10L, 0L)).toDF("iid", "start")
    np.createOrReplaceTempView("fr_points")
    ns.createOrReplaceTempView("fr_starts")
    val exists = fresh.sql(
      """SELECT pid FROM fr_points p WHERE EXISTS (
        |  SELECT 1 FROM fr_starts i
        |  WHERE p.at >= i.start AND p.at < i.start + 20)""".stripMargin)
    val plan = exists.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("_graft_bin"),
      s"extensions-only session missed the late registration:\n$plan")
    assert(exists.as[Long].collect().toSet == Set(1L))
  }

  test("outer OVERLAP joins are left alone: both sides would explode") {
    withBinWidth(16) {
      val a = Seq((1L, 0L, 10L), (2L, 20L, 35L)).toDF("aid", "a_lo", "a_hi")
      val b = Seq((10L, 5L, 25L), (11L, 40L, 50L)).toDF("bid", "b_lo", "b_hi")
      def build = a.join(b,
        $"a_lo" < $"b_hi" && $"b_lo" < $"a_hi", "left_outer")
      val expectedRows = vanillaRows(build)
      val joined = build
      assert(!physical(joined).contains("_graft_bin"),
        s"outer overlap must not rewrite:\n${physical(joined)}")
      assert(joined.collect().map(_.toSeq).toSet == expectedRows)
    }
  }

  // --- RANGE_BIN hint: statement-scoped bin width (the per-join
  //     alternative to the session-global conf) ---

  test("RANGE_BIN hint rewrites with NO conf set, in both placements: " +
      "above the join and on a join input") {
    val above = points.join(intervals, $"at" >= $"start" && $"at" < $"end")
      .hint("range_bin", 16)
    val abovePlan = physical(above)
    assert(!abovePlan.contains("BroadcastNestedLoopJoin") &&
      abovePlan.contains("_graft_bin"),
      s"hint above the join did not fire:\n$abovePlan")
    assert(abovePlan.contains("/ 16.0"), s"hint width lost in:\n$abovePlan")
    assert(pairs(above) == expected)
    // broadcast-hint idiom: the width must bubble up to the consuming join
    val input = points.hint("range_bin", 16)
      .join(intervals, $"at" >= $"start" && $"at" < $"end")
    val inputPlan = physical(input)
    assert(!inputPlan.contains("BroadcastNestedLoopJoin") &&
      inputPlan.contains("/ 16.0"),
      s"hint on a join input did not fire:\n$inputPlan")
    assert(pairs(input) == expected)
  }

  test("two hinted joins in one session carry two different widths; an " +
      "unhinted twin still plans vanilla — the width does not leak") {
    val cond = $"at" >= $"start" && $"at" < $"end"
    val a = points.join(intervals, cond).hint("range_bin", 16)
    val b = points.join(intervals, cond).hint("range_bin", 32)
    assert(physical(a).contains("/ 16.0"), physical(a))
    assert(physical(b).contains("/ 32.0"), physical(b))
    assert(pairs(a) == expected && pairs(b) == expected)
    val unhinted = points.join(intervals, cond)
    assert(physical(unhinted).contains("BroadcastNestedLoopJoin"),
      "a hint must scope to its own statement, not the session")
  }

  test("RANGE_BIN hint beats the session conf width") {
    withBinWidth(999983) { // deliberately wrong unit for this join
      val joined = points.join(intervals,
        $"at" >= $"start" && $"at" < $"end").hint("range_bin", 16)
      assert(physical(joined).contains("/ 16.0"),
        s"conf width must lose to the hint:\n${physical(joined)}")
      assert(pairs(joined) == expected)
    }
  }

  test("SQL /*+ RANGE_BIN(w) */ reaches the rewrite through the " +
      "extension point") {
    points.createOrReplaceTempView("rb_points")
    intervals.createOrReplaceTempView("rb_intervals")
    val joined = spark.sql(
      """SELECT /*+ RANGE_BIN(16) */ pid, iid FROM rb_points p
        |JOIN rb_intervals i ON p.at >= i.start AND p.at < i.end"""
        .stripMargin)
    val plan = physical(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("/ 16.0"), s"SQL hint did not fire:\n$plan")
    assert(joined.as[(Long, Long)].collect().toSet == expected)
  }

  test("RANGE_BIN makes raw timestamp bounds binnable (width in epoch " +
      "micros) where the conf path must decline") {
    val pts = Seq((1L, ts("2024-01-01 10:00:05")),
      (2L, ts("2024-01-01 12:00:00"))).toDF("pid", "at")
    val ivs = Seq(
      (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iid", "start", "end")
    val cond = $"at" >= $"start" && $"at" < $"end"
    // conf path: declined (arbitrary [start, end) timestamps, unit unknown)
    withBinWidth(16) {
      assert(!physical(pts.join(ivs, cond)).contains("_graft_bin"))
    }
    // hint path: the user names the join, the doc names the unit
    val joined = pts.join(ivs, cond).hint("range_bin", 3600L * 1000000)
    val plan = physical(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("_graft_bin"),
      s"hinted timestamp containment did not fire:\n$plan")
    assert(pairs(joined) == Set((1L, 10L)))
  }

  test("a fresh extensions-only session resolves the RANGE_BIN hint " +
      "(conf-only deployments get the analyzer rule too)") {
    val fresh = spark.newSession()
    import fresh.implicits._
    val np = Seq((1L, 5L), (2L, 250L)).toDF("pid", "at")
    val ni = Seq((10L, 0L, 10L)).toDF("iid", "start", "end")
    np.createOrReplaceTempView("fh_points")
    ni.createOrReplaceTempView("fh_intervals")
    val joined = fresh.sql(
      """SELECT /*+ RANGE_BIN(16) */ pid, iid FROM fh_points p
        |JOIN fh_intervals i ON p.at >= i.start AND p.at < i.end"""
        .stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("/ 16.0"),
      s"fresh session dropped the hint:\n$plan")
    assert(joined.as[(Long, Long)].collect().toSet == Set((1L, 10L)))
  }

  test("RANGE_BIN hint reaches EXISTS/IN-born semi/anti joins with NO " +
      "conf set, in both placements: inside the subquery and on the " +
      "outer query") {
    // RewriteSubquery creates these joins AFTER the early optimizer pass
    // consumed DataFrame-side markers; the width must survive to the
    // late (extraOptimizations) pass. Raw [start, end) columns carry no
    // inferable width, so with no conf the ONLY way these can bin is the
    // hint actually arriving.
    points.createOrReplaceTempView("hx_points")
    intervals.createOrReplaceTempView("hx_intervals")
    val inner = spark.sql(
      """SELECT pid FROM hx_points p WHERE EXISTS (
        |  SELECT /*+ RANGE_BIN(16) */ 1 FROM hx_intervals i
        |  WHERE p.at >= i.start AND p.at < i.end)""".stripMargin)
    val outer = spark.sql(
      """SELECT /*+ RANGE_BIN(16) */ pid FROM hx_points p WHERE EXISTS (
        |  SELECT 1 FROM hx_intervals i
        |  WHERE p.at >= i.start AND p.at < i.end)""".stripMargin)
    val outerAnti = spark.sql(
      """SELECT /*+ RANGE_BIN(16) */ pid FROM hx_points p WHERE NOT EXISTS (
        |  SELECT 1 FROM hx_intervals i
        |  WHERE p.at >= i.start AND p.at < i.end)""".stripMargin)
    val containedIds = Set(1L, 2L, 4L) // pids inside some [start, end)
    for ((df, kind) <- Seq((inner, "subquery-hint EXISTS"),
        (outer, "outer-hint EXISTS"))) {
      val plan = physical(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        plan.contains("/ 16.0"),
        s"$kind lost the hint width:\n$plan")
      assert(df.as[Long].collect().toSet == containedIds, kind)
    }
    val antiPlan = physical(outerAnti)
    assert(!antiPlan.contains("BroadcastNestedLoopJoin") &&
      antiPlan.contains("/ 16.0"),
      s"outer-hint NOT EXISTS lost the hint width:\n$antiPlan")
    assert(outerAnti.as[Long].collect().toSet == Set(3L))
    // statement scoping must survive the longer marker lifetime: an
    // unhinted twin right after still plans vanilla
    val unhinted = spark.sql(
      """SELECT pid FROM hx_points p WHERE EXISTS (
        |  SELECT 1 FROM hx_intervals i
        |  WHERE p.at >= i.start AND p.at < i.end)""".stripMargin)
    assert(physical(unhinted).contains("BroadcastNestedLoopJoin"),
      "hint width leaked past its own statement")
  }

  test("two hoistable subqueries with DIFFERENT RANGE_BIN widths: the " +
      "first width wins for the whole operator (warned, not silently " +
      "re-ordered), both born joins bin, nothing crashes") {
    // the hoist target carries ONE marker; ResolveRangeBinHint keeps the
    // first subquery's width and logs the discarded second — both
    // EXISTS-born joins must still bin (with the surviving width), and
    // the rows must match the vanilla semantics
    points.createOrReplaceTempView("hw_points")
    intervals.createOrReplaceTempView("hw_intervals")
    val two = spark.sql(
      """SELECT pid FROM hw_points p
        |WHERE EXISTS (
        |  SELECT /*+ RANGE_BIN(16) */ 1 FROM hw_intervals i
        |  WHERE p.at >= i.start AND p.at < i.end)
        |AND EXISTS (
        |  SELECT /*+ RANGE_BIN(32) */ 1 FROM hw_intervals j
        |  WHERE p.at >= j.start AND p.at < j.end)""".stripMargin)
    val plan = physical(two)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"a hoisted width was lost, a join kept the nested-loop plan:\n$plan")
    assert(plan.contains("/ 16.0") && !plan.contains("/ 32.0"),
      s"expected the FIRST width (16) to bin every born join:\n$plan")
    assert(two.as[Long].collect().toSet == Set(1L, 2L, 4L))
  }

  test("RANGE_BIN hint reaches an IN range subquery") {
    points.createOrReplaceTempView("hi_points")
    intervals.createOrReplaceTempView("hi_intervals")
    val in = spark.sql(
      """SELECT /*+ RANGE_BIN(16) */ pid FROM hx_points p WHERE pid IN (
        |  SELECT iid - 9 FROM hx_intervals i
        |  WHERE p.at >= i.start AND p.at < i.end)""".stripMargin)
    val plan = physical(in)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("/ 16.0"),
      s"IN range subquery lost the hint width:\n$plan")
    // pid IN {iid - 9 of containing intervals}: 1∈{1}, 2∈{2}, 4∉{3}
    assert(in.as[Long].collect().toSet == Set(1L, 2L))
  }

  test("a RANGE_BIN hint inside a single-reference CTE body reaches the " +
      "join that consumes the CTE") {
    // CTE inlining (analysis) plants the marker on the join input, where
    // the bubble-up path consumes it — the common "hint the dimension
    // table's CTE" idiom
    points.createOrReplaceTempView("cte_points")
    intervals.createOrReplaceTempView("cte_intervals")
    val joined = spark.sql(
      """WITH iv AS (SELECT /*+ RANGE_BIN(16) */ * FROM cte_intervals)
        |SELECT pid, iid FROM cte_points p
        |JOIN iv i ON p.at >= i.start AND p.at < i.end""".stripMargin)
    val plan = physical(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("/ 16.0"), s"CTE-body hint did not fire:\n$plan")
    assert(joined.as[(Long, Long)].collect().toSet == expected)
  }

  test("disjunctive EXISTS (OR with another predicate) bears an " +
      "ExistenceJoin — the containment rewrite bins it too") {
    // `flag OR EXISTS(...)` cannot become a semi join (rows failing the
    // subquery must survive when the other disjunct holds), so
    // RewriteSubquery emits an ExistenceJoin; left rows are preserved
    // exactly once with a boolean, making the binned right side safe
    points.createOrReplaceTempView("dx_points")
    intervals.select($"iid", $"start").createOrReplaceTempView("dx_starts")
    intervals.createOrReplaceTempView("dx_intervals")
    val inferred = spark.sql(
      """SELECT pid FROM dx_points p
        |WHERE p.pid = 3 OR EXISTS (
        |  SELECT 1 FROM dx_starts i
        |  WHERE p.at >= i.start AND p.at < i.start + 20)""".stripMargin)
    val plan = physical(inferred)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("_graft_bin"),
      s"disjunctive EXISTS kept a nested-loop plan:\n$plan")
    // brute force: pids in some [start, start+20) window, plus pid 3
    val contained = points.crossJoin(intervals.select($"start"))
      .filter($"at" >= $"start" && $"at" < $"start" + 20L)
      .select("pid").as[Long].collect().toSet
    assert(inferred.as[Long].collect().toSet == (contained + 3L))
    // raw [start, end) bounds: width only from the statement's hint
    val hinted = spark.sql(
      """SELECT /*+ RANGE_BIN(16) */ pid FROM dx_points p
        |WHERE p.pid = 3 OR EXISTS (
        |  SELECT 1 FROM dx_intervals i
        |  WHERE p.at >= i.start AND p.at < i.end)""".stripMargin)
    val hintedPlan = physical(hinted)
    assert(!hintedPlan.contains("BroadcastNestedLoopJoin") &&
      hintedPlan.contains("/ 16.0"),
      s"hinted disjunctive EXISTS lost the width:\n$hintedPlan")
    assert(hinted.as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }

  test("an UNCORRELATED scalar subquery keeps its internal RANGE_BIN " +
      "hint: the join inside the subquery body bins during its own " +
      "optimization") {
    // hoisting applies to EXISTS/IN (joins born OUTSIDE the subplan) and
    // correlated subqueries (analysis legality); an uncorrelated scalar
    // subquery's joins live INSIDE the subplan, where OptimizeSubqueries
    // runs this rule standalone — the marker must stay there and work
    points.createOrReplaceTempView("us_points")
    intervals.createOrReplaceTempView("us_intervals")
    val df = spark.sql(
      """SELECT (
        |  SELECT /*+ RANGE_BIN(16) */ count(*) FROM us_points p
        |  JOIN us_intervals i ON p.at >= i.start AND p.at < i.end
        |) AS n""".stripMargin)
    val plan = physical(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("/ 16.0"),
      s"scalar-subquery-internal hint lost:\n$plan")
    assert(df.as[Long].collect().toSeq == Seq(3L)) // the 3 contained pairs
  }

  test("a RANGE_BIN hint inside a CORRELATED scalar subquery analyzes " +
      "cleanly (hoisted out of the outer-reference whitelist's way) and " +
      "keeps correct rows") {
    // before hoisting, the marker above the correlated filter tripped
    // ValidateSubqueryExpression's ACCESSING_OUTER_QUERY_COLUMN error —
    // an analysis crash on a valid query. The hint itself is best-effort
    // here (correlated scalar joins are born in RewriteSubquery's scalar
    // branch, outside this rule's scope); the pin is: no crash, right
    // answers.
    points.createOrReplaceTempView("sc_points")
    intervals.createOrReplaceTempView("sc_intervals")
    val df = spark.sql(
      """SELECT pid, (
        |  SELECT /*+ RANGE_BIN(16) */ max(iid) FROM sc_intervals i
        |  WHERE p.at >= i.start AND p.at < i.end) AS best
        |FROM sc_points p""".stripMargin)
    val got = df.as[(Long, Option[Long])].collect().toSet
    assert(got == Set((1L, Some(10L)), (2L, Some(11L)), (3L, None),
      (4L, Some(12L))), s"wrong rows: $got")
  }

  test("a RANGE_BIN hint with the rule DISABLED is stripped cleanly: " +
      "vanilla plan, correct rows, no marker reaching the planner") {
    spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
    try {
      val joined = points.hint("range_bin", 16)
        .join(intervals, $"at" >= $"start" && $"at" < $"end")
      val plan = physical(joined) // would throw if the marker survived
      assert(!plan.contains("_graft_bin"),
        s"disabled rule must not bin:\n$plan")
      assert(pairs(joined) == expected)
    } finally spark.conf.unset(RangeJoinRewrite.EnabledKey)
  }

  test("malformed RANGE_BIN hints fail loudly at analysis") {
    for (bad <- Seq(Seq(0), Seq(-5), Seq("1h"), Seq(1, 2), Seq.empty[Any])) {
      val e = intercept[Throwable] {
        points.hint("range_bin", bad: _*)
          .join(intervals, $"at" >= $"start" && $"at" < $"end")
          .queryExecution.executedPlan
      }
      val messages = Iterator.iterate(e)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(messages.contains("RANGE_BIN"), s"for $bad: $messages")
    }
  }

  test("containment keeps priority over the overlap reading of the same " +
      "condition") {
    // a containment condition also parses as a degenerate overlap; the
    // cheaper one-exploding-side containment plan must win
    val starts = intervals.select($"iid", $"start")
    val joined = points.join(starts,
      $"at" >= $"start" && $"at" < $"start" + 20L)
    val plan = physical(joined)
    assert(plan.contains("_graft_bin"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("_graft_bin_l"),
      s"containment must not take the two-sided overlap plan:\n$plan")
  }
}
