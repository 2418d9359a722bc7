package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRewrite

/** Differential fuzz for [[RangeJoinRewrite]]: the rule rewrites queries
  * the user wrote as plain SQL, so its one correctness contract is
  * "row-for-row identical to vanilla Spark" — across bound strictness,
  * point orientation, join types, extra equi keys, nulls, and inverted
  * intervals, with every width source. Deterministic seeded scenarios;
  * each compares the rewritten result against the same query with the
  * rule disabled (multisets, not sets — outer multiplicity matters).
  *
  * This complements the per-branch pins in RangeJoinRewriteSpec with
  * breadth: an optimizer rule's failure mode is the shape nobody wrote a
  * deliberate test for.
  */
class RangeJoinFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def vanillaRows(build: => DataFrame): Seq[Seq[Any]] = {
    spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
    try build.collect().map(_.toSeq).toSeq
    finally spark.conf.unset(RangeJoinRewrite.EnabledKey)
  }

  private def sortedRows(rows: Seq[Seq[Any]]): Seq[String] =
    rows.map(_.map(String.valueOf).mkString("|")).sorted

  private def withBinWidth[A](w: Long)(body: => A): A = {
    spark.conf.set(RangeJoinRewrite.BinWidthKey, w.toString)
    try body finally spark.conf.unset(RangeJoinRewrite.BinWidthKey)
  }

  test("containment: 40 random (strictness × orientation × join type × " +
      "keys × nulls) scenarios match vanilla row-for-row") {
    val rnd = new scala.util.Random(2024)
    (1 to 40).foreach { i =>
      val n = 40 + rnd.nextInt(60)
      val pts = (1 to n).map { j =>
        (j.toLong, rnd.nextInt(3).toLong,
          if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(400).toLong))
      }.toDF("pid", "k", "at")
      val ivs = (1 to n).map { j =>
        val s = rnd.nextInt(400).toLong
        (1000L + j, rnd.nextInt(3).toLong,
          if (rnd.nextInt(12) == 0) None else Some(s),
          if (rnd.nextInt(12) == 0) None
          else Some(s + rnd.nextInt(120) - 20L)) // some inverted
      }.toDF("iid", "k2", "lo", "hi")
      val lower =
        if (rnd.nextBoolean()) $"at" >= $"lo" else $"at" > $"lo"
      val upper =
        if (rnd.nextBoolean()) $"at" < $"hi" else $"at" <= $"hi"
      val withKey = rnd.nextBoolean()
      val base = lower && upper
      val cond = if (withKey) $"k" === $"k2" && base else base
      // join types whose preserved side is the point side (or inner);
      // the rule must rewrite OR decline — either way rows must match
      val (l, r, joinType) = rnd.nextInt(5) match {
        case 0 => (pts, ivs, "inner")
        case 1 => (pts, ivs, "left_outer")
        case 2 => (ivs, pts, "right_outer")
        case 3 => (pts, ivs, "left_semi")
        case _ => (pts, ivs, "left_anti")
      }
      val width = 1L + rnd.nextInt(200)
      withBinWidth(width) {
        def build = l.join(r, cond, joinType)
        val got = sortedRows(build.collect().map(_.toSeq).toSeq)
        val expected = sortedRows(vanillaRows(build))
        assert(got == expected,
          s"scenario $i diverged (type=$joinType key=$withKey " +
            s"width=$width lower=$lower upper=$upper)")
      }
    }
  }

  test("overlap: 25 random scenarios (strictness × widths × keys × " +
      "inverted × nulls) match vanilla row-for-row") {
    val rnd = new scala.util.Random(4048)
    (1 to 25).foreach { i =>
      val n = 40 + rnd.nextInt(40)
      def side(idBase: Long, kc: String, lo: String, hi: String) =
        (1 to n).map { j =>
          val s = rnd.nextInt(300).toLong
          (idBase + j, rnd.nextInt(3).toLong,
            if (rnd.nextInt(12) == 0) None else Some(s),
            if (rnd.nextInt(12) == 0) None
            else Some(s + rnd.nextInt(100) - 25L))
        }.toDF("id" + idBase, kc, lo, hi)
      val a = side(0, "ka", "a_lo", "a_hi")
      val b = side(1000, "kb", "b_lo", "b_hi")
      val c1 = if (rnd.nextBoolean()) $"a_lo" < $"b_hi" else $"a_lo" <= $"b_hi"
      val c2 = if (rnd.nextBoolean()) $"b_lo" < $"a_hi" else $"b_lo" <= $"a_hi"
      val cond =
        if (rnd.nextBoolean()) $"ka" === $"kb" && c1 && c2 else c1 && c2
      val width = 1L + rnd.nextInt(150)
      withBinWidth(width) {
        def build = a.join(b, cond)
        val got = sortedRows(build.collect().map(_.toSeq).toSeq)
        val expected = sortedRows(vanillaRows(build))
        assert(got == expected, s"overlap scenario $i diverged " +
          s"(width=$width c1=$c1 c2=$c2)")
      }
    }
  }

  test("2-D containment: 22 random (two windows / window + band / " +
      "shared-conjunct) scenarios match vanilla row-for-row, and the " +
      "two-key plan actually fires") {
    // breadth for the secondary-dimension selection logic: same point
    // side, distinct point expression, no shared conjunct, own inferable
    // width. Scenarios deliberately include shapes where the second
    // dimension must DECLINE (raw band with no literal, shared bound
    // column) — parity must hold whether the 2-D plan fires or not.
    val rnd = new scala.util.Random(9311)
    var twoKeyPlans = 0
    (1 to 22).foreach { i =>
      val n = 40 + rnd.nextInt(50)
      def opt(v: Long): Option[Long] =
        if (rnd.nextInt(12) == 0) None else Some(v)
      val pts = (1 to n).map { j =>
        (j.toLong, rnd.nextInt(3).toLong, opt(rnd.nextInt(400).toLong),
          opt(rnd.nextInt(200).toLong))
      }.toDF("pid", "k", "at", "v")
      val ivs = (1 to n).map { j =>
        val lo = rnd.nextInt(400).toLong
        (1000L + j, rnd.nextInt(3).toLong, opt(lo),
          opt(lo + rnd.nextInt(120) - 20L), // raw hi, some inverted
          opt(rnd.nextInt(200).toLong))
      }.toDF("iid", "k2", "lo", "hi", "vlo")
      val c1 = 1L + rnd.nextInt(60)
      val c2 = 1L + rnd.nextInt(40)
      // dimension 1: always a sliding window on `at` (inferable)
      val lower1 = if (rnd.nextBoolean()) $"at" >= $"lo" else $"at" > $"lo"
      val upper1 =
        if (rnd.nextBoolean()) $"at" < $"lo" + c1 else $"at" <= $"lo" + c1
      // dimension 2 on `v`: sliding window, backward BETWEEN, a raw band
      // (must stay residual — no literal), or a shared-column bound that
      // reuses dim 1's `lo` (the shared-conjunct exclusion's territory)
      val dim2 = rnd.nextInt(4) match {
        case 0 =>
          val lo2 = if (rnd.nextBoolean()) $"v" >= $"vlo" else $"v" > $"vlo"
          val up2 = if (rnd.nextBoolean()) $"v" < $"vlo" + c2
            else $"v" <= $"vlo" + c2
          lo2 && up2
        case 1 => $"v".between($"vlo" - c2, $"vlo")
        case 2 => $"v" >= $"vlo" && $"v" < $"hi" // raw: no inferable width
        case _ => $"v" >= $"lo" && $"v" < $"vlo" + c2 // shares dim-1's lo
      }
      val base = lower1 && upper1 && dim2
      val withKey = rnd.nextBoolean()
      val cond = if (withKey) $"k" === $"k2" && base else base
      val (l, r, joinType) = rnd.nextInt(5) match {
        case 0 => (pts, ivs, "inner")
        case 1 => (pts, ivs, "left_outer")
        case 2 => (ivs, pts, "right_outer")
        case 3 => (pts, ivs, "left_semi")
        case _ => (pts, ivs, "left_anti")
      }
      def build = l.join(r, cond, joinType)
      if (build.queryExecution.executedPlan.toString.contains("_graft_bin2"))
        twoKeyPlans += 1
      val got = sortedRows(build.collect().map(_.toSeq).toSeq)
      val expected = sortedRows(vanillaRows(build))
      assert(got == expected,
        s"2-D scenario $i diverged (type=$joinType key=$withKey " +
          s"c1=$c1 c2=$c2)")
    }
    // the fuzz is worthless if every scenario declined into 1-D
    assert(twoKeyPlans >= 5,
      s"only $twoKeyPlans of 22 scenarios produced a two-bin-key plan")
  }

  test("disjunctive EXISTS (ExistenceJoin): 10 random scenarios match " +
      "vanilla row-for-row — existence multiplicity survives binning") {
    // `other OR EXISTS(range)` bears an ExistenceJoin; the rewrite bins
    // its right side, and the one failure mode a pin can miss is
    // multiplicity (a left row duplicated per matching bin copy) — the
    // differential compare is a multiset, so any duplication diverges
    val rnd = new scala.util.Random(5150)
    (1 to 10).foreach { i =>
      val n = 30 + rnd.nextInt(40)
      val pts = (1 to n).map { j =>
        (j.toLong, rnd.nextInt(3).toLong,
          if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(300).toLong))
      }.toDF("pid", "k", "at")
      val ivs = (1 to n).map { j =>
        val s = rnd.nextInt(300).toLong
        (1000L + j, rnd.nextInt(3).toLong,
          if (rnd.nextInt(12) == 0) None else Some(s),
          if (rnd.nextInt(12) == 0) None
          else Some(s + rnd.nextInt(90) - 15L)) // some inverted
      }.toDF("iid", "k2", "lo", "hi")
      pts.createOrReplaceTempView(s"fz_ex_p")
      ivs.createOrReplaceTempView(s"fz_ex_i")
      val lower = if (rnd.nextBoolean()) ">=" else ">"
      val upper = if (rnd.nextBoolean()) "<" else "<="
      val keyEq = if (rnd.nextBoolean()) "AND p.k = i.k2" else ""
      val m = 2 + rnd.nextInt(5)
      val width = 1L + rnd.nextInt(120)
      withBinWidth(width) {
        def build = spark.sql(
          s"""SELECT pid FROM fz_ex_p p
             |WHERE p.pid % $m = 0 OR EXISTS (
             |  SELECT 1 FROM fz_ex_i i
             |  WHERE p.at $lower i.lo AND p.at $upper i.hi $keyEq)"""
            .stripMargin)
        val got = sortedRows(build.collect().map(_.toSeq).toSeq)
        val expected = sortedRows(vanillaRows(build))
        assert(got == expected,
          s"existence scenario $i diverged (m=$m width=$width " +
            s"$lower/$upper key='$keyEq')")
      }
    }
  }

  test("width independence: any positive width (conf or hint) yields " +
      "identical results — bins are a superset at every width") {
    val rnd = new scala.util.Random(77)
    val pts = (1 to 80).map(j => (j.toLong, rnd.nextInt(500).toLong))
      .toDF("pid", "at")
    val ivs = (1 to 80).map { j =>
      val s = rnd.nextInt(500).toLong
      (1000L + j, s, s + rnd.nextInt(90).toLong)
    }.toDF("iid", "lo", "hi")
    def build = pts.join(ivs, $"at" >= $"lo" && $"at" < $"hi")
    val expected = sortedRows(vanillaRows(build))
    for (w <- Seq(1L, 3L, 17L, 64L, 1000L, 1000000L)) {
      withBinWidth(w) {
        assert(sortedRows(build.collect().map(_.toSeq).toSeq) == expected,
          s"conf width $w diverged")
      }
      val hinted = pts.hint("range_bin", w)
        .join(ivs, $"at" >= $"lo" && $"at" < $"hi")
      assert(sortedRows(hinted.collect().map(_.toSeq).toSeq) == expected,
        s"hint width $w diverged")
    }
  }
}
