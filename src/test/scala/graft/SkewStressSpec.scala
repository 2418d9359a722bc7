package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{GuardMetrics, Joins}

/** Planted-skew stress at sf0.1 (the bench scale, ~20k clicks × ~20k
  * purchases): 30% of both sides collapse onto ONE (user, hour-bin)
  * cohort — boilerplate epoch-zero timestamps, the hot-bin shape the
  * guard exists for. This is the data-scale evidence behind the guard's
  * scaladoc claims, beyond the toy-row unit tests:
  *
  *  - guard ON: the cap engages (the GuardMetrics accumulators say so,
  *    ~12k rows across both sides), the quadratic cohort is skipped, and
  *    the query stays fast;
  *  - guard OFF (sentinel) and the raw-SQL path through RangeJoinRewrite
  *    (AQE on — the session default): the ~36M-pair hot cohort is
  *    computed IN FULL on the binned plan — the same pairs vanilla's
  *    nested loop would emit, minus the O(|L|·|R|) predicate scan — and
  *    both agree exactly.
  *
  * At this scale the hot shuffle partition (~6k rows a side) is far under
  * `spark.sql.adaptive.skewJoin` thresholds, so AQE's skew split stays
  * idle here; it is the backstop for the SAME shape when a partition
  * reaches hundreds of MB on a cluster. Measured times are recorded in
  * BASELINE.md (round 9 note).
  */
class SkewStressSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.1"

  private def timed[A](what: String)(body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"$what: $sec%.2f s")
    (r, sec)
  }

  test("30% epoch-zero hot cohort at sf0.1: the guard caps it with " +
      "nonzero accumulators; sentinel and raw-SQL rule paths compute the " +
      "quadratic cohort in full and agree — all on binned plans") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists(),
      "sf0.1 testdata not present")
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("skewed_ms",
        when(col("event_id") % 10 < 3, lit(0L))
          .otherwise(unix_millis(col("ts"))))
      .withColumn("skewed_user",
        when(col("event_id") % 10 < 3, lit(7L)).otherwise(col("user_id")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("skewed_user").as("user_id"),
        col("skewed_ms").as("at_ms"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("skewed_user").as("user_id"),
        col("skewed_ms").as("start_ms"),
        (col("skewed_ms") + 3600000L).as("end_ms"),
        col("event_id").as("purchase_id"))
    val hotL = clicks.filter($"user_id" === 7L && $"at_ms" === 0L).count()
    val hotR = purchases.filter($"user_id" === 7L && $"start_ms" === 0L)
      .count()
    assert(hotL > 5000 && hotR > 5000, "fixture lost its hot cohort")

    def operatorJoin(cap: Long) = Joins.rangeJoin(clicks, purchases,
      Seq("user_id"), "at_ms", "start_ms", "end_ms",
      binWidth = 3600000L, maxBinSize = cap)
    val ctr = GuardMetrics.of(spark.sparkContext)
    ctr.reset()
    val (guardedCount, guardedSec) = timed("guarded rangeJoin, cap=1000") {
      operatorJoin(1000).count()
    }
    // both sides' hot cohorts are over the cap → every hot row counted
    assert(ctr.droppedRows.value >= hotL + hotR,
      s"cap must engage on the hot cohort, counted ${ctr.droppedRows.value}")
    assert(ctr.droppedCohorts.value >= 2)

    val (fullCount, fullSec) = timed("unguarded rangeJoin, sentinel") {
      operatorJoin(-1).count()
    }
    // epoch-zero × epoch-zero: every hot pair satisfies the containment,
    // so the exact quadratic contribution is hotL × hotR
    assert(fullCount >= hotL * hotR)
    assert(fullCount - guardedCount >= hotL * hotR,
      "the guard must skip exactly the quadratic cohort (plus any " +
        "over-cap stragglers), nothing less")

    // raw-SQL sliding-window path: RangeJoinRewrite bins it (width from
    // the + 3600000 literal); AQE on is the session default
    val p2 = purchases.toDF("p_user", "p_start", "p_end", "purchase_id")
    val sqlJoin = clicks.join(p2,
      $"user_id" === $"p_user" && $"at_ms" >= $"p_start" &&
        $"at_ms" < $"p_start" + 3600000L)
    val (sqlCount, sqlSec) = timed("raw-SQL rule path, AQE on") {
      sqlJoin.count()
    }
    assert(sqlCount == fullCount,
      "rule path and unguarded operator must agree exactly")
    for ((df, what) <- Seq((operatorJoin(1000), "guarded operator"),
        (sqlJoin, "rule path"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"$what fell off the binned plan:\n$plan")
    }
    info(f"hot cohort: $hotL x $hotR; counts: guarded=$guardedCount " +
      f"full=$fullCount; secs guarded=$guardedSec%.2f full=$fullSec%.2f " +
      f"sql=$sqlSec%.2f")
  }
}
