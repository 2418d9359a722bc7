package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Splits

/** Plan-shape regressions for the scale contract: filters reach the parquet
  * scan, scans read only the projected columns, dimensions broadcast, and
  * the zero-shuffle paths really are zero-shuffle. Runs against the tiny
  * sf0.001 fixture — plan SHAPE is scale-independent even if timings
  * aren't.
  */
class PlanShapeSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q01: shipdate filter is pushed to the lineitem scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      s"expected a pushed l_shipdate filter in:\n$p")
  }

  test("q01: scan reads only the columns the query needs") {
    val p = plan("q01_pricing_summary")
    // l_partkey/l_suppkey are not referenced; pruning must drop them
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema"))
      .mkString("\n")
    assert(readSchema.nonEmpty, s"no ReadSchema in:\n$p")
    assert(!readSchema.contains("l_partkey") &&
      !readSchema.contains("l_suppkey"),
      s"unpruned columns in: $readSchema")
  }

  test("q03/q05: dimension joins broadcast, never sort-merge") {
    for (q <- Seq("q03_top_orders", "q05_nation_revenue")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcasts:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q fell back to sort-merge:\n$p")
    }
  }

  test("hashSplit is shuffle-free") {
    val p = Splits.hashSplit(Tables.docs, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"hashSplit must not shuffle:\n$p")
  }

  test("q52 deterministic sample plans as TakeOrderedAndProject") {
    val p = plan("q52_det_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected top-n pushdown, not a global sort:\n$p")
  }

  test("q58 latest-by-key is a hash aggregate with partial aggregation") {
    val p = plan("q58_latest_by_key")
    assert(!p.contains("Window"), s"q58 must not use a window:\n$p")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate")
      || p.contains("SortAggregate"), s"expected aggregation in:\n$p")
  }

  private object Tables {
    def docs: DataFrame =
      graft.core.Tables.load(spark, sfDir, "documents")
  }
}
