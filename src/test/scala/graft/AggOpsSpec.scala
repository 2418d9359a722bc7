package graft

import graft.operators.AggOps

class AggOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("latestByKey picks the max-order row's values per key") {
    val df = Seq(
      (1L, 10L, "a"), (1L, 30L, "b"), (1L, 20L, "c"),
      (2L, 5L, "x"))
      .toDF("k", "ord", "v")
    val got = AggOps.latestByKey(df, Seq("k"), "ord", Seq("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got == Map(1L -> ((30L, "b")), 2L -> ((5L, "x"))))
  }

  test("latestByKey resolves order ties deterministically (max value tuple)") {
    val df = Seq((1L, 10L, "a"), (1L, 10L, "z"), (1L, 10L, "m"))
      .toDF("k", "ord", "v")
    val one = AggOps.latestByKey(df, Seq("k"), "ord", Seq("v")).collect()
    val two = AggOps.latestByKey(df.repartition(7), Seq("k"), "ord", Seq("v"))
      .collect()
    assert(one.toSeq == two.toSeq)
    assert(one.head.getString(2) == "z")
  }

  test("latestByKey plans as one aggregation, not a window") {
    val df = Seq((1L, 10L, "a")).toDF("k", "ord", "v")
    val plan = AggOps.latestByKey(df, Seq("k"), "ord", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate in:\n$plan")
  }
}
