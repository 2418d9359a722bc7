package graft

import graft.core.GraftSession

/** Dev tool: dump formatted physical plans for selected queries so plan
  * shape (pushed filters, broadcast joins, codegen spans) can be reviewed.
  * Usage: runMain graft.PlanDump [sfDir] [queryName ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1 && args.tail.toSeq != Seq("all"))
      args.tail.toSeq
    else if (args.length > 1) SparkEntry.queries.keys.toSeq.sorted
    else Seq("q01_pricing_summary", "q03_top_orders", "q05_nation_revenue")
    val spark = GraftSession.get("graft-plans")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
