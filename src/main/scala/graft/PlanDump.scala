package graft

import graft.core.GraftSession

/** Dev tool: dump formatted physical plans for selected queries so plan
  * shape (pushed filters, broadcast joins, codegen spans) can be reviewed.
  * Usage: runMain graft.PlanDump [sfDir] [queryName ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val requested = args.drop(1).toSeq
    val names =
      if (requested.contains("all")) SparkEntry.queries.keys.toSeq.sorted
      else if (requested.nonEmpty) requested
      else Seq("q01_pricing_summary", "q03_top_orders", "q05_nation_revenue")
    val spark = GraftSession.get("graft-plans")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(q) =>
          println(s"\n========== $n ==========")
          q(spark, sfDir).explain("formatted")
        case None =>
          println(s"\n========== $n: unknown query (known: " +
            s"${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}) ==========")
      }
    }
    spark.stop()
  }
}
