package graft

import graft.core.GraftSession

/** Dev smoke: runs the driver-contract entry() and prints its row count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-smoke")
    val df = SparkEntry.entry(spark)
    println(s"[smoke] entry rows = ${df.count()}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
