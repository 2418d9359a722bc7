package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for 100 TB-class runs.
  *
  * AQE's skew-join splitting handles most join skew automatically; these
  * cover the aggregation-side cases AQE does not: a handful of hot keys
  * flooding single reducers.
  */
object SkewOps {

  /** Two-phase salted aggregation: partial-aggregate on (key, salt) so hot
    * keys fan out over `saltBuckets` reducers, then final-aggregate on the
    * key. Caller supplies the partial aggregations and the matching final
    * merge (e.g. partial `sum(x) as s, count(1) as c` → final
    * `sum(s), sum(c)`).
    */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    Reserved.requireFreeColumns(df, Seq("_salt"), "saltedAggregate",
      "it appends the _salt bucketing column")
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted sum/count/avg over possibly-skewed keys — the common case,
    * pre-wired. Output: keyCols + sum_<x>, cnt, avg_<x>.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltBuckets: Int = 32): DataFrame = {
    Reserved.requireFreeParams(Seq("_s", "_c", "cnt"), "saltedSumCount",
      keyCols.map("keyCols" -> _): _*)
    saltedAggregate(df, keyCols, saltBuckets,
      partialAggs = Seq(sum(valueCol).as("_s"), count(lit(1)).as("_c")),
      finalAggs = Seq(
        sum("_s").as(s"sum_$valueCol"),
        sum("_c").as("cnt"),
        (sum("_s") / sum("_c")).as(s"avg_$valueCol")))
  }
}
