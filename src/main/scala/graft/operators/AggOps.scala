package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aggregation patterns that replace more expensive formulations at scale. */
object AggOps {

  /** The latest row's values per key, via ONE hash aggregation — the
    * scale-preferred alternative to `row_number() OVER (PARTITION BY key
    * ORDER BY ord DESC) = 1`: a window must shuffle AND sort every
    * partition, while `max(struct(ord, vals))` gets map-side partial
    * aggregation and never sorts. Ties on `orderCol` resolve by the value
    * tuple (largest wins), so the result is deterministic regardless of
    * partitioning.
    *
    * Output columns: keyCols ++ (orderCol, valCols…).
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "latestByKey needs at least one key column")
    val ord = struct((orderCol +: valCols).map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(ord).as("_m"))
      .select(keyCols.map(col) ++
        (orderCol +: valCols).map(v => col(s"_m.$v").as(v)): _*)
  }
}
