package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join operators Spark lacks natively, composed from built-ins so Catalyst
  * still optimizes around them.
  */
object Joins {

  /** As-of join: for each left row, attach the LATEST right row whose
    * `rightTs` <= the left row's `leftTs`, per equality key — "the most
    * recent state as of this event", the standard event-stream enrichment
    * (DuckDB/kdb ASOF JOIN, pandas merge_asof). Left-outer semantics: left
    * rows with no preceding right row get nulls.
    *
    * Spark has no ASOF JOIN, and the obvious encodings collapse at scale:
    * an inequality theta-join plans as a broadcast-nested-loop, and a
    * "max right ts per left row" window subquery is O(|L|·|R|) per key.
    * This formulation tags and unions both sides, hash-partitions on the
    * key, sorts each partition once by (ts, side), and carries the most
    * recent right values forward with a running `last(_, ignoreNulls)`
    * frame — one exchange + one sort over |L|+|R| rows total, the same
    * cost envelope as a single sort-merge join, independent of how many
    * right rows precede each left row. Equal timestamps order the right
    * row first, so a right row AT the left timestamp matches (ASOF's
    * inclusive bound).
    *
    * Output: every left column, plus `prefix + v` for each `rightVals`
    * column.
    *
    * Determinism/null semantics: right rows sharing the same (key, ts) tie-
    * break by the rightVals tuple (largest wins) so the result is stable
    * across partitionings; right rows with a null key are dropped up front
    * (a NULL key never equi-matches in SQL), which also keeps null-key left
    * rows left-outer (they see no right rows in their window partition).
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keyCols.nonEmpty, "asOf needs at least one equality key")
    val lRowType = StructType(left.schema.fields)
    val rValType = StructType(
      rightVals.map(v => right.schema(v)).toArray)
    val keyed: Seq[Column] = keyCols.map(col)
    val l2 = left.select(keyed ++ Seq(
      col(leftTs).as("_ts"),
      lit(0).as("_side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_lrow"),
      lit(null).cast(rValType).as("_rv")): _*)
    val r2 = right
      .filter(keyCols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(keyed ++ Seq(
        col(rightTs).as("_ts"),
        lit(1).as("_side"),
        lit(null).cast(lRowType).as("_lrow"),
        struct(rightVals.map(col): _*).as("_rv")): _*)
    // sort right rows BEFORE left rows at equal _ts (desc on the side tag)
    // so the inclusive <= bound holds; last(ignoreNulls) then carries the
    // newest preceding right payload to each left row. _rv is the final
    // tiebreak (struct ordering) so duplicate right timestamps resolve
    // deterministically to the largest value tuple.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").desc, col("_rv").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l2.unionByName(r2)
      .withColumn("_r", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
    val leftCols = left.columns.map(c => col(s"_lrow.$c").as(c)).toSeq
    val rightCols = rightVals.map(v => col(s"_r.$v").as(prefix + v))
    joined.select(leftCols ++ rightCols: _*)
  }

  /** Range join: pair each left row with the right rows whose
    * [`rightStart`, `rightEnd`) interval contains the left row's `leftAt`
    * point, per equality key. Spark plans a raw inequality join as a
    * broadcast-nested-loop; this composition stays a hash equi-join by
    * binning: each right interval is exploded to the `binWidth`-sized bins
    * it overlaps, the left point equi-joins on its single bin (plus the
    * key), and the exact containment predicate filters within the bin —
    * candidate pairs are bounded by bin co-residency, not |L|·|R|.
    *
    * `binWidth` is in the units of the boundary columns (cast everything
    * numeric — for timestamps, epoch seconds). Choose it near the typical
    * interval length: wider bins → fewer explode rows but more false
    * candidates; narrower → the reverse.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftAt: String, rightStart: String, rightEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be > 0")
    // the _graft_bin name doubles as the RangeJoinRewrite re-entry guard:
    // the optimizer rule must not re-bin this already-binned join
    // inverted intervals (end < start) can never contain a point, but
    // Spark's sequence() would step BACKWARDS through them, materializing
    // an arbitrarily large bin array per malformed row — drop them first
    // (semantics-preserving: the containment predicate is always false)
    val rBinned = right
      .filter(col(rightEnd) >= col(rightStart))
      .withColumn("_graft_bin",
        explode(sequence(floor(col(rightStart) / binWidth).cast("long"),
          floor(col(rightEnd) / binWidth).cast("long"))))
    val lBinned = left.withColumn("_graft_bin",
      floor(col(leftAt) / binWidth).cast("long"))
    lBinned.join(rBinned, keyCols :+ "_graft_bin")
      .filter(col(leftAt) >= col(rightStart) && col(leftAt) < col(rightEnd))
      .drop("_graft_bin")
  }
}
