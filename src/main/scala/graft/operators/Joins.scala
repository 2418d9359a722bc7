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

  /** One point-in-interval dimension of a [[rangeJoin]]: the left point
    * column, the right interval's bound columns, and the bin width in the
    * units of those columns (cast everything numeric — for timestamps,
    * epoch seconds). Choose the width near the typical interval length:
    * wider bins → fewer explode rows but more false candidates; narrower →
    * the reverse.
    */
  final case class RangeDim(leftAt: String, rightStart: String,
      rightEnd: String, binWidth: Long)

  /** Range join: pair each left row with the right rows whose
    * [`rightStart`, `rightEnd`) interval contains the left row's `leftAt`
    * point, per equality key. Spark plans a raw inequality join as a
    * broadcast-nested-loop; this composition stays a hash equi-join by
    * binning: each right interval is exploded to the `binWidth`-sized bins
    * it overlaps, the left point equi-joins on its single bin (plus the
    * key), and the exact containment predicate filters within the bin —
    * candidate pairs are bounded by bin co-residency, not |L|·|R|.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftAt: String, rightStart: String, rightEnd: String,
      binWidth: Long): DataFrame =
    rangeJoin(left, right, keyCols,
      Seq(RangeDim(leftAt, rightStart, rightEnd, binWidth)))

  /** Multi-dimensional range join: each of `dims` is an independent
    * point-in-interval containment (e.g. a time window AND a value band),
    * and every dimension contributes its own bin equi-key, so candidate
    * pairs must co-reside in ALL dimensions — the pruning a residual
    * predicate can't give. The right side explodes the cross product of
    * its per-dimension bin ranges (size the widths near the interval
    * lengths to keep that ≤2 bins per dimension).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      dims: Seq[RangeDim]): DataFrame = {
    require(dims.nonEmpty, "rangeJoin needs at least one dimension")
    dims.foreach(d => require(d.binWidth > 0,
      s"binWidth must be > 0 for $d"))
    // the _graft_bin names double as the RangeJoinRewrite re-entry guard:
    // the optimizer rule must not re-bin this already-binned join
    def binName(i: Int): String =
      "_graft_bin" + (if (i == 0) "" else (i + 1).toString)
    // inverted intervals (end < start) can never contain a point, but
    // Spark's sequence() would step BACKWARDS through them, materializing
    // an arbitrarily large bin array per malformed row — drop them first
    // (semantics-preserving: the containment predicate is always false)
    val rBinned = dims.zipWithIndex.foldLeft(
      right.filter(dims.map(d =>
        col(d.rightEnd) >= col(d.rightStart)).reduce(_ && _))) {
      case (df, (d, i)) => df.withColumn(binName(i),
        explode(sequence(floor(col(d.rightStart) / d.binWidth).cast("long"),
          floor(col(d.rightEnd) / d.binWidth).cast("long"))))
    }
    val lBinned = dims.zipWithIndex.foldLeft(left) { case (df, (d, i)) =>
      df.withColumn(binName(i), floor(col(d.leftAt) / d.binWidth).cast("long"))
    }
    lBinned.join(rBinned, keyCols ++ dims.indices.map(binName))
      .filter(dims.map(d => col(d.leftAt) >= col(d.rightStart) &&
        col(d.leftAt) < col(d.rightEnd)).reduce(_ && _))
      .drop(dims.indices.map(binName): _*)
  }

  /** Interval-overlap join: pair each left [`leftStart`, `leftEnd`)
    * interval with the right [`rightStart`, `rightEnd`) intervals it
    * overlaps (`leftStart < rightEnd AND rightStart < leftEnd` — the
    * standard half-open overlap predicate), per equality key.
    *
    * Like [[rangeJoin]] but BOTH sides carry intervals, so both sides
    * explode to their covered bins and equi-join on the bin. A pair whose
    * intervals span several shared bins would match once per shared bin;
    * instead of a dedup shuffle, each pair is emitted from exactly ONE
    * canonical bin — the bin containing `greatest(leftStart, rightStart)`
    * (the overlap's own start, which always lies inside both intervals'
    * covered bin ranges when the overlap predicate holds) — so the output
    * is duplicate-free without any post-join aggregation.
    *
    * `binWidth` is in the units of the boundary columns; size it near the
    * typical interval length of the LONGER side so each interval covers
    * ~2 bins. The boundary column names must be distinct across the two
    * sides (they both survive into the joined row for the exact
    * predicate).
    *
    * Unlike [[rangeJoin]], rows whose own interval is inverted
    * (`end < start`) are NOT dropped: the raw overlap predicate is
    * satisfiable by such a row — left (10, 5) matches right (3, 20)
    * because 10 < 20 AND 3 < 5 — so this operator matches the plain-SQL
    * predicate exactly. Each side explodes the bins of
    * `[least(start, end), greatest(start, end)]` (so `sequence()` never
    * steps backwards), and the canonical bin of
    * `greatest(leftStart, rightStart)` provably lies in both sides'
    * covered ranges whenever the predicate holds (both sides inverted is
    * unsatisfiable — the predicate would form a cycle).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be > 0")
    require(Set(leftStart, leftEnd).intersect(Set(rightStart, rightEnd))
        .isEmpty,
      "boundary column names must differ between the two sides")
    def binOf(c: Column): Column = floor(c / binWidth).cast("long")
    def binned(df: DataFrame, start: String, end: String): DataFrame = df
      .withColumn("_graft_bin",
        explode(sequence(binOf(least(col(start), col(end))),
          binOf(greatest(col(start), col(end))))))
    binned(left, leftStart, leftEnd)
      .join(binned(right, rightStart, rightEnd), keyCols :+ "_graft_bin")
      .filter(col(leftStart) < col(rightEnd) &&
        col(rightStart) < col(leftEnd) &&
        col("_graft_bin") === binOf(greatest(col(leftStart),
          col(rightStart))))
      .drop("_graft_bin")
  }
}
