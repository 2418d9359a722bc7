package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, NumericType, StructType, TimestampNTZType, TimestampType}

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
      prefix: String = "asof_"): DataFrame =
    asOf(left, right, keyCols, leftTs, rightTs, rightVals, prefix,
      direction = "backward")

  /** [[asOf]] with a `direction`, mirroring pandas `merge_asof`:
    *  - `"backward"` (the default form above): latest right row with
    *    `rightTs <= leftTs`;
    *  - `"forward"`: EARLIEST right row with `rightTs >= leftTs` — "the
    *    next state change after this event";
    *  - `"nearest"`: whichever of the two is closer in time (ties go
    *    backward, pandas' convention).
    *
    * Cost envelope is unchanged — one hash exchange over |L|+|R| rows;
    * `forward` runs the same single sort with a mirrored frame
    * (`first(_, ignoreNulls)` over `[current, unbounded)`), and
    * `nearest` evaluates both frames over one partitioning (Spark plans
    * one exchange; the two sort orders differ only in the side tag's
    * tie-break, costing a second sort, not a second shuffle). Equal
    * timestamps match in BOTH directions (both bounds are inclusive);
    * duplicate right timestamps resolve to the largest value tuple
    * backward and the smallest forward — each deterministic.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      prefix: String, direction: String): DataFrame =
    asOf(left, right, keyCols, leftTs, rightTs, rightVals, prefix,
      direction, tolerance = None)

  /** [[asOf]] with a match `tolerance` (pandas `merge_asof(tolerance=…)`):
    * a candidate right row farther than `tolerance` from the left
    * timestamp is declined and the left row keeps nulls instead of stale
    * enrichment — the everyday guard against "the most recent state" being
    * months old. Units follow the timestamp family's bin image: native for
    * numeric columns, epoch MICROS for timestamps, epoch DAYS for dates.
    * The bound is inclusive (`|leftTs − rightTs| <= tolerance` matches);
    * under `nearest` each side's candidate is vetted BEFORE the
    * closer-wins comparison, so a too-far backward match correctly yields
    * to an in-range forward one. Implemented as one `when` over the
    * already-carried payload timestamp — the one-exchange envelope is
    * unchanged.
    *
    * Null timestamps follow SQL comparison semantics (NULL satisfies no
    * inequality): right rows with a null `rightTs` are dropped up front —
    * without this they sort to the partition edge where a window frame
    * hands them spurious matches — and left rows with a null `leftTs`
    * keep nulls but stay in the output (left-outer semantics).
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      prefix: String, direction: String,
      tolerance: Option[Long]): DataFrame = {
    require(keyCols.nonEmpty, "asOf needs at least one equality key")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward, forward, or nearest, got '$direction'")
    // the key columns ride the tagged-union lineage with the internal
    // working names — a key named like one would make the union
    // projection ambiguous far from here
    Reserved.requireFreeParams(
      Seq("_ts", "_side", "_lrow", "_rv", "_rpay", "_p", "_r"), "asOf",
      keyCols.map("keyCols" -> _): _*)
    tolerance.foreach { t =>
      require(t >= 0, s"tolerance must be >= 0, got $t")
      // the horizon has ONE unit (the family's bin image); a DATE left
      // against a TIMESTAMP right would mix days with micros — fail fast
      // with the family error instead of a downstream analysis error
      requireSameFamily(Seq((left, leftTs), (right, rightTs)),
        "asOf tolerance timestamp")
    }
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
      .filter((keyCols.map(c => col(c).isNotNull) :+
        col(rightTs).isNotNull).reduce(_ && _))
      .select(keyed ++ Seq(
        col(rightTs).as("_ts"),
        lit(1).as("_side"),
        lit(null).cast(lRowType).as("_lrow"),
        struct(rightVals.map(col): _*).as("_rv")): _*)
    // the numeric image each side's timestamp compares on for `tolerance`
    // (micros/days/native — the binned-join families); monotone, so the
    // inclusive horizon survives the mapping
    def vetted(pay: Column): Column = tolerance match {
      case None => pay
      case Some(t) => when(
        abs(binSrcOf(left.schema(leftTs).dataType, col("_ts")) -
          binSrcOf(right.schema(rightTs).dataType,
            pay.getField("_rts"))) <= t, pay)
    }
    // BACKWARD: sort right rows BEFORE left rows at equal _ts (desc on
    // the side tag) so the inclusive <= bound holds; last(ignoreNulls)
    // carries the newest preceding right payload (and its _ts, for
    // `nearest`) to each left row. _rv is the final tiebreak (struct
    // ordering) so duplicate right timestamps resolve deterministically.
    // FORWARD mirrors it: left rows sort BEFORE right rows at equal _ts
    // (asc side tag) so the inclusive >= bound holds, and
    // first(ignoreNulls) over [current, unbounded) grabs the earliest
    // following right payload.
    val rPayload = struct(col("_ts").as("_rts"), col("_rv").as("_v"))
    val bw = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").desc, col("_rv").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fw = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_rv").asc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tagged = l2.unionByName(r2)
      .withColumn("_rpay", when(col("_side") === 1, rPayload))
    val picked = direction match {
      case "backward" =>
        tagged
          .withColumn("_p", last(col("_rpay"), ignoreNulls = true).over(bw))
          .withColumn("_r", vetted(col("_p")).getField("_v"))
      case "forward" =>
        tagged
          .withColumn("_p", first(col("_rpay"), ignoreNulls = true).over(fw))
          .withColumn("_r", vetted(col("_p")).getField("_v"))
      case "nearest" =>
        // closer wins; a tie, or a missing forward match, goes backward
        tagged
          .withColumn("_b", last(col("_rpay"), ignoreNulls = true).over(bw))
          .withColumn("_f", first(col("_rpay"), ignoreNulls = true).over(fw))
          .withColumn("_b", vetted(col("_b")))
          .withColumn("_f", vetted(col("_f")))
          .withColumn("_r",
            when(col("_b").isNull, col("_f").getField("_v"))
              .when(col("_f").isNull, col("_b").getField("_v"))
              .when(col("_ts") - col("_b").getField("_rts") <=
                  col("_f").getField("_rts") - col("_ts"),
                col("_b").getField("_v"))
              .otherwise(col("_f").getField("_v")))
    }
    // a null left timestamp matches nothing (SQL comparison semantics):
    // such rows sort to the partition start, where the forward frame
    // would otherwise hand them the partition's earliest right row
    val withPick = picked.withColumn("_r",
      when(col("_ts").isNull, lit(null).cast(rValType))
        .otherwise(col("_r")))
    val joined = withPick.filter(col("_side") === 0)
    val leftCols = left.columns.map(c => col(s"_lrow.$c").as(c)).toSeq
    val rightCols = rightVals.map(v => col(s"_r.$v").as(prefix + v))
    joined.select(leftCols ++ rightCols: _*)
  }

  /** One point-in-interval dimension of a [[rangeJoin]]: the left point
    * column, the right interval's bound columns, and the bin width in the
    * units of those columns' BIN IMAGE — native for numerics, epoch
    * MICROS for TIMESTAMP columns (binned via `unix_micros` internally;
    * pass e.g. `3600L * 1000000` for an hour), epoch DAYS for DATE
    * columns (binned via `unix_date`; pass e.g. `30` for a month-ish
    * window — a micros-scale width on DATE bounds would silently put
    * every row in bin 0 and restore the per-key cross join). Choose the
    * width near the typical interval length: wider bins → fewer explode
    * rows but more false candidates; narrower → the reverse.
    */
  final case class RangeDim(leftAt: String, rightStart: String,
      rightEnd: String, binWidth: Long)

  /** The numeric image a bound column bins on: timestamps map to epoch
    * micros (so `binWidth` is in micros for them), numerics to their own
    * value. The mapping is monotone and identical on both join sides,
    * which is all binning needs — the exact predicate still compares the
    * ORIGINAL columns.
    */
  private def binSrc(df: DataFrame, name: String): Column =
    binSrcOf(df.schema(name).dataType, col(name))

  private def binSrcOf(dt: DataType, c: Column): Column = dt match {
    case TimestampType => unix_micros(c)
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case DateType => unix_date(c)
    case _ => c
  }

  /** Shared naming for the binned-join family: `_graft_bin`, `_graft_bin2`,
    * … per dimension (these names double as the RangeJoinRewrite re-entry
    * guard — the optimizer rule must not re-bin an already-binned join),
    * `_r`-suffixed right-side bins, and `_graft_rk_`-prefixed right-key
    * renames where the right side leaves the left's namespace.
    */
  private def binName(i: Int): String =
    "_graft_bin" + (if (i == 0) "" else (i + 1).toString)
  private def rBinName(i: Int): String = binName(i) + "_r"
  private def rKeyName(k: String): String = "_graft_rk_" + k

  private def requireGuardCap(maxBinSize: Long): Unit =
    require(maxBinSize <= 0 || maxBinSize > 1,
      "maxBinSize must be > 1 (or <= 0 to skip the skew guard)")

  /** The bin image is chosen per column TYPE (micros / days / native), so
    * every bound column of one dimension must come from the same family —
    * a DATE point binned in days can never equi-match a TIMESTAMP
    * interval binned in micros, and the join would silently return
    * nothing. Fail fast instead; callers mixing families must cast one
    * side first (Spark would coerce the exact predicate, but coercion
    * cannot reach the bin keys).
    */
  private def requireSameFamily(
      cols: Seq[(DataFrame, String)], what: String): Unit = {
    def family(dt: DataType): String = dt match {
      case TimestampType | TimestampNTZType => "timestamp"
      case DateType => "date"
      case _: NumericType => "numeric"
      case other => other.typeName
    }
    val families = cols.map { case (df, n) =>
      n -> family(df.schema(n).dataType) }
    require(families.map(_._2).distinct.size == 1 &&
        Set("numeric", "timestamp", "date").contains(families.head._2),
      s"$what bound columns must share one type family " +
        s"(numeric, timestamp, or date), got: " +
        families.map { case (n, f) => s"$n=$f" }.mkString(", "))
  }

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

  /** Single-dimension [[rangeJoin]] with an explicit hot-bin cap (Scala
    * allows default arguments on only one overload — the `dims` form
    * carries them).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftAt: String, rightStart: String, rightEnd: String,
      binWidth: Long, maxBinSize: Long): DataFrame =
    rangeJoin(left, right, keyCols,
      Seq(RangeDim(leftAt, rightStart, rightEnd, binWidth)), maxBinSize)

  /** Multi-dimensional range join: each of `dims` is an independent
    * point-in-interval containment (e.g. a time window AND a value band),
    * and every dimension contributes its own bin equi-key, so candidate
    * pairs must co-reside in ALL dimensions — the pruning a residual
    * predicate can't give. The right side explodes the cross product of
    * its per-dimension bin ranges (size the widths near the interval
    * lengths to keep that ≤2 bins per dimension).
    *
    * Hot-bin skew guard (`maxBinSize`, same contract as
    * `Dedup.minhashNearDuplicates`'s `maxBucketSize`): a hot (key, bin)
    * cohort — epoch-zero default timestamps, a flash-sale hour — makes
    * B_l × B_r candidate pairs inside that one bin, the binned join's
    * only quadratic failure mode. Each side's rows in a (key, bins…)
    * cohort larger than `maxBinSize` are dropped before the join (the
    * WHOLE cohort, mirroring the minhash guard), so per-bin work is
    * bounded by `maxBinSize²`. This trades results for survival: matches
    * involving a dropped cohort are lost, so the cap is sized (10 000)
    * to engage only on pathological cohorts — `10000²` pairs in ONE bin
    * is already a data bug to investigate, not a query to answer.
    * `maxBinSize <= 0` is the documented sentinel for "no guard": exact
    * results whatever the skew, at the risk of a quadratic bin. Guard
    * shape: a count window partitioned by the join's own (key, bins…)
    * keys, so its exchange (and sort) is exactly what the sort-merge
    * join a real cluster plans here needs anyway — at scale the guard
    * costs no extra shuffle. At broadcast-size inputs it does force the
    * exchange the broadcast join would have skipped (~0.2 s on the
    * sf0.1 bench queries); set the sentinel where inputs are known tiny
    * AND skew-free.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      dims: Seq[RangeDim], maxBinSize: Long = 10000): DataFrame = {
    require(dims.nonEmpty, "rangeJoin needs at least one dimension")
    dims.foreach(d => require(d.binWidth > 0,
      s"binWidth must be > 0 for $d"))
    dims.foreach(d => requireSameFamily(Seq((left, d.leftAt),
      (right, d.rightStart), (right, d.rightEnd)), s"rangeJoin $d"))
    requireGuardCap(maxBinSize)
    // inverted intervals (end < start) can never contain a point, but
    // Spark's sequence() would step BACKWARDS through them, materializing
    // an arbitrarily large bin array per malformed row — drop them first
    // (semantics-preserving: the containment predicate is always false)
    val rBinned = dims.zipWithIndex.foldLeft(
      right.filter(dims.map(d =>
        col(d.rightEnd) >= col(d.rightStart)).reduce(_ && _))) {
      case (df, (d, i)) => df.withColumn(binName(i),
        explode(sequence(
          floor(binSrc(df, d.rightStart) / d.binWidth).cast("long"),
          floor(binSrc(df, d.rightEnd) / d.binWidth).cast("long"))))
    }
    val lBinned = dims.zipWithIndex.foldLeft(left) { case (df, (d, i)) =>
      df.withColumn(binName(i),
        floor(binSrc(df, d.leftAt) / d.binWidth).cast("long"))
    }
    val joinKeys = keyCols ++ dims.indices.map(binName)
    val guard = binGuard(joinKeys, maxBinSize, "rangeJoin") _
    guard(lBinned).join(guard(rBinned), joinKeys)
      .filter(dims.map(d => col(d.leftAt) >= col(d.rightStart) &&
        col(d.leftAt) < col(d.rightEnd)).reduce(_ && _))
      .drop(dims.indices.map(binName): _*)
  }

  /** The hot-bin cap shared by the binned join family: drop every row of
    * a (key, bin) cohort larger than `maxBinSize` (see [[rangeJoin]]'s
    * guard doc for the trade). The count window partitions on the join's
    * own keys, so its exchange is reused by the join itself. Drops are
    * counted in the session's [[GuardMetrics]] accumulators — the
    * session-wide pair plus a per-`tag` pair, so two guarded operators
    * in one query stay attributable — and warned once per executor.
    */
  private def binGuard(joinKeys: Seq[String], maxBinSize: Long,
      tag: String)(df: DataFrame): DataFrame =
    GuardMetrics.capCohorts(df, joinKeys.map(col), maxBinSize, tag)

  /** Left-outer [[rangeJoin]] (single dimension): every left row
    * survives; points inside no right interval carry nulls for the right
    * columns. See the `dims` overload for the mechanics.
    */
  def rangeJoinLeftOuter(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftAt: String, rightStart: String,
      rightEnd: String, binWidth: Long): DataFrame =
    rangeJoinLeftOuter(left, right, keyCols,
      Seq(RangeDim(leftAt, rightStart, rightEnd, binWidth)))

  /** Left-outer [[rangeJoin]]: "each event with its containing window,
    * keeping events with none" — the everyday complement of the inner
    * form, which otherwise needs a hand-rolled anti-join union.
    *
    * Shape: the point side keeps its single bin per row, the exact
    * containment predicate moves INTO the left-outer join condition
    * (equi keys: the keys + bins; containment becomes the residual), so
    * unmatched left rows surface with nulls directly — no second pass,
    * no row-id bookkeeping, same single-shuffle cost envelope as the
    * inner form. The right side's key/bound columns must not collide
    * with left column names (right keys are renamed internally; its
    * value columns pass through).
    *
    * The hot-bin guard caps the RIGHT side only: a left-outer join must
    * preserve every left row, so left cohorts are never dropped — an
    * over-cap right cohort loses its matches and those left rows emit as
    * unmatched (see [[rangeJoin]]'s guard doc for sizing).
    */
  def rangeJoinLeftOuter(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], dims: Seq[RangeDim],
      maxBinSize: Long = 10000): DataFrame = {
    require(dims.nonEmpty, "rangeJoinLeftOuter needs at least one dimension")
    dims.foreach(d => require(d.binWidth > 0, s"binWidth must be > 0 for $d"))
    dims.foreach(d => requireSameFamily(Seq((left, d.leftAt),
      (right, d.rightStart), (right, d.rightEnd)),
      s"rangeJoinLeftOuter $d"))
    requireGuardCap(maxBinSize)
    // right side: rename keys out of the left's namespace, drop inverted
    // intervals (containment-safe, see rangeJoin), explode covered bins
    val renamed = keyCols.foldLeft(right)(
      (df, k) => df.withColumnRenamed(k, rKeyName(k)))
    val rBinned = dims.zipWithIndex.foldLeft(
      renamed.filter(dims.map(d =>
        col(d.rightEnd) >= col(d.rightStart)).reduce(_ && _))) {
      case (df, (d, i)) => df.withColumn(rBinName(i),
        explode(sequence(
          floor(binSrc(df, d.rightStart) / d.binWidth).cast("long"),
          floor(binSrc(df, d.rightEnd) / d.binWidth).cast("long"))))
    }
    val rGuarded = binGuard(
      keyCols.map(rKeyName) ++ dims.indices.map(rBinName), maxBinSize,
      "rangeJoinOuter")(rBinned)
    val lBinned = dims.zipWithIndex.foldLeft(left) { case (df, (d, i)) =>
      df.withColumn(binName(i),
        floor(binSrc(df, d.leftAt) / d.binWidth).cast("long"))
    }
    // a null point or key bins/equi-joins to nothing and falls out as an
    // unmatched left row — exactly vanilla LEFT JOIN semantics
    val cond = (keyCols.map(k => col(k) === col(rKeyName(k))) ++
      dims.indices.map(i => col(binName(i)) === col(rBinName(i))) ++
      dims.map(d => col(d.leftAt) >= col(d.rightStart) &&
        col(d.leftAt) < col(d.rightEnd))).reduce(_ && _)
    lBinned.join(rGuarded, cond, "left_outer")
      .drop(dims.indices.map(binName): _*)
      .drop(dims.indices.map(rBinName): _*)
      .drop(keyCols.map(rKeyName): _*)
  }

  /** Full-outer [[rangeJoin]] (single dimension): every left point AND
    * every right interval survives; see the `dims` overload.
    */
  def rangeJoinFullOuter(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftAt: String, rightStart: String,
      rightEnd: String, binWidth: Long): DataFrame =
    rangeJoinFullOuter(left, right, keyCols,
      Seq(RangeDim(leftAt, rightStart, rightEnd, binWidth)))

  /** Single-dimension [[rangeJoinFullOuter]] with an explicit guard cap
    * (defaults live on the `dims` overload).
    */
  def rangeJoinFullOuter(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftAt: String, rightStart: String,
      rightEnd: String, binWidth: Long, maxBinSize: Long): DataFrame =
    rangeJoinFullOuter(left, right, keyCols,
      Seq(RangeDim(leftAt, rightStart, rightEnd, binWidth)), maxBinSize)

  /** Full-outer [[rangeJoin]]: matched (point, interval) pairs plus every
    * unmatched left point AND every unmatched right interval, null-extended
    * — vanilla `FULL JOIN ... ON key AND containment` semantics, which
    * Spark would plan as a nested loop.
    *
    * Key columns come back USING-style: since the join condition requires
    * key equality, the output carries ONE column per key name, coalesced
    * across the two sides (an unmatched right row's key survives there).
    * The right side's bound/value columns must not collide with left
    * column names.
    *
    * Mechanics beyond [[rangeJoinLeftOuter]] (whose condition-resident
    * containment already preserves the never-exploded point side): the
    * interval side IS exploded, so its unmatched rows must emit exactly
    * once, not once per bin copy. Each right row is stamped with a
    * synthetic 8-byte id BEFORE the explode; after the full-outer join a
    * count window over that id says whether ANY copy matched, and
    * fully-unmatched rows emit from their HOME bin only (the bin of
    * `least(start, end)`, null-safe — inverted intervals are NOT dropped
    * here, and null-bound rows keep a null-bin copy via `explode_outer`,
    * because both must surface as unmatched rows). Unmatched LEFT rows
    * need no such pass (one copy each); they key the same window by a
    * disjoint negative image of their own pre-stamped id, so the
    * window never concentrates them into one null partition. The ids are
    * consumed within this single linear plan — they must not cross
    * plan-reuse boundaries (monotonically_increasing_id is
    * recomputation-sensitive).
    *
    * The hot-bin guard changes shape here: dropping a cohort's ROWS would
    * lose unmatched emissions, so the cap rides the JOIN CONDITION
    * instead — over-cap (key, bins…) cohorts on either side match
    * nothing and their rows surface as unmatched. No rows are ever lost;
    * only over-cap matches are, same sizing rationale as [[rangeJoin]].
    * Cost: one extra exchange for the id window — the price of outer
    * semantics on the exploding side.
    */
  def rangeJoinFullOuter(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], dims: Seq[RangeDim],
      maxBinSize: Long = 10000): DataFrame = {
    require(dims.nonEmpty, "rangeJoinFullOuter needs at least one dimension")
    dims.foreach(d => require(d.binWidth > 0, s"binWidth must be > 0 for $d"))
    dims.foreach(d => requireSameFamily(Seq((left, d.leftAt),
      (right, d.rightStart), (right, d.rightEnd)),
      s"rangeJoinFullOuter $d"))
    requireGuardCap(maxBinSize)
    def rSrc(d: RangeDim)(c: Column): Column =
      binSrcOf(right.schema(d.rightStart).dataType, c)
    def rBinOf(d: RangeDim)(c: Column): Column =
      floor(rSrc(d)(c) / d.binWidth).cast("long")
    val renamed = keyCols.foldLeft(right)(
      (df, k) => df.withColumnRenamed(k, rKeyName(k)))
    val rBinned = dims.zipWithIndex.foldLeft(
        renamed.withColumn("_graft_rid", monotonically_increasing_id())
          .withColumn("_graft_m", lit(1))) {
      case (df, (d, i)) => df.withColumn(rBinName(i),
        explode_outer(sequence(
          rBinOf(d)(least(col(d.rightStart), col(d.rightEnd))),
          rBinOf(d)(greatest(col(d.rightStart), col(d.rightEnd))))))
    }
    val lBinned = dims.zipWithIndex.foldLeft(
        left.withColumn("_graft_lid", monotonically_increasing_id())
          .withColumn("_graft_lm", lit(1))) { case (df, (d, i)) =>
      df.withColumn(binName(i),
        floor(binSrc(df, d.leftAt) / d.binWidth).cast("long"))
    }
    // condition-resident guard: the count windows partition on the join's
    // own (key, bins…) keys, so their exchanges are the join's own
    val guarded = maxBinSize > 0
    val lG =
      if (!guarded) lBinned
      else lBinned.withColumn("_graft_bnl", count(lit(1)).over(
        Window.partitionBy(
          (keyCols ++ dims.indices.map(binName)).map(col): _*)))
    val rG =
      if (!guarded) rBinned
      else rBinned.withColumn("_graft_bnr", count(lit(1)).over(
        Window.partitionBy((keyCols.map(rKeyName) ++
          dims.indices.map(rBinName)).map(col): _*)))
    val cond = (keyCols.map(k => col(k) === col(rKeyName(k))) ++
      dims.indices.map(i => col(binName(i)) === col(rBinName(i))) ++
      dims.map(d => col(d.leftAt) >= col(d.rightStart) &&
        col(d.leftAt) < col(d.rightEnd)) ++
      (if (!guarded) Nil
       else Seq(col("_graft_bnl") <= maxBinSize,
         col("_graft_bnr") <= maxBinSize))).reduce(_ && _)
    val atHomeR = dims.zipWithIndex.map { case (d, i) =>
      col(rBinName(i)) <=>
        rBinOf(d)(least(col(d.rightStart), col(d.rightEnd)))
    }.reduce(_ && _)
    // matched + unmatched-left rows carry _graft_lm and pass directly;
    // right-only copies survive only when NO copy of their row matched
    // (the count window spans all copies via the pre-explode id) and only
    // from their home bin. Left-present rows key the window by a disjoint
    // negative id image, so they never pile into one window partition.
    val w = Window.partitionBy(
      coalesce(col("_graft_rid"), -col("_graft_lid") - 1))
    val out = lG.join(rG, cond, "full_outer")
      .withColumn("_graft_mc", count(col("_graft_lm")).over(w))
      .filter(col("_graft_lm").isNotNull ||
        (col("_graft_mc") === 0 && atHomeR))
    keyCols.foldLeft(out)((df, k) =>
        df.withColumn(k, coalesce(col(k), col(rKeyName(k)))))
      .drop("_graft_lid", "_graft_rid", "_graft_lm", "_graft_m",
        "_graft_mc", "_graft_bnl", "_graft_bnr")
      .drop(dims.indices.map(binName): _*)
      .drop(dims.indices.map(rBinName): _*)
      .drop(keyCols.map(rKeyName): _*)
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
    *
    * `maxBinSize` is the same hot-bin skew guard as [[rangeJoin]]'s (see
    * its doc for the full trade): cohorts larger than the cap in one
    * (key, bin) are dropped from BOTH sides before the join, bounding
    * per-bin work at `maxBinSize²` instead of B_l × B_r. Matches whose
    * canonical bin falls in a dropped cohort are lost — the cap is sized
    * to engage only on pathological cohorts (boilerplate epoch-zero
    * intervals). `maxBinSize <= 0` skips the guard entirely.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String, binWidth: Long,
      maxBinSize: Long = 10000): DataFrame =
    intervalOverlapJoin(left, right, keyCols,
      Seq(OverlapDim(leftStart, leftEnd, rightStart, rightEnd, binWidth)),
      maxBinSize)

  /** One interval-vs-interval dimension of a multi-dimensional
    * [[intervalOverlapJoin]]: both sides' bound columns and the bin width
    * in their BIN-IMAGE units — native for numerics, epoch MICROS for
    * TIMESTAMP columns (binned via `unix_micros` internally), epoch DAYS
    * for DATE columns (binned via `unix_date`; a micros-scale width on
    * DATE bounds would silently put every row in bin 0). Size near the
    * LONGER side's typical interval length.
    */
  final case class OverlapDim(leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String, binWidth: Long)

  /** Multi-dimensional interval-overlap join: each of `dims` is an
    * independent interval-overlap (e.g. a time overlap AND a value-band
    * overlap), and every dimension contributes its own bin equi-key, so
    * candidate pairs must co-reside in ALL dimensions — without this a
    * second dimension is only a residual predicate filtering the first
    * dimension's (possibly much larger) candidate set. Both sides
    * explode the cross product of their per-dimension bin ranges (size
    * widths near the interval lengths to keep that ≤2 bins per
    * dimension), and each pair is emitted from its per-dimension
    * CANONICAL bin combination — dimension i's bin of
    * `greatest(leftStart_i, rightStart_i)` — which is unique per pair,
    * so multi-bin overlaps never duplicate in any dimension and no dedup
    * shuffle is needed (the 1-D canonical-bin proof applies per
    * dimension independently).
    *
    * `maxBinSize` is shared across the whole (key, bins…) cohort — see
    * the single-dimension overload's doc for the trade. (Scala permits
    * default arguments on only one overload, so this form takes it
    * explicitly; pass 10000 for the default behavior.)
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], dims: Seq[OverlapDim],
      maxBinSize: Long): DataFrame = {
    require(dims.nonEmpty, "intervalOverlapJoin needs at least one dimension")
    dims.foreach(d => require(d.binWidth > 0,
      s"binWidth must be > 0 for $d"))
    val lBounds = dims.flatMap(d => Seq(d.leftStart, d.leftEnd))
    val rBounds = dims.flatMap(d => Seq(d.rightStart, d.rightEnd))
    require(lBounds.toSet.intersect(rBounds.toSet).isEmpty,
      "boundary column names must differ between the two sides")
    dims.foreach(d => requireSameFamily(Seq((left, d.leftStart),
      (left, d.leftEnd), (right, d.rightStart), (right, d.rightEnd)),
      s"intervalOverlapJoin $d"))
    requireGuardCap(maxBinSize)
    def binOf(d: OverlapDim)(c: Column): Column =
      floor(c / d.binWidth).cast("long")
    def binned(df: DataFrame, start: OverlapDim => String,
        end: OverlapDim => String): DataFrame =
      dims.zipWithIndex.foldLeft(df) { case (acc, (d, i)) =>
        acc.withColumn(binName(i),
          explode(sequence(
            binOf(d)(least(binSrc(acc, start(d)), binSrc(acc, end(d)))),
            binOf(d)(greatest(binSrc(acc, start(d)), binSrc(acc, end(d)))))))
      }
    // the canonical bin mixes one bound from each side; their types agree
    // (the overlap predicate compares them cross-side), so the left
    // bound's type picks the numeric image
    def canonSrc(d: OverlapDim)(c: Column): Column =
      binSrcOf(left.schema(d.leftStart).dataType, c)
    val joinKeys = keyCols ++ dims.indices.map(binName)
    val guard = binGuard(joinKeys, maxBinSize, "overlapJoin") _
    guard(binned(left, _.leftStart, _.leftEnd))
      .join(guard(binned(right, _.rightStart, _.rightEnd)), joinKeys)
      .filter(dims.zipWithIndex.map { case (d, i) =>
        col(d.leftStart) < col(d.rightEnd) &&
          col(d.rightStart) < col(d.leftEnd) &&
          col(binName(i)) === binOf(d)(canonSrc(d)(greatest(
            col(d.leftStart), col(d.rightStart))))
      }.reduce(_ && _))
      .drop(dims.indices.map(binName): _*)
  }

  /** Left-outer [[intervalOverlapJoin]]: every left interval survives;
    * left rows overlapping no right interval carry nulls for the right
    * columns.
    *
    * Mechanics beyond the inner form: the left side explodes to several
    * bin copies, so "unmatched" must be decided per ROW, not per copy —
    * a copy in bin b only sees right rows whose pair-canonical bin is b,
    * and a matched row's other copies would otherwise emit spurious null
    * rows. The full overlap + canonical-bin predicate moves into the
    * left-outer join condition, then a count window partitioned by a
    * synthetic per-row id (stamped BEFORE the explode, so all of a row's
    * copies share it) counts each row's matches across ALL its copies:
    * matched rows keep their matches, rows with zero matches anywhere
    * emit exactly once from their HOME bin (the bin of
    * `least(start, end)`, null-safe so null-bound rows — kept by
    * `explode_outer` with a null bin — emit too). Cost vs the inner
    * form: one extra exchange (the window over the 8-byte row id) — the
    * price of outer semantics without a caller-supplied key.
    *
    * The hot-bin guard caps the RIGHT side only (a left-outer join must
    * preserve every left row); over-cap right cohorts lose their matches
    * and those left rows emit as unmatched.
    */
  def intervalOverlapJoinLeftOuter(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String, binWidth: Long,
      maxBinSize: Long = 10000): DataFrame =
    intervalOverlapJoinLeftOuter(left, right, keyCols,
      Seq(OverlapDim(leftStart, leftEnd, rightStart, rightEnd, binWidth)),
      maxBinSize)

  /** Multi-dimensional [[intervalOverlapJoinLeftOuter]] — the left-outer
    * form of the multi-dimension overlap join. Mechanics are the 1-D
    * method's, applied per dimension: the left side explodes the cross
    * product of its per-dimension bin ranges (`explode_outer` per
    * dimension, so a null bound keeps its row with a null bin), matches
    * carry every dimension's bin-equality + overlap + canonical-bin
    * conjunct in the join condition, and a count window over the left's
    * own columns decides unmatched rows, which emit exactly once from
    * their all-dimensions HOME bin combination (each dimension's bin of
    * `least(start, end)`, null-safe). The hot-bin guard caps the RIGHT
    * side only, on the full (key, bins…) cohort.
    */
  def intervalOverlapJoinLeftOuter(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], dims: Seq[OverlapDim],
      maxBinSize: Long): DataFrame = {
    require(dims.nonEmpty,
      "intervalOverlapJoinLeftOuter needs at least one dimension")
    dims.foreach(d => require(d.binWidth > 0,
      s"binWidth must be > 0 for $d"))
    val lBounds = dims.flatMap(d => Seq(d.leftStart, d.leftEnd))
    val rBounds = dims.flatMap(d => Seq(d.rightStart, d.rightEnd))
    require(lBounds.toSet.intersect(rBounds.toSet).isEmpty,
      "boundary column names must differ between the two sides")
    dims.foreach(d => requireSameFamily(Seq((left, d.leftStart),
      (left, d.leftEnd), (right, d.rightStart), (right, d.rightEnd)),
      s"intervalOverlapJoinLeftOuter $d"))
    requireGuardCap(maxBinSize)
    // each dimension's four bound columns share a type family (the
    // overlap predicate compares them cross-side), so the left start's
    // type picks that dimension's numeric image
    def src(d: OverlapDim)(c: Column): Column =
      binSrcOf(left.schema(d.leftStart).dataType, c)
    def binOf(d: OverlapDim)(c: Column): Column =
      floor(src(d)(c) / d.binWidth).cast("long")
    // a synthetic per-row id, added BEFORE the explode so every bin copy
    // of a row shares it, keys the match-count window: an 8-byte key
    // instead of the whole left payload (wide text/embedding rows would
    // otherwise be the exchange key), and always partitionable (a
    // map-typed left column would reject a full-row window, where the
    // vanilla LEFT JOIN this operator replaces accepts it).
    // monotonically_increasing_id is stable only within ONE evaluation:
    // the id is stamped and consumed inside this single linear plan, and
    // must never cross a plan-reuse boundary (a self-join re-evaluating
    // lBinned could re-stamp different ids — localCheckpoint the input
    // first if this operator ever feeds plan reuse)
    val lBinned = dims.zipWithIndex.foldLeft(
        left.withColumn("_graft_lid", monotonically_increasing_id())) {
      case (df, (d, i)) =>
        df.withColumn(binName(i),
          explode_outer(sequence(
            binOf(d)(least(col(d.leftStart), col(d.leftEnd))),
            binOf(d)(greatest(col(d.leftStart), col(d.leftEnd))))))
    }
    val rBinned = dims.zipWithIndex.foldLeft(
        keyCols.foldLeft(right)((df, k) => df.withColumnRenamed(k, rKeyName(k)))) {
        case (df, (d, i)) => df.withColumn(rBinName(i),
          explode(sequence(
            binOf(d)(least(col(d.rightStart), col(d.rightEnd))),
            binOf(d)(greatest(col(d.rightStart), col(d.rightEnd))))))
      }
      .withColumn("_graft_m", lit(1))
    val rGuarded = binGuard(
      keyCols.map(rKeyName) ++ dims.indices.map(rBinName), maxBinSize,
      "overlapJoinOuter")(rBinned)
    val cond = (keyCols.map(k => col(k) === col(rKeyName(k))) ++
      dims.zipWithIndex.flatMap { case (d, i) => Seq(
        col(binName(i)) === col(rBinName(i)),
        col(d.leftStart) < col(d.rightEnd),
        col(d.rightStart) < col(d.leftEnd),
        col(binName(i)) === binOf(d)(greatest(col(d.leftStart),
          col(d.rightStart))))
      }).reduce(_ && _)
    val atHome = dims.zipWithIndex.map { case (d, i) =>
      col(binName(i)) <=> binOf(d)(least(col(d.leftStart), col(d.leftEnd)))
    }.reduce(_ && _)
    val w = Window.partitionBy(col("_graft_lid"))
    lBinned.join(rGuarded, cond, "left_outer")
      .withColumn("_graft_mc", count(col("_graft_m")).over(w))
      .filter(col("_graft_m").isNotNull ||
        (col("_graft_mc") === 0 && atHome))
      .drop("_graft_m", "_graft_mc", "_graft_lid")
      .drop(dims.indices.map(binName): _*)
      .drop(dims.indices.map(rBinName): _*)
      .drop(keyCols.map(rKeyName): _*)
  }

  /** Full-outer [[intervalOverlapJoin]] (single dimension): every left
    * AND every right interval survives; see the `dims` overload.
    */
  def intervalOverlapJoinFullOuter(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String, binWidth: Long,
      maxBinSize: Long = 10000): DataFrame =
    intervalOverlapJoinFullOuter(left, right, keyCols,
      Seq(OverlapDim(leftStart, leftEnd, rightStart, rightEnd, binWidth)),
      maxBinSize)

  /** Full-outer [[intervalOverlapJoin]]: overlapping pairs plus every
    * unmatched interval from BOTH sides, null-extended — vanilla
    * `FULL JOIN ... ON key AND overlap` semantics. Key columns come back
    * USING-style (one coalesced column per key name, as in
    * [[rangeJoinFullOuter]]).
    *
    * Both sides explode to bin copies here, so BOTH need the
    * once-per-row unmatched emission of [[intervalOverlapJoinLeftOuter]]:
    * each side stamps a synthetic 8-byte id before its explode
    * (`explode_outer` — null-bound rows keep a null-bin copy and must
    * surface as unmatched), matched pairs emit once from their canonical
    * bin combination, and each side's fully-unmatched rows emit once from
    * their HOME bins, decided by a count window over that side's id. The
    * two windows key on `coalesce(own id, negative image of the other
    * side's id)`, disjoint namespaces, so neither window concentrates the
    * other side's rows into one partition. Ids are consumed within this
    * single linear plan (monotonically_increasing_id is
    * recomputation-sensitive — do not feed this operator into plan
    * reuse).
    *
    * The hot-bin guard rides the JOIN CONDITION (as in
    * [[rangeJoinFullOuter]]): over-cap (key, bins…) cohorts match nothing
    * and surface as unmatched — no rows are ever lost. Cost vs the inner
    * form: two extra exchanges (one id window per side) — the price of
    * full-outer semantics with both sides exploding.
    */
  def intervalOverlapJoinFullOuter(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], dims: Seq[OverlapDim],
      maxBinSize: Long): DataFrame = {
    require(dims.nonEmpty,
      "intervalOverlapJoinFullOuter needs at least one dimension")
    dims.foreach(d => require(d.binWidth > 0,
      s"binWidth must be > 0 for $d"))
    val lBounds = dims.flatMap(d => Seq(d.leftStart, d.leftEnd))
    val rBounds = dims.flatMap(d => Seq(d.rightStart, d.rightEnd))
    require(lBounds.toSet.intersect(rBounds.toSet).isEmpty,
      "boundary column names must differ between the two sides")
    dims.foreach(d => requireSameFamily(Seq((left, d.leftStart),
      (left, d.leftEnd), (right, d.rightStart), (right, d.rightEnd)),
      s"intervalOverlapJoinFullOuter $d"))
    requireGuardCap(maxBinSize)
    def src(d: OverlapDim)(c: Column): Column =
      binSrcOf(left.schema(d.leftStart).dataType, c)
    def binOf(d: OverlapDim)(c: Column): Column =
      floor(src(d)(c) / d.binWidth).cast("long")
    val lBinned = dims.zipWithIndex.foldLeft(
        left.withColumn("_graft_lid", monotonically_increasing_id())
          .withColumn("_graft_lm", lit(1))) { case (df, (d, i)) =>
      df.withColumn(binName(i),
        explode_outer(sequence(
          binOf(d)(least(col(d.leftStart), col(d.leftEnd))),
          binOf(d)(greatest(col(d.leftStart), col(d.leftEnd))))))
    }
    val rBinned = dims.zipWithIndex.foldLeft(
        keyCols.foldLeft(right)(
            (df, k) => df.withColumnRenamed(k, rKeyName(k)))
          .withColumn("_graft_rid", monotonically_increasing_id())
          .withColumn("_graft_m", lit(1))) { case (df, (d, i)) =>
      df.withColumn(rBinName(i),
        explode_outer(sequence(
          binOf(d)(least(col(d.rightStart), col(d.rightEnd))),
          binOf(d)(greatest(col(d.rightStart), col(d.rightEnd))))))
    }
    val guarded = maxBinSize > 0
    val lG =
      if (!guarded) lBinned
      else lBinned.withColumn("_graft_bnl", count(lit(1)).over(
        Window.partitionBy(
          (keyCols ++ dims.indices.map(binName)).map(col): _*)))
    val rG =
      if (!guarded) rBinned
      else rBinned.withColumn("_graft_bnr", count(lit(1)).over(
        Window.partitionBy((keyCols.map(rKeyName) ++
          dims.indices.map(rBinName)).map(col): _*)))
    val cond = (keyCols.map(k => col(k) === col(rKeyName(k))) ++
      dims.zipWithIndex.flatMap { case (d, i) => Seq(
        col(binName(i)) === col(rBinName(i)),
        col(d.leftStart) < col(d.rightEnd),
        col(d.rightStart) < col(d.leftEnd),
        col(binName(i)) === binOf(d)(greatest(col(d.leftStart),
          col(d.rightStart))))
      } ++
      (if (!guarded) Nil
       else Seq(col("_graft_bnl") <= maxBinSize,
         col("_graft_bnr") <= maxBinSize))).reduce(_ && _)
    val atHomeL = dims.zipWithIndex.map { case (d, i) =>
      col(binName(i)) <=> binOf(d)(least(col(d.leftStart), col(d.leftEnd)))
    }.reduce(_ && _)
    val atHomeR = dims.zipWithIndex.map { case (d, i) =>
      col(rBinName(i)) <=>
        binOf(d)(least(col(d.rightStart), col(d.rightEnd)))
    }.reduce(_ && _)
    val wL = Window.partitionBy(
      coalesce(col("_graft_lid"), -col("_graft_rid") - 1))
    val wR = Window.partitionBy(
      coalesce(col("_graft_rid"), -col("_graft_lid") - 1))
    val out = lG.join(rG, cond, "full_outer")
      .withColumn("_graft_mcl", count(col("_graft_m")).over(wL))
      .withColumn("_graft_mcr", count(col("_graft_lm")).over(wR))
      .filter(
        (col("_graft_lm").isNotNull && col("_graft_m").isNotNull) ||
        (col("_graft_m").isNull && col("_graft_mcl") === 0 && atHomeL) ||
        (col("_graft_lm").isNull && col("_graft_mcr") === 0 && atHomeR))
    keyCols.foldLeft(out)((df, k) =>
        df.withColumn(k, coalesce(col(k), col(rKeyName(k)))))
      .drop("_graft_lid", "_graft_rid", "_graft_lm", "_graft_m",
        "_graft_mcl", "_graft_mcr", "_graft_bnl", "_graft_bnr")
      .drop(dims.indices.map(binName): _*)
      .drop(dims.indices.map(rBinName): _*)
      .drop(keyCols.map(rKeyName): _*)
  }
}
