package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.SparkContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Observability for the skew guards: the hot-bin cap of the binned join
  * family ([[Joins.rangeJoin]] etc.) and the hot-bucket caps of
  * [[Dedup.minhashNearDuplicates]] / [[Dedup.simhashNearDuplicates]] DROP
  * over-cap cohorts by design — a documented survival trade. An operator
  * that discards rows must say how many: every drop increments two named
  * `LongAccumulator`s (visible in the Spark UI per stage, and readable
  * here), and the first drop in each executor JVM emits one warn line, so
  * a user debugging "missing matches" has something to find.
  *
  * Attribution: each guarded operator passes a `tag` ("rangeJoin",
  * "minhash", …), which registers a SECOND accumulator pair suffixed with
  * the tag (`graft.skewGuard.droppedRows.minhash`). The untagged pair
  * stays the session-wide total, so a dashboard watching one number keeps
  * working — but when two guarded operators run in ONE query, their
  * tagged pairs count independently and the drop source is attributable
  * (read them via `of(sc, tag)`). The warn line names the tag.
  *
  * Accumulator caveat (standard Spark semantics): updates happen inside a
  * transformation, so task retries/speculation can overcount. The counters
  * are diagnostics — "did the guard fire, roughly how hard" — not exact
  * row accounting; the RESULT is unaffected (the keep/drop decision is a
  * pure function of the cohort count).
  */
object GuardMetrics {

  /** Accumulator names as they appear in the Spark UI; a tagged pair
    * appends `.tag`.
    */
  val DroppedRowsName = "graft.skewGuard.droppedRows"
  val DroppedCohortsName = "graft.skewGuard.droppedCohorts"

  private def taggedName(base: String, tag: String): String =
    if (tag.isEmpty) base else s"$base.$tag"

  final case class Counters(droppedRows: LongAccumulator,
      droppedCohorts: LongAccumulator) {
    /** Driver-side zeroing between runs (tests, notebook re-runs). */
    def reset(): Unit = { droppedRows.reset(); droppedCohorts.reset() }
  }

  // one pair of counters per (SparkContext, tag), registered lazily on
  // first guarded operator; TrieMap for lock-free concurrent builders
  private val registry = TrieMap.empty[(SparkContext, String), Counters]

  /** The session-wide totals (every guard adds here, tagged or not). */
  def of(sc: SparkContext): Counters = of(sc, "")

  /** One operator's own counters — independent of every other tag. */
  def of(sc: SparkContext, tag: String): Counters =
    registry.getOrElseUpdate((sc, tag), Counters(
      sc.longAccumulator(taggedName(DroppedRowsName, tag)),
      sc.longAccumulator(taggedName(DroppedCohortsName, tag))))

  /** Zero every pair registered on this context (tagged and untagged). */
  def resetAll(sc: SparkContext): Unit =
    registry.foreach { case ((c, _), ctr) => if (c eq sc) ctr.reset() }

  // once per JVM per tag, not per row: executors log the first drop each
  // guard sees and point at the accumulators; anything louder floods the
  // executor log on exactly the pathological inputs the guard exists for
  private val warned = TrieMap.empty[String, Unit]
  private def warnOnce(cap: Long, tag: String): Unit =
    if (warned.putIfAbsent(tag, ()).isEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "graft: skew guard '{}' dropped an over-cap cohort (cap={}); see " +
          "accumulators '{}' / '{}' for totals. Raise the cap or pass the " +
          "<=0 sentinel to keep such cohorts (at quadratic cost).",
        if (tag.isEmpty) "(untagged)" else tag, cap.toString,
        taggedName(DroppedRowsName, tag),
        taggedName(DroppedCohortsName, tag))

  /** Shared guard body: drop every row of a `keys` cohort larger than
    * `cap`, counting dropped rows and cohorts under `tag` (and in the
    * session-wide untagged pair). The count/row_number window partitions
    * AND sorts on `keys` — for the binned joins that is the join's own
    * shuffle+sort, so the guard adds no exchange.
    *
    * The keep decision is the same pure `cohort size <= cap` comparison
    * as before, evaluated codegen'd as the LEFT side of a short-circuit
    * OR — on clean (under-cap) data the recording UDF on the right is
    * NEVER invoked, so observability costs nothing on the hot path. Only
    * over-cap rows fall through to the UDF, whose sole job is the
    * accumulator side effect (one `add` of the whole cohort size from
    * the cohort's first row, per the row_number) before returning false.
    */
  def capCohorts(df: DataFrame, keys: Seq[Column], cap: Long,
      tag: String = ""): DataFrame = {
    if (cap <= 0) df
    else {
      val sc = df.sparkSession.sparkContext
      val total = of(sc)
      val own = if (tag.isEmpty) None else Some(of(sc, tag))
      val w = Window.partitionBy(keys: _*).orderBy(keys: _*)
      val recordDrop = udf { (n: Long, rn: Long) =>
        if (rn == 1L) { // one arbitrary row speaks for the whole cohort
          total.droppedRows.add(n)
          total.droppedCohorts.add(1L)
          own.foreach { c =>
            c.droppedRows.add(n)
            c.droppedCohorts.add(1L)
          }
          warnOnce(cap, tag)
        }
        false
      }
      df.withColumn("_graft_bn", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("_graft_brn", row_number().over(w))
        .filter(col("_graft_bn") <= cap ||
          recordDrop(col("_graft_bn"), col("_graft_brn")))
        .drop("_graft_bn", "_graft_brn")
    }
  }
}
