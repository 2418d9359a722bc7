package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.streaming.Streams

/** The streaming join family under the RocksDB state store provider —
  * the 100 TB-credible backend: the default HDFSBackedStateStoreProvider
  * keeps every version of the working state on executor HEAP (bounded
  * here by watermark + declared-max bands, but still heap), while
  * RocksDB keeps it on native memory + local disk with incremental
  * checkpointing, which is what a production deployment with large key
  * cardinality runs. Same operators, same contracts — the provider is
  * pure config:
  *
  * {{{
  *   spark.conf.set("spark.sql.streaming.stateStore.providerClass",
  *     "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  * }}}
  *
  * (read per QUERY at start, so it can be flipped between queries in one
  * session; `rocksdbjni` ships with stock Spark). Each test asserts the
  * provider actually engaged — `stateOperators.customMetrics` carries
  * `rocksdb*` entries only under RocksDB — so a config regression fails
  * loudly instead of silently re-testing the default heap provider.
  *
  * Covers each distinct state-machine shape once: the native
  * stream-stream interval join (banded range join, inner + outer
  * emission), the two-sided capped overlap join, and the
  * flatMapGroupsWithState as-of paths (backward with snapshot bootstrap;
  * nearest with its event-time-timeout horizon). Exhaustive semantics
  * stay in StreamsSpec/StreamsFuzzSpec under the default provider — the
  * operators cannot observe the provider, so one green pass per shape
  * here proves the backend swap, not re-proving the algebra.
  */
class StreamsRocksDbSpec extends SparkTestBase with BeforeAndAfterAll {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private var previous: Option[String] = None

  override def beforeAll(): Unit = {
    super.beforeAll()
    previous = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
  }

  override def afterAll(): Unit = {
    previous match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
    super.afterAll()
  }

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  /** Every state operator of the query reported RocksDB-specific custom
    * metrics — the provider really backed this query's state.
    */
  private def assertRocksDbEngaged(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val ops = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
    assert(ops.nonEmpty, "query reported no state operators")
    import scala.jdk.CollectionConverters._
    assert(ops.exists(_.customMetrics.keySet.asScala
        .exists(_.startsWith("rocksdb"))),
      "no rocksdb* custom metrics — the RocksDB provider did not engage")
  }

  test("banded range join (variable windows, left_outer) runs on RocksDB " +
      "state: matches join, outer row emits at watermark close, length " +
      "cap still counts") {
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(String, java.sql.Timestamp,
      java.sql.Timestamp, Long)]
    val q = Streams.rangeJoinStream(
        lmem.toDF().toDF("k", "lts", "lid"),
        rmem.toDF().toDF("k", "start", "end", "rid"),
        keys = Seq("k"), leftTs = "lts", rightStart = "start",
        rightEnd = "end", maxWindowMs = 3600 * 1000L,
        watermark = "10 minutes", joinType = "left_outer")
      .select("k", "lid", "rid")
      .writeStream.format("memory").queryName("rocks_range")
      .outputMode("append").start()
    try {
      lmem.addData(
        ("u1", t("2024-01-01 10:15:00"), 1L),  // inside u1's window
        ("u2", t("2024-01-01 10:15:00"), 2L))  // no right ever → outer
      rmem.addData(
        ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 10:30:00"), 10L),
        // over-cap window: excluded by the guard, never matches
        ("u2", t("2024-01-01 10:00:00"), t("2024-01-01 16:00:00"), 11L))
      q.processAllAvailable()
      // push both watermarks far past u2's match band → outer row emits
      lmem.addData(("wm", t("2024-01-02 12:00:00"), 99L))
      rmem.addData(
        ("wm", t("2024-01-02 12:00:00"), t("2024-01-02 12:01:00"), 98L))
      q.processAllAvailable()
      val rows = spark.table("rocks_range")
        .select("k", "lid", "rid")
        .as[(String, Long, Option[Long])].collect().toSet
      assert(rows.contains(("u1", 1L, Some(10L))), s"match missing: $rows")
      assert(rows.contains(("u2", 2L, None)),
        s"outer row missing (guard must exclude u2's over-cap window " +
          s"AND the watermark must null-extend the left): $rows")
      assertRocksDbEngaged(q)
    } finally q.stop()
  }

  test("capped overlap join (full_outer) runs on RocksDB state") {
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[(String, java.sql.Timestamp,
      java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(String, java.sql.Timestamp,
      java.sql.Timestamp, Long)]
    val q = Streams.overlapJoinStream(
        lmem.toDF().toDF("k", "l_lo", "l_hi", "lid"),
        rmem.toDF().toDF("k", "r_lo", "r_hi", "rid"),
        key = "k", leftStart = "l_lo", leftEnd = "l_hi",
        rightStart = "r_lo", rightEnd = "r_hi",
        maxLeftLenMs = 3600 * 1000L, maxRightLenMs = 3600 * 1000L,
        watermark = "10 minutes", joinType = "full_outer")
      .select("k", "lid", "rid")
      .writeStream.format("memory").queryName("rocks_overlap")
      .outputMode("append").start()
    try {
      lmem.addData(
        ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 10:30:00"), 1L),
        ("u2", t("2024-01-01 10:00:00"), t("2024-01-01 10:20:00"), 2L))
      rmem.addData(
        ("u1", t("2024-01-01 10:15:00"), t("2024-01-01 10:45:00"), 10L),
        ("u3", t("2024-01-01 10:40:00"), t("2024-01-01 10:50:00"), 30L))
      q.processAllAvailable()
      lmem.addData(
        ("wm", t("2024-01-02 12:00:00"), t("2024-01-02 12:01:00"), 99L))
      rmem.addData(
        ("wm", t("2024-01-02 12:00:00"), t("2024-01-02 12:01:00"), 98L))
      q.processAllAvailable()
      val rows = spark.table("rocks_overlap")
        .as[(String, Option[Long], Option[Long])].collect().toSet
      assert(rows.contains(("u1", Some(1L), Some(10L))), s"got $rows")
      assert(rows.contains(("u2", Some(2L), None)),
        s"unmatched left must null-extend: $rows")
      assert(rows.contains(("u3", None, Some(30L))),
        s"unmatched right must survive full_outer with its key: $rows")
      assertRocksDbEngaged(q)
    } finally q.stop()
  }

  test("bootstrapped backward asOfStream (flatMapGroupsWithState) runs " +
      "on RocksDB state") {
    implicit val sqlCtx = spark.sqlContext
    val snapshot = Seq(
      ("A", t("2024-01-01 09:00:00"), 2.0),
      ("C", t("2024-01-01 06:00:00"), 9.0))
      .toDF("sym", "ts", "price")
    val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = Streams.asOfStream(
        lmem.toDF().toDF("sym", "ts", "tid"),
        rmem.toDF().toDF("sym", "ts", "price"),
        keyCols = Seq("sym"), tsCol = "ts", valCols = Seq("price"),
        toleranceMs = None, prefix = "asof_", initialSnapshot = snapshot)
      .select("sym", "tid", "asof_price")
      .writeStream.format("memory").queryName("rocks_asof")
      .outputMode("append").start()
    try {
      lmem.addData(
        ("A", t("2024-01-01 09:45:00"), 101L), // snapshot state
        ("B", t("2024-01-01 09:50:00"), 102L)) // cold key
      q.processAllAvailable()
      rmem.addData(("A", t("2024-01-01 10:00:00"), 3.0))
      lmem.addData(("A", t("2024-01-01 10:15:00"), 103L)) // streamed right
      q.processAllAvailable()
      val rows = spark.table("rocks_asof")
        .as[(String, Long, Option[Double])].collect().toSet
      assert(rows == Set(
        ("A", 101L, Some(2.0)), ("B", 102L, None),
        ("A", 103L, Some(3.0))), s"got $rows")
      assertRocksDbEngaged(q)
    } finally q.stop()
  }

  test("nearest asOfStream with its event-time-timeout horizon runs on " +
      "RocksDB state") {
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = Streams.asOfStream(
        lmem.toDF().toDF("sym", "ts", "tid"),
        rmem.toDF().toDF("sym", "ts", "price"),
        keyCols = Seq("sym"), tsCol = "ts", valCols = Seq("price"),
        toleranceMs = Some(30L * 60 * 1000), prefix = "asof_",
        direction = "nearest", watermark = "0 seconds")
      .select("sym", "tid", "asof_price")
      .writeStream.format("memory").queryName("rocks_nearest")
      .outputMode("append").start()
    try {
      // one round for both sides: the zero-delay watermark advances with
      // every batch, so a right delivered a round later would be late
      lmem.addData(
        ("A", t("2024-01-01 09:30:00"), 101L), // forward quote 15 min later
        ("B", t("2024-01-01 09:45:00"), 102L)) // no quote → horizon None
      rmem.addData(("A", t("2024-01-01 09:45:00"), 2.0))
      q.processAllAvailable()
      // push the watermark past B's 30-minute horizon → timeout emission
      rmem.addData(("wm", t("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("rocks_nearest")
        .as[(String, Long, Option[Double])].collect().toSet
      assert(rows.contains(("A", 101L, Some(2.0))), s"got $rows")
      assert(rows.contains(("B", 102L, None)),
        s"horizon timeout must resolve B to None: $rows")
      assertRocksDbEngaged(q)
    } finally q.stop()
  }
}
