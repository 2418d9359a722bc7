package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams
import graft.streaming.Streams.Event

class StreamsSpec extends SparkTestBase {
  import spark.implicits._

  test("tagStream ingests corpus metadata incrementally, exactly once") {
    val dir = Files.createTempDirectory("graft-stream").toFile
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    def addMeta(id: String, tags: String): Unit =
      Files.write(new java.io.File(dir, s"meta_$id.json").toPath,
        s"""{"tags": $tags}""".getBytes)
    addMeta("a", """["t1"]""")
    val q = Streams.tagStream(spark, dir.getAbsolutePath)
      .writeStream.format("memory").queryName("tags_inc")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tags_inc").count() == 1)
      // new file arrives → picked up incrementally; old one NOT re-read
      addMeta("b", """[]""")
      q.processAllAvailable()
      val rows = spark.table("tags_inc")
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
        .toMap
      assert(rows.keySet == Set("a", "b"))
      assert(rows("b") == List("untagged"))
    } finally q.stop()
  }

  test("hourlyEventCounts aggregates tumbling windows on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streams.hourlyEventCounts(events)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData(
        (t("2024-01-01 10:05:00"), "click", 1.0),
        (t("2024-01-01 10:55:00"), "click", 2.0),
        (t("2024-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 11:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("dedupStream drops re-delivered keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = Streams.dedupStream(
        mem.toDF().toDF("id", "ts", "payload"), Seq("id"), "ts")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData((1L, t("2024-01-01 10:00:00"), "first"),
        (1L, t("2024-01-01 10:00:05"), "redelivery"),
        (2L, t("2024-01-01 10:00:10"), "other"))
      q.processAllAvailable()
      mem.addData((1L, t("2024-01-01 10:10:00"), "still dup"))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream")
        .collect().map(r => r.getLong(0) -> r.getString(2))
      assert(rows.length == 2)
      assert(rows.toMap == Map(1L -> "first", 2L -> "other"))
    } finally q.stop()
  }

  test("asOfStream enriches left events with latest preceding right state") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.Tagged
    val mem = MemoryStream[Tagged]
    val q = Streams.asOfStream(mem.toDS())
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      // batch 1: right@100=7, left@50 (before any right → None),
      // left@150 (→ 7); right rows apply first at equal ts
      mem.addData(
        Tagged(1L, 100L, isRight = true, 7.0),
        Tagged(1L, 50L, isRight = false, 1.0),
        Tagged(1L, 150L, isRight = false, 2.0),
        Tagged(2L, 10L, isRight = false, 9.0)) // other key, no right
      q.processAllAvailable()
      // batch 2: state carries right@100 across batches; newer right
      // supersedes it for later lefts
      mem.addData(
        Tagged(1L, 200L, isRight = false, 3.0),
        Tagged(1L, 300L, isRight = true, 8.0),
        Tagged(1L, 350L, isRight = false, 4.0))
      q.processAllAvailable()
      val rows = spark.table("asof_stream").as[Streams.Enriched]
        .collect().map(e => (e.key, e.tsMs) -> e.asofValue).toMap
      assert(rows((1L, 50L)).isEmpty)
      assert(rows((1L, 150L)).contains(7.0))
      assert(rows((2L, 10L)).isEmpty)
      assert(rows((1L, 200L)).contains(7.0))
      assert(rows((1L, 350L)).contains(8.0))
      assert(rows.size == 5)
    } finally q.stop()
  }

  test("asOfStream tolerance: stale retained state yields None, " +
      "inclusive at the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.Tagged
    val mem = MemoryStream[Tagged]
    val q = Streams.asOfStream(mem.toDS(), toleranceMs = Some(100L))
      .writeStream.format("memory").queryName("asof_tol_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        Tagged(1L, 100L, isRight = true, 7.0),
        Tagged(1L, 150L, isRight = false, 1.0), // 50 <= 100 → enriched
        Tagged(1L, 200L, isRight = false, 2.0), // exactly 100 → enriched
        Tagged(1L, 201L, isRight = false, 3.0)) // 101 > 100 → None
      q.processAllAvailable()
      val rows = spark.table("asof_tol_stream").as[Streams.Enriched]
        .collect().map(e => e.tsMs -> e.asofValue).toMap
      assert(rows(150L).contains(7.0))
      assert(rows(200L).contains(7.0), "horizon must be inclusive")
      assert(rows(201L).isEmpty, "stale state must not enrich")
    } finally q.stop()
  }

  test("rangeJoinStream parity: equals the batch Joins.rangeJoin on the " +
      "same fixture, across micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // left events and right window-starts (1-hour windows), two keys,
    // one left event outside every window, one right window matching two
    // left events
    // roughly event-time ordered: the second micro-batch must not carry
    // rows older than the first batch's watermark (max ts − 10 min), or
    // the join drops them as late — correct streaming semantics, but not
    // what this parity fixture is probing
    val lfix = Seq(
      ("u1", t("2024-01-01 10:15:00"), 1L),
      ("u2", t("2024-01-01 10:30:00"), 4L),
      ("u3", t("2024-01-01 10:30:00"), 5L), // key with no windows
      ("u1", t("2024-01-01 10:45:00"), 2L),
      ("u1", t("2024-01-01 13:00:00"), 3L)) // no window
    val rfix = Seq(
      ("u1", t("2024-01-01 10:00:00"), 10L),
      ("u1", t("2024-01-01 10:30:00"), 11L),
      ("u2", t("2024-01-01 10:00:00"), 12L),
      ("u2", t("2024-01-01 11:00:00"), 13L)) // matches nothing
    val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val q = Streams.rangeJoinStream(
        lmem.toDF().toDF("k", "lts", "lid"),
        rmem.toDF().toDF("k", "rts", "rid"),
        key = "k", leftTs = "lts", rightTs = "rts",
        windowMs = 3600 * 1000L)
      .select("lid", "rid")
      .writeStream.format("memory").queryName("range_stream")
      .outputMode("append").start()
    val streamed = try {
      // right windows land first, left events split across two batches —
      // the join must still pair across the batch boundary
      rmem.addData(rfix: _*)
      lmem.addData(lfix.take(4): _*)
      q.processAllAvailable()
      lmem.addData(lfix.drop(4): _*)
      q.processAllAvailable()
      spark.table("range_stream").as[(Long, Long)].collect().toSet
    } finally q.stop()
    val batch = graft.operators.Joins.rangeJoin(
        lfix.toDF("k", "lts", "lid"),
        rfix.toDF("k", "rts", "rid")
          .withColumn("rend", $"rts" + expr("INTERVAL '1' HOUR")),
        Seq("k"), "lts", "rts", "rend", binWidth = 3600L * 1000000)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, 10L), (2L, 10L), (2L, 11L), (4L, 12L)))
  }

  test("rangeJoinStream left_outer emits unmatched events once the " +
      "watermark closes their window") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val q = Streams.rangeJoinStream(
        lmem.toDF().toDF("k", "lts", "lid"),
        rmem.toDF().toDF("k", "rts", "rid"),
        key = "k", leftTs = "lts", rightTs = "rts",
        windowMs = 3600 * 1000L, watermark = "10 minutes",
        joinType = "left_outer")
      .select("lid", "rid")
      .writeStream.format("memory").queryName("range_stream_outer")
      .outputMode("append").start()
    try {
      rmem.addData(("u1", t("2024-01-01 10:00:00"), 10L))
      lmem.addData(
        ("u1", t("2024-01-01 10:15:00"), 1L),  // matches 10
        ("u2", t("2024-01-01 10:20:00"), 2L))  // no window for u2
      q.processAllAvailable()
      // far-future rows on BOTH streams push the watermarks past lid 2's
      // match window, forcing its null row out of the state store
      rmem.addData(("u9", t("2024-01-02 12:00:00"), 99L))
      lmem.addData(("u9", t("2024-01-02 12:00:30"), 9L))
      q.processAllAvailable()
      val rows = spark.table("range_stream_outer")
        .as[(Long, Option[Long])].collect().toSet
      assert(rows.contains((1L, Some(10L))), s"matched row missing: $rows")
      assert(rows.contains((2L, None)),
        s"unmatched left row never emitted: $rows")
    } finally q.stop()
  }

  test("rangeJoinStream full_outer: unmatched BOTH-side emission once " +
      "the watermark closes, and parity with the batch " +
      "Joins.rangeJoinFullOuter") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: matched pair; u3: left event with no window (unmatched left);
    // u2: window no event falls into (unmatched RIGHT — the side
    // left_outer drops); u9: far-future matched pair that pushes both
    // watermarks past the Jan-1 windows so the unmatched rows must leave
    // the state store
    val lfix = Seq(
      ("u1", t("2024-01-01 10:15:00"), 1L),
      ("u3", t("2024-01-01 10:30:00"), 3L),
      ("u9", t("2024-01-02 12:00:30"), 9L))
    val rfix = Seq(
      ("u1", t("2024-01-01 10:00:00"), 10L),
      ("u2", t("2024-01-01 10:00:00"), 12L),
      ("u9", t("2024-01-02 12:00:00"), 99L))
    val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val q = Streams.rangeJoinStream(
        lmem.toDF().toDF("k", "lts", "lid"),
        rmem.toDF().toDF("k", "rts", "rid"),
        key = "k", leftTs = "lts", rightTs = "rts",
        windowMs = 3600 * 1000L, watermark = "10 minutes",
        joinType = "full_outer")
      .select("k", "lid", "rid")
      .writeStream.format("memory").queryName("range_stream_full")
      .outputMode("append").start()
    val streamed = try {
      rmem.addData(rfix.take(2): _*)
      lmem.addData(lfix.take(2): _*)
      q.processAllAvailable()
      rmem.addData(rfix.drop(2): _*)
      lmem.addData(lfix.drop(2): _*)
      q.processAllAvailable()
      spark.table("range_stream_full")
        .as[(String, Option[Long], Option[Long])].collect().toSet
    } finally q.stop()
    assert(streamed.contains(("u2", None, Some(12L))),
      s"unmatched RIGHT row never emitted: $streamed")
    assert(streamed.contains(("u3", Some(3L), None)),
      s"unmatched LEFT row never emitted: $streamed")
    val batch = graft.operators.Joins.rangeJoinFullOuter(
        lfix.toDF("k", "lts", "lid"),
        rfix.toDF("k", "rts", "rid")
          .withColumn("rend", $"rts" + expr("INTERVAL '1' HOUR")),
        Seq("k"), "lts", "rts", "rend", binWidth = 3600L * 1000000)
      .select("k", "lid", "rid")
      .as[(String, Option[Long], Option[Long])].collect().toSet
    assert(streamed == batch,
      s"stream/batch divergence:\n stream $streamed\n batch  $batch")
  }

  test("variable-window rangeJoinStream parity across " +
      "inner/left_outer/full_outer: equals the batch rangeJoin twins, " +
      "over-length windows excluded") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val twoH = 2 * 3600 * 1000L
    // windows of DIFFERENT lengths (15 min and 90 min) — the shape the
    // fixed-windowMs form cannot express; rid 99 is a 5-hour window
    // beyond the declared cap (excluded by contract); u2 left and u4
    // right are unmatched; u9 pushes both watermarks
    val lfix = Seq(
      ("u1", t("2024-01-01 10:05:00"), 1L),  // in rid 10's 15-min window
      ("u1", t("2024-01-01 11:00:00"), 2L),  // in rid 11's 90-min window
      ("u2", t("2024-01-01 10:00:00"), 3L),  // no windows for u2
      ("u9", t("2024-01-02 12:00:30"), 9L))
    val nullTs = null.asInstanceOf[java.sql.Timestamp]
    val rfix = Seq(
      ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 10:15:00"), 10L),
      ("u1", t("2024-01-01 10:30:00"), t("2024-01-01 12:00:00"), 11L),
      ("u4", t("2024-01-01 10:00:00"), t("2024-01-01 10:45:00"), 12L),
      ("u1", t("2024-01-01 05:00:00"), t("2024-01-01 10:00:00"), 99L),
      ("u6", t("2024-01-01 10:00:00"), nullTs, 13L), // null end: matches
      // nothing, must surface unmatched under full_outer (batch contract)
      ("u9", t("2024-01-02 12:00:00"), t("2024-01-02 12:30:00"), 90L))
    def streamed(joinType: String): Set[(String, Option[Long], Option[Long])] = {
      val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
      val rmem = MemoryStream[(String, java.sql.Timestamp,
        java.sql.Timestamp, Long)]
      val name = s"varwin_stream_$joinType"
      val q = Streams.rangeJoinStream(
          lmem.toDF().toDF("k", "lts", "lid"),
          rmem.toDF().toDF("k", "r_lo", "r_hi", "rid"),
          key = "k", leftTs = "lts", rightStart = "r_lo", rightEnd = "r_hi",
          maxWindowMs = twoH, watermark = "10 minutes", joinType = joinType)
        .select("k", "lid", "rid")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        rmem.addData(rfix.take(5): _*)
        lmem.addData(lfix.take(3): _*)
        q.processAllAvailable()
        rmem.addData(rfix.drop(5): _*)
        lmem.addData(lfix.drop(3): _*)
        q.processAllAvailable()
        spark.table(name)
          .as[(String, Option[Long], Option[Long])].collect().toSet
      } finally q.stop()
    }
    val lbatch = lfix.toDF("k", "lts", "lid")
    val rbatch = rfix.filterNot(_._4 == 99L).toDF("k", "r_lo", "r_hi", "rid")
    val micros1h = 3600L * 1000000
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "lid", "rid")
      .as[(String, Option[Long], Option[Long])].collect().toSet
    val inner = streamed("inner")
    assert(inner == asSet(graft.operators.Joins.rangeJoin(
      lbatch, rbatch, Seq("k"), "lts", "r_lo", "r_hi", micros1h)),
      s"inner diverged: $inner")
    assert(!inner.exists(_._3.contains(99L)),
      "an over-length window leaked into the stream output")
    val lo = streamed("left_outer")
    assert(lo == asSet(graft.operators.Joins.rangeJoinLeftOuter(
      lbatch, rbatch, Seq("k"), "lts", "r_lo", "r_hi", micros1h)),
      s"left_outer diverged: $lo")
    assert(lo.contains(("u2", Some(3L), None)),
      s"unmatched left row missing: $lo")
    val fo = streamed("full_outer")
    assert(fo == asSet(graft.operators.Joins.rangeJoinFullOuter(
      lbatch, rbatch, Seq("k"), "lts", "r_lo", "r_hi", micros1h)),
      s"full_outer diverged: $fo")
    assert(fo.contains(("u4", None, Some(12L))),
      s"unmatched right row missing: $fo")
  }

  test("composite-key streaming joins: two equality keys match the batch " +
      "twins, including full_outer key coalescing on both key columns") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // (region, user) composite key: same user in two regions must NOT
    // cross-match; an unmatched right carries BOTH its key parts through
    // the full_outer coalesce
    val lfix = Seq(
      ("eu", "u1", t("2024-01-01 10:15:00"), 1L),
      ("us", "u1", t("2024-01-01 10:15:00"), 2L), // u1 but wrong region for rid 11
      ("eu", "u2", t("2024-01-01 10:20:00"), 3L), // no window at all
      ("eu", "u9", t("2024-01-02 12:00:30"), 9L))
    val rfix = Seq(
      ("eu", "u1", t("2024-01-01 10:00:00"), 10L),
      ("ap", "u1", t("2024-01-01 10:00:00"), 11L), // unmatched right
      ("eu", "u9", t("2024-01-02 12:00:00"), 90L))
    val lmem = MemoryStream[(String, String, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(String, String, java.sql.Timestamp, Long)]
    val q = Streams.rangeJoinStream(
        lmem.toDF().toDF("region", "user", "lts", "lid"),
        rmem.toDF().toDF("region", "user", "rts", "rid"),
        keys = Seq("region", "user"), leftTs = "lts", rightTs = "rts",
        windowMs = 3600 * 1000L, watermark = "10 minutes",
        joinType = "full_outer")
      .select("region", "user", "lid", "rid")
      .writeStream.format("memory").queryName("composite_stream")
      .outputMode("append").start()
    val streamed = try {
      rmem.addData(rfix.take(2): _*)
      lmem.addData(lfix.take(3): _*)
      q.processAllAvailable()
      rmem.addData(rfix.drop(2): _*)
      lmem.addData(lfix.drop(3): _*)
      q.processAllAvailable()
      spark.table("composite_stream")
        .as[(Option[String], Option[String], Option[Long], Option[Long])]
        .collect().toSet
    } finally q.stop()
    assert(streamed.contains((Some("ap"), Some("u1"), None, Some(11L))),
      s"unmatched right lost its composite key: $streamed")
    assert(!streamed.exists(r => r._3.contains(2L) && r._4.contains(10L)),
      s"composite key leaked across regions: $streamed")
    val batch = graft.operators.Joins.rangeJoinFullOuter(
        lfix.toDF("region", "user", "lts", "lid"),
        rfix.toDF("region", "user", "rts", "rid")
          .withColumn("rend", $"rts" + expr("INTERVAL '1' HOUR")),
        Seq("region", "user"), "lts", "rts", "rend",
        binWidth = 3600L * 1000000)
      .select("region", "user", "lid", "rid")
      .as[(Option[String], Option[String], Option[Long], Option[Long])]
      .collect().toSet
    assert(streamed == batch,
      s"composite-key divergence:\n stream $streamed\n batch  $batch")
  }

  test("overlapJoinStream parity across inner/left_outer/full_outer: " +
      "equals the batch interval-overlap twins on a closed watermark, " +
      "and over-length intervals are excluded, not silently mismatched") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val twoH = 2 * 3600 * 1000L
    // u1: overlapping pair; lid 2 and rid 11 overlap nothing; u2/u4:
    // one-sided keys; lid 99: a 5-hour interval beyond the declared 2-hour
    // cap — the stream must EXCLUDE it (the band would silently miss its
    // matches), so the batch twins never see it either; u9: far-future
    // matched pair pushing both watermarks past the Jan-1 bands
    val nullTs = null.asInstanceOf[java.sql.Timestamp]
    val lfix = Seq(
      ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"), 1L),
      ("u1", t("2024-01-01 12:00:00"), t("2024-01-01 12:30:00"), 2L),
      ("u2", t("2024-01-01 10:00:00"), t("2024-01-01 10:30:00"), 3L),
      ("u1", t("2024-01-01 09:00:00"), t("2024-01-01 14:00:00"), 99L),
      // INVERTED left interval (start > end): still overlaps rid 13 per
      // the raw predicate (lStart < rEnd AND rStart < lEnd) — vanilla
      // semantics the batch twin preserves via least/greatest binning
      ("u5", t("2024-01-01 13:05:00"), t("2024-01-01 13:02:00"), 7L),
      ("u9", t("2024-01-02 12:00:00"), t("2024-01-02 12:30:00"), 9L))
    val rfix = Seq(
      ("u1", t("2024-01-01 10:30:00"), t("2024-01-01 11:30:00"), 10L),
      ("u1", t("2024-01-01 13:00:00"), t("2024-01-01 13:15:00"), 11L),
      ("u4", t("2024-01-01 10:00:00"), t("2024-01-01 10:45:00"), 12L),
      ("u5", t("2024-01-01 13:00:00"), t("2024-01-01 13:15:00"), 13L),
      ("u6", t("2024-01-01 10:00:00"), nullTs, 14L), // null end → no
      // matches, surfaces unmatched only under full_outer
      ("u9", t("2024-01-02 12:15:00"), t("2024-01-02 12:45:00"), 90L))
    def streamed(joinType: String): Set[(String, Option[Long], Option[Long])] = {
      val lmem = MemoryStream[(String, java.sql.Timestamp,
        java.sql.Timestamp, Long)]
      val rmem = MemoryStream[(String, java.sql.Timestamp,
        java.sql.Timestamp, Long)]
      val name = s"overlap_stream_$joinType"
      val q = Streams.overlapJoinStream(
          lmem.toDF().toDF("k", "l_lo", "l_hi", "lid"),
          rmem.toDF().toDF("k", "r_lo", "r_hi", "rid"),
          key = "k", leftStart = "l_lo", leftEnd = "l_hi",
          rightStart = "r_lo", rightEnd = "r_hi",
          maxLeftLenMs = twoH, maxRightLenMs = twoH,
          watermark = "10 minutes", joinType = joinType)
        .select("k", "lid", "rid")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        rmem.addData(rfix.take(5): _*)
        lmem.addData(lfix.take(5): _*)
        q.processAllAvailable()
        rmem.addData(rfix.drop(5): _*)
        lmem.addData(lfix.drop(5): _*)
        q.processAllAvailable()
        spark.table(name)
          .as[(String, Option[Long], Option[Long])].collect().toSet
      } finally q.stop()
    }
    // the batch twins get the capped input (lid 99 excluded by contract)
    val lbatch = lfix.filterNot(_._4 == 99L).toDF("k", "l_lo", "l_hi", "lid")
    val rbatch = rfix.toDF("k", "r_lo", "r_hi", "rid")
    val micros1h = 3600L * 1000000
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "lid", "rid")
      .as[(String, Option[Long], Option[Long])].collect().toSet
    val inner = streamed("inner")
    assert(inner == asSet(graft.operators.Joins.intervalOverlapJoin(
      lbatch, rbatch, Seq("k"), "l_lo", "l_hi", "r_lo", "r_hi", micros1h)),
      s"inner diverged: $inner")
    assert(!inner.exists(_._2.contains(99L)),
      "an over-length interval leaked into the stream output")
    assert(inner.contains(("u5", Some(7L), Some(13L))),
      s"inverted-interval overlap lost: $inner")
    val lo = streamed("left_outer")
    assert(lo == asSet(graft.operators.Joins.intervalOverlapJoinLeftOuter(
      lbatch, rbatch, Seq("k"), "l_lo", "l_hi", "r_lo", "r_hi", micros1h)),
      s"left_outer diverged: $lo")
    assert(lo.contains(("u1", Some(2L), None)) &&
      lo.contains(("u2", Some(3L), None)),
      s"unmatched left rows missing: $lo")
    val fo = streamed("full_outer")
    assert(fo == asSet(graft.operators.Joins.intervalOverlapJoinFullOuter(
      lbatch, rbatch, Seq("k"), "l_lo", "l_hi", "r_lo", "r_hi", micros1h)),
      s"full_outer diverged: $fo")
    assert(fo.contains(("u1", None, Some(11L))) &&
      fo.contains(("u4", None, Some(12L))),
      s"unmatched right rows missing: $fo")
  }

  test("DataFrame-generic asOfStream parity: equals the batch Joins.asOf " +
      "on the same fixture, with and without tolerance") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // trades enriched with the latest quote at-or-before, per symbol:
    // sym B has no quotes at all; trade 5 rides a quote AT its own ts
    // (inclusive bound); trade 4's only preceding quote is hours stale —
    // the tolerance run must null it while the plain run keeps it
    val quotes = Seq(
      ("A", t("2024-01-01 09:00:00"), 1.0),
      ("A", t("2024-01-01 10:00:00"), 2.0),
      ("C", t("2024-01-01 06:00:00"), 9.0))
    val trades = Seq(
      ("A", t("2024-01-01 09:30:00"), 101L),
      ("B", t("2024-01-01 09:45:00"), 102L), // no quotes for B
      ("A", t("2024-01-01 10:00:00"), 103L), // quote AT ts matches
      ("C", t("2024-01-01 11:00:00"), 104L)) // only a 5-hour-old quote
    def streamed(tol: Option[Long]): Set[(String, Long, Option[Double])] = {
      val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
      val rmem = MemoryStream[(String, java.sql.Timestamp, Double)]
      val name = s"asof_generic_${tol.isDefined}"
      val q = Streams.asOfStream(
          lmem.toDF().toDF("sym", "ts", "tid"),
          rmem.toDF().toDF("sym", "ts", "price"),
          keyCols = Seq("sym"), tsCol = "ts", valCols = Seq("price"),
          toleranceMs = tol, prefix = "asof_")
        .select("sym", "tid", "asof_price")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // in-order delivery (the case the online path is FOR): each
        // micro-batch carries only events newer than the last — within a
        // batch the operator sorts, across batches state carries. The
        // 10:00 quote must arrive WITH trade 103 (not before 101): the
        // one-pair state retains only the newest right, so out-of-order
        // feeding would legitimately diverge from exact batch asOf.
        rmem.addData(quotes(2), quotes(0)) // C 06:00, A 09:00
        lmem.addData(trades.take(2): _*)   // 09:30, 09:45
        q.processAllAvailable()
        rmem.addData(quotes(1))            // A 10:00
        lmem.addData(trades.drop(2): _*)   // 10:00, 11:00
        q.processAllAvailable()
        spark.table(name).as[(String, Long, Option[Double])].collect().toSet
      } finally q.stop()
    }
    def batch(tolMicros: Option[Long]): Set[(String, Long, Option[Double])] =
      graft.operators.Joins.asOf(
          trades.toDF("sym", "ts", "tid"),
          quotes.toDF("sym", "ts", "price"),
          Seq("sym"), "ts", "ts", Seq("price"), "asof_", "backward",
          tolMicros)
        .select("sym", "tid", "asof_price")
        .as[(String, Long, Option[Double])].collect().toSet
    val plain = streamed(None)
    assert(plain == batch(None),
      s"plain divergence:\n stream $plain\n batch  ${batch(None)}")
    assert(plain == Set(("A", 101L, Some(1.0)), ("B", 102L, None),
      ("A", 103L, Some(2.0)), ("C", 104L, Some(9.0))))
    // 30-minute horizon: ms for the stream, micros for the batch twin
    // (its unit is the timestamp family's bin image)
    val tight = streamed(Some(30L * 60 * 1000))
    assert(tight == batch(Some(30L * 60 * 1000 * 1000)),
      s"tolerance divergence: $tight")
    assert(tight.contains(("C", 104L, None)),
      s"stale enrichment survived the tolerance horizon: $tight")
  }

  test("bootstrapped asOfStream parity: batch snapshot + streamed tail " +
      "equals the batch Joins.asOf over the concatenated history, with " +
      "and without tolerance") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val nullTs = null.asInstanceOf[java.sql.Timestamp]
    // dimension history through T0 = 09:30 — multiple rows per key (the
    // newest must win), a duplicate-ts pair on D (the value-tuple
    // tiebreak must match batch), an ignored extra column, and null
    // key/ts rows (dropped: they could never have entered state)
    val snapshot = Seq(
      ("A", t("2024-01-01 08:00:00"), 1.0, "x"),
      ("A", t("2024-01-01 09:00:00"), 2.0, "x"),
      ("C", t("2024-01-01 06:00:00"), 9.0, "x"),
      ("D", t("2024-01-01 05:00:00"), 7.0, "x"),
      ("D", t("2024-01-01 05:00:00"), 8.0, "x"), // dup ts: 8.0 must win
      (null.asInstanceOf[String], t("2024-01-01 07:00:00"), 6.0, "x"),
      ("A", nullTs, 5.0, "x"))
      .toDF("sym", "ts", "price", "junk")
    // the streamed tail: rights strictly after T0, lefts throughout
    val tailQuotes = Seq(
      ("A", t("2024-01-01 10:00:00"), 3.0),
      ("E", t("2024-01-01 10:30:00"), 5.0)) // key absent from snapshot
    val trades = Seq(
      ("D", t("2024-01-01 09:40:00"), 100L), // snapshot tiebreak value
      ("A", t("2024-01-01 09:45:00"), 101L), // snapshot 09:00 state
      ("B", t("2024-01-01 09:50:00"), 102L), // no history at all
      ("C", t("2024-01-01 10:00:00"), 103L), // stale snapshot state
      ("A", t("2024-01-01 10:15:00"), 104L), // streamed right wins
      ("E", t("2024-01-01 10:45:00"), 105L)) // cold key, streamed right
    def streamed(tol: Option[Long]): Set[(String, Long, Option[Double])] = {
      val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
      val rmem = MemoryStream[(String, java.sql.Timestamp, Double)]
      val name = s"asof_bootstrap_${tol.isDefined}"
      val q = Streams.asOfStream(
          lmem.toDF().toDF("sym", "ts", "tid"),
          rmem.toDF().toDF("sym", "ts", "price"),
          keyCols = Seq("sym"), tsCol = "ts", valCols = Seq("price"),
          toleranceMs = tol, prefix = "asof_", initialSnapshot = snapshot)
        .select("sym", "tid", "asof_price")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // in-order delivery: pre-T0 trades resolve against the BOOTSTRAP
        // state alone, then the tail quotes arrive with the later trades
        lmem.addData(trades.take(4): _*)
        q.processAllAvailable()
        rmem.addData(tailQuotes: _*)
        lmem.addData(trades.drop(4): _*)
        q.processAllAvailable()
        spark.table(name).as[(String, Long, Option[Double])].collect().toSet
      } finally q.stop()
    }
    def batch(tolMicros: Option[Long]): Set[(String, Long, Option[Double])] =
      graft.operators.Joins.asOf(
          trades.toDF("sym", "ts", "tid"),
          snapshot.select("sym", "ts", "price")
            .union(tailQuotes.toDF("sym", "ts", "price")),
          Seq("sym"), "ts", "ts", Seq("price"), "asof_", "backward",
          tolMicros)
        .select("sym", "tid", "asof_price")
        .as[(String, Long, Option[Double])].collect().toSet
    val plain = streamed(None)
    assert(plain == batch(None),
      s"bootstrap divergence:\n stream $plain\n batch  ${batch(None)}")
    // the bootstrap-specific facts, pinned: snapshot state enriches
    // pre-first-right trades; the dup-ts tiebreak matches batch
    assert(plain.contains(("A", 101L, Some(2.0))) &&
      plain.contains(("D", 100L, Some(8.0))) &&
      plain.contains(("B", 102L, None)) &&
      plain.contains(("E", 105L, Some(5.0))), s"got $plain")
    // 60-minute horizon (ms streamed, micros batch): bootstrapped pairs
    // older than the horizon must yield null, not stale enrichment
    val hourMs = 60L * 60 * 1000
    val tight = streamed(Some(hourMs))
    assert(tight == batch(Some(hourMs * 1000)),
      s"tolerance divergence:\n stream $tight\n batch  ${batch(Some(hourMs * 1000))}")
    assert(tight.contains(("C", 103L, None)) &&
      tight.contains(("D", 100L, None)) &&
      tight.contains(("A", 101L, Some(2.0))), s"got $tight")
  }

  test("forward and nearest asOfStream parity: equals the batch Joins.asOf " +
      "directions, with pending lefts resolved by arrival or by the " +
      "watermark-driven horizon timeout") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq(
      ("C", t("2024-01-01 06:00:00"), 9.0),
      ("A", t("2024-01-01 10:00:00"), 2.0),
      ("u9", t("2024-01-02 12:01:00"), 50.0),
      ("u9", t("2024-01-02 12:10:00"), 60.0)) // watermark pusher, resolves nothing
    val trades = Seq(
      ("A", t("2024-01-01 09:30:00"), 101L), // forward → A quote 30 min later
      ("B", t("2024-01-01 09:45:00"), 102L), // no quotes ever → horizon None
      ("A", t("2024-01-01 10:00:00"), 103L), // quote AT ts (inclusive >=)
      ("C", t("2024-01-01 11:00:00"), 104L), // only a 5-hour-OLD quote
      ("u9", t("2024-01-02 12:00:30"), 9L))  // resolves in-batch by 12:01
    def streamed(direction: String,
        tolMs: Long): Set[(String, Long, Option[Double])] = {
      val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
      val rmem = MemoryStream[(String, java.sql.Timestamp, Double)]
      val name = s"asof_dir_$direction"
      val q = Streams.asOfStream(
          lmem.toDF().toDF("sym", "ts", "tid"),
          rmem.toDF().toDF("sym", "ts", "price"),
          keyCols = Seq("sym"), tsCol = "ts", valCols = Seq("price"),
          toleranceMs = Some(tolMs), prefix = "asof_",
          direction = direction, watermark = "10 minutes")
        .select("sym", "tid", "asof_price")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // in-order delivery; the horizon timeout needs (a) the watermark
        // past ts + tolerance — pushed by the far-future u9 batch — and
        // (b) one further micro-batch for the timeout to fire, provided
        // by the final right-only event (rights emit nothing themselves)
        rmem.addData(quotes.take(2): _*)
        lmem.addData(trades.take(4): _*)
        q.processAllAvailable()
        rmem.addData(quotes(2))
        lmem.addData(trades(4))
        q.processAllAvailable()
        rmem.addData(quotes(3))
        q.processAllAvailable()
        spark.table(name).as[(String, Long, Option[Double])].collect().toSet
      } finally q.stop()
    }
    def batch(direction: String,
        tolMicros: Long): Set[(String, Long, Option[Double])] =
      graft.operators.Joins.asOf(
          trades.toDF("sym", "ts", "tid"),
          quotes.toDF("sym", "ts", "price"),
          Seq("sym"), "ts", "ts", Seq("price"), "asof_", direction,
          Some(tolMicros))
        .select("sym", "tid", "asof_price")
        .as[(String, Long, Option[Double])].collect().toSet
    val fortyFiveMin = 45L * 60 * 1000
    val fwd = streamed("forward", fortyFiveMin)
    assert(fwd == batch("forward", fortyFiveMin * 1000),
      s"forward divergence:\n stream $fwd\n batch  " +
        s"${batch("forward", fortyFiveMin * 1000)}")
    assert(fwd.contains(("A", 101L, Some(2.0))) && // resolved by arrival
      fwd.contains(("B", 102L, None)) &&           // resolved by timeout
      fwd.contains(("C", 104L, None)),             // stale-only → None
      s"forward shape wrong: $fwd")
    val sixH = 6L * 3600 * 1000
    val near = streamed("nearest", sixH)
    assert(near == batch("nearest", sixH * 1000),
      s"nearest divergence:\n stream $near\n batch  " +
        s"${batch("nearest", sixH * 1000)}")
    assert(near.contains(("C", 104L, Some(9.0))), // backward fallback at
      s"nearest backward fallback missing: $near") // horizon timeout
  }

  test("asOfStream parity: equals the batch Joins.asOf on the same fixture") {
    // the contract that keeps the streaming form honest: on in-order
    // delivery (the case the online path is FOR), its output must be
    // byte-identical to the exact batch operator
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.Tagged
    val fixture = Seq(
      Tagged(1L, 10L, isRight = true, 1.0),
      Tagged(1L, 20L, isRight = false, 100.0),
      Tagged(2L, 30L, isRight = false, 200.0), // no right for key 2 yet
      Tagged(1L, 40L, isRight = true, 2.0),
      Tagged(1L, 40L, isRight = false, 101.0), // right AT left ts matches
      Tagged(2L, 50L, isRight = true, 3.0),
      Tagged(1L, 60L, isRight = false, 102.0),
      Tagged(2L, 70L, isRight = false, 201.0),
      Tagged(3L, 80L, isRight = false, 300.0)) // key with no rights at all
    val mem = MemoryStream[Tagged]
    val q = Streams.asOfStream(mem.toDS())
      .writeStream.format("memory").queryName("asof_parity")
      .outputMode("append").start()
    val streamed = try {
      // two batches, split mid-stream, still in event-time order
      mem.addData(fixture.take(5): _*)
      q.processAllAvailable()
      mem.addData(fixture.drop(5): _*)
      q.processAllAvailable()
      spark.table("asof_parity").as[Streams.Enriched]
        .collect().map(e => (e.key, e.tsMs, e.value, e.asofValue)).toSet
    } finally q.stop()
    val left = fixture.filter(!_.isRight)
      .map(t => (t.key, t.tsMs, t.value)).toDF("key", "tsMs", "value")
    val right = fixture.filter(_.isRight)
      .map(t => (t.key, t.tsMs, t.value)).toDF("key", "rts", "value")
    val batch = graft.operators.Joins.asOf(left, right, Seq("key"),
        leftTs = "tsMs", rightTs = "rts", rightVals = Seq("value"))
      .select($"key", $"tsMs", $"value", $"asof_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(streamed == batch)
  }

  test("dedupStream parity: equals batch exact dedup on redelivered rows") {
    // at-least-once redelivery ships byte-identical records; on that case
    // (the one both operators exist for) streaming keep-first must equal
    // the batch digest-path dedup keeping the first delivery
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val deliveries = Seq(
      (1L, t("2024-01-01 10:00:00"), "a"),
      (2L, t("2024-01-01 10:00:05"), "b"),
      (1L, t("2024-01-01 10:00:00"), "a"), // identical redelivery
      (3L, t("2024-01-01 10:00:10"), "c"),
      (2L, t("2024-01-01 10:00:05"), "b"), // identical redelivery
      (2L, t("2024-01-01 10:00:05"), "b")) // twice
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = Streams.dedupStream(
        mem.toDF().toDF("id", "ts", "payload"), Seq("id"), "ts")
      .writeStream.format("memory").queryName("dedup_parity")
      .outputMode("append").start()
    val streamed = try {
      mem.addData(deliveries.take(3): _*)
      q.processAllAvailable()
      mem.addData(deliveries.drop(3): _*)
      q.processAllAvailable()
      spark.table("dedup_parity").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSet
    } finally q.stop()
    val withIdx = deliveries.zipWithIndex
      .map { case ((id, ts, p), i) => (i.toLong, id, ts, p) }
      .toDF("idx", "id", "ts", "payload")
    val batch = graft.operators.Dedup.dropExactDuplicates(withIdx,
        Seq("id", "ts", "payload"), "idx")
      .select("id", "ts", "payload").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(streamed == batch)
  }

  test("streaming length-cap exclusions are counted under streamRangeCap / " +
      "streamOverlapCap, not silent — the engine's no-silent-drops contract") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.GuardMetrics
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val nullTs = null.asInstanceOf[java.sql.Timestamp]
    val rangeCtr = GuardMetrics.of(spark.sparkContext, "streamRangeCap")
    val overlapCtr = GuardMetrics.of(spark.sparkContext, "streamOverlapCap")
    rangeCtr.reset()
    overlapCtr.reset()
    // variable-window range join: one in-cap window, one 5-hour window
    // past the 1-hour cap (counted), one null-end window (passes by
    // contract — matches nothing but is not an exclusion)
    val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(String, java.sql.Timestamp,
      java.sql.Timestamp, Long)]
    val q = Streams.rangeJoinStream(
        lmem.toDF().toDF("k", "lts", "lid"),
        rmem.toDF().toDF("k", "r_lo", "r_hi", "rid"),
        key = "k", leftTs = "lts", rightStart = "r_lo", rightEnd = "r_hi",
        maxWindowMs = 3600 * 1000L, watermark = "10 minutes",
        joinType = "inner")
      .writeStream.format("memory").queryName("cap_count_range")
      .outputMode("append").start()
    try {
      rmem.addData(
        ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 10:30:00"), 1L),
        ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 15:00:00"), 2L),
        ("u1", t("2024-01-01 10:00:00"), nullTs, 3L))
      lmem.addData(("u1", t("2024-01-01 10:05:00"), 1L))
      q.processAllAvailable()
    } finally q.stop()
    assert(rangeCtr.droppedRows.value == 1L,
      s"expected exactly the one over-length window counted, got " +
        s"${rangeCtr.droppedRows.value}")
    assert(overlapCtr.droppedRows.value == 0L)
    // overlap join: one over-length interval on EACH side → 2 counted
    // under the shared tag; the full_outer row-loss divergence from the
    // batch twin is now one readable number
    val lmem2 = MemoryStream[(String, java.sql.Timestamp,
      java.sql.Timestamp, Long)]
    val rmem2 = MemoryStream[(String, java.sql.Timestamp,
      java.sql.Timestamp, Long)]
    val q2 = Streams.overlapJoinStream(
        lmem2.toDF().toDF("k", "l_lo", "l_hi", "lid"),
        rmem2.toDF().toDF("k", "r_lo", "r_hi", "rid"),
        key = "k", leftStart = "l_lo", leftEnd = "l_hi",
        rightStart = "r_lo", rightEnd = "r_hi",
        maxLeftLenMs = 3600 * 1000L, maxRightLenMs = 3600 * 1000L,
        watermark = "10 minutes", joinType = "full_outer")
      .writeStream.format("memory").queryName("cap_count_overlap")
      .outputMode("append").start()
    try {
      lmem2.addData(
        ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 10:30:00"), 1L),
        ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 16:00:00"), 2L))
      rmem2.addData(
        ("u1", t("2024-01-01 10:15:00"), t("2024-01-01 10:45:00"), 10L),
        ("u1", t("2024-01-01 10:15:00"), t("2024-01-01 17:00:00"), 11L))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(overlapCtr.droppedRows.value == 2L,
      s"expected one exclusion per side counted, got " +
        s"${overlapCtr.droppedRows.value}")
    assert(rangeCtr.droppedRows.value == 1L,
      "tags must count independently")
  }

  test("length-cap exclusions surface as per-batch observed metrics in " +
      "StreamingQueryProgress (accumulators are session totals only)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.GuardMetrics
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // overlap join with one over-length interval on the LEFT side only:
    // the per-side observed metrics attribute the drop where the shared
    // streamOverlapCap accumulator tag cannot
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
        watermark = "10 minutes", joinType = "inner")
      .writeStream.format("memory").queryName("cap_observe")
      .outputMode("append").start()
    val (leftName, rightName) =
      (GuardMetrics.observedMetricName("streamOverlapCap", "l_lo"),
        GuardMetrics.observedMetricName("streamOverlapCap", "r_lo"))
    try {
      lmem.addData(
        ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 10:30:00"), 1L),
        ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 16:00:00"), 2L))
      rmem.addData(
        ("u1", t("2024-01-01 10:15:00"), t("2024-01-01 10:45:00"), 10L))
      q.processAllAvailable()
      // scan every progress event: the data-carrying micro-batch must
      // report 1 excluded row on the left metric and 0 on the right
      def reported(name: String): Seq[Long] = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get(name)))
        .map(_.getAs[Long]("excludedRows"))
      assert(reported(leftName).contains(1L),
        s"left-side observed metric never reported the exclusion: " +
          s"${reported(leftName)}")
      assert(reported(rightName).nonEmpty &&
        reported(rightName).forall(_ == 0L),
        s"right side excluded nothing but reported: ${reported(rightName)}")
    } finally q.stop()
  }

  test("capIntervalLength boundary: an interval exactly at the declared " +
      "max passes (inclusive), one ms over drops and counts; null-end " +
      "and inverted intervals pass") {
    // map-only transform — exercised batch-side for exact boundary
    // semantics the streaming tests don't pin
    import graft.operators.GuardMetrics
    val ctr = GuardMetrics.of(spark.sparkContext, "capBoundary")
    ctr.reset()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("exact", t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00")),
      ("over", t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00.001")),
      ("nullEnd", t("2024-01-01 10:00:00"),
        null.asInstanceOf[java.sql.Timestamp]),
      ("inverted", t("2024-01-01 10:00:00"), t("2024-01-01 09:00:00")))
      .toDF("name", "lo", "hi")
    val kept = GuardMetrics.capIntervalLength(df, "lo", "hi",
        3600 * 1000L, "capBoundary")
      .select("name").as[String].collect().toSet
    assert(kept == Set("exact", "nullEnd", "inverted"), s"got $kept")
    assert(ctr.droppedRows.value == 1L && ctr.droppedCohorts.value == 1L)
  }

  test("streamJoin fails fast on colliding non-key column names and on a " +
      "key doubling as the right time column") {
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    // both sides carry a non-key "v" — the loud contract names it instead
    // of surfacing Spark's opaque ambiguous-reference error downstream
    val e1 = intercept[IllegalArgumentException] {
      Streams.rangeJoinStream(
        lmem.toDF().toDF("k", "lts", "v"),
        rmem.toDF().toDF("k", "rts", "v"),
        key = "k", leftTs = "lts", rightTs = "rts", windowMs = 1000L)
    }
    assert(e1.getMessage.contains("share non-key column") &&
      e1.getMessage.contains("'v'"), e1.getMessage)
    // the right time column as a join key would be renamed out from under
    // its own watermark call
    val e2 = intercept[IllegalArgumentException] {
      Streams.rangeJoinStream(
        lmem.toDF().toDF("rts", "lts", "lid"),
        rmem.toDF().toDF("rts", "other", "rid"),
        key = "rts", leftTs = "lts", rightTs = "rts", windowMs = 1000L)
    }
    assert(e2.getMessage.contains("cannot also be a join key"),
      e2.getMessage)
  }

  test("guardSite disambiguates the length-cap observed metrics when one " +
      "query composes two capped joins sharing a tag and start-column " +
      "name; without sites the duplicate name is rejected at analysis") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.GuardMetrics
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    def mk(site: String) = {
      val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
      val rmem = MemoryStream[(String, java.sql.Timestamp,
        java.sql.Timestamp, Long)]
      val joined = Streams.rangeJoinStream(
        lmem.toDF().toDF("k", "lts", "lid"),
        rmem.toDF().toDF("k", "start", "end", "rid"),
        keys = Seq("k"), leftTs = "lts", rightStart = "start",
        rightEnd = "end", maxWindowMs = 3600 * 1000L,
        watermark = "10 minutes", joinType = "inner", guardSite = site)
      (joined.select("k", "lid", "rid"), lmem, rmem)
    }
    // both capped right sides are named 'start' under one tag: the
    // site-less composition creates two same-named CollectMetrics nodes
    // over different children, which Spark rejects — the loud failure
    // the guardSite parameter exists to resolve
    val dup = intercept[org.apache.spark.sql.AnalysisException] {
      val (a, _, _) = mk("")
      val (b, _, _) = mk("")
      a.union(b).writeStream.format("memory").queryName("cap_site_dup")
        .outputMode("append").start()
    }
    assert(dup.getMessage.contains("DUPLICATED_METRICS_NAME") &&
      dup.getMessage.contains(
        GuardMetrics.observedMetricName("streamRangeCap", "start")),
      dup.getMessage)
    // distinct sites → distinct metric names → the composition runs, and
    // each site's exclusions report under its own spliced name
    val (a, almem, armem) = mk("siteA")
    val (b, blmem, brmem) = mk("siteB")
    val q = a.union(b).writeStream.format("memory")
      .queryName("cap_site_ok").outputMode("append").start()
    try {
      almem.addData(("u1", t("2024-01-01 10:15:00"), 1L))
      armem.addData(
        ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 10:30:00"), 10L),
        // over-cap window on side A only
        ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 16:00:00"), 11L))
      blmem.addData(("u2", t("2024-01-01 10:15:00"), 2L))
      brmem.addData(
        ("u2", t("2024-01-01 10:00:00"), t("2024-01-01 10:30:00"), 20L))
      q.processAllAvailable()
      assert(spark.table("cap_site_ok").count() == 2L)
      def reported(site: String): Seq[Long] = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get(
          GuardMetrics.observedMetricName("streamRangeCap", "start", site))))
        .map(_.getAs[Long]("excludedRows"))
      assert(reported("siteA").contains(1L),
        s"siteA never reported its exclusion: ${reported("siteA")}")
      assert(reported("siteB").nonEmpty && reported("siteB").forall(_ == 0L),
        s"siteB excluded nothing but reported: ${reported("siteB")}")
    } finally q.stop()
  }

  test("bootstrap snapshot column TYPES are validated up front against " +
      "the stream schemas, naming the mismatched column") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(("A", t("2024-01-01 10:00:00"), 1L))
      .toDF("sym", "ts", "tid")
    val right = Seq(("A", t("2024-01-01 09:00:00"), 2.0))
      .toDF("sym", "ts", "price")
    def boot(snapshot: org.apache.spark.sql.DataFrame) =
      Streams.asOfStream(left, right, keyCols = Seq("sym"), tsCol = "ts",
        valCols = Seq("price"), toleranceMs = None, prefix = "asof_",
        initialSnapshot = snapshot)
    // a string tsCol previously surfaced as an executor-side
    // ClassCastException in the state seeding
    val badTs = intercept[IllegalArgumentException] {
      boot(Seq(("A", "2024-01-01", 2.0)).toDF("sym", "ts", "price"))
    }
    assert(badTs.getMessage.contains("'ts'") &&
      badTs.getMessage.contains("TIMESTAMP"), badTs.getMessage)
    // a mismatched key type previously made the bootstrap silently inert
    // (encoded snapshot keys never equal streamed keys)
    val badKey = intercept[IllegalArgumentException] {
      boot(Seq((7, t("2024-01-01 09:00:00"), 2.0))
        .toDF("sym", "ts", "price"))
    }
    assert(badKey.getMessage.contains("'sym'") &&
      badKey.getMessage.contains("int"), badKey.getMessage)
    // a mismatched value type previously surfaced only at output encoding
    val badVal = intercept[IllegalArgumentException] {
      boot(Seq(("A", t("2024-01-01 09:00:00"), 2L))
        .toDF("sym", "ts", "price"))
    }
    assert(badVal.getMessage.contains("'price'") &&
      badVal.getMessage.contains("bigint"), badVal.getMessage)
    // the directional bootstrap shares the same validation
    val badDir = intercept[IllegalArgumentException] {
      Streams.asOfStream(left, right, keyCols = Seq("sym"), tsCol = "ts",
        valCols = Seq("price"), toleranceMs = Some(1000L),
        prefix = "asof_", direction = "nearest", watermark = "0 seconds",
        initialSnapshot = Seq((7, t("2024-01-01 09:00:00"), 2.0))
          .toDF("sym", "ts", "price"))
    }
    assert(badDir.getMessage.contains("'sym'"), badDir.getMessage)
  }

  /** State-boundedness as a TREND, not Spark's exact eviction cadence:
    * the earlier `last <= 4 / max <= 6` bounds encoded exactly when the
    * watermark evicts under processAllAvailable, which a Spark bump
    * delaying eviction by one micro-batch would flake without any real
    * leak. A LEAK tracks stream length (2 rows/round, 8 rounds → ~16),
    * so the late-round level must sit at the early-round level.
    */
  private def assertStateBounded(totals: Seq[Long], what: String): Unit = {
    assert(totals.drop(4).max <= totals.take(4).max + 2,
      s"$what state grew with stream length: $totals")
    assert(totals.last <= totals(1) + 4,
      s"$what final state exceeded the settled band: $totals")
  }

  test("stream-stream join state stays bounded: rows age out at the " +
      "derived retention band instead of accumulating with stream length") {
    implicit val sqlCtx = spark.sqlContext
    def t(day: Int, hm: String) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hm:00")
    // 8 rounds, one matched pair per round, rounds a DAY apart — far past
    // watermark (10 min) + window (1 h), so each round's rows must leave
    // the state store before the next settles. 16 rows fed; a leak shows
    // as numRowsTotal tracking stream length.
    def drive(mkQuery: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame,
        name: String, rightHasEnd: Boolean): Seq[Long] = {
      val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
      val rmem = MemoryStream[(String, java.sql.Timestamp,
        java.sql.Timestamp, Long)]
      val rdf = if (rightHasEnd) rmem.toDF().toDF("k", "rts", "rend", "rid")
        else rmem.toDF().toDF("k", "rts", "rend", "rid").drop("rend")
      val q = mkQuery(lmem.toDF().toDF("k", "lts", "lid"), rdf)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        (1 to 8).map { day =>
          rmem.addData(("u1", t(day, "10:00"), t(day, "10:45"), day.toLong))
          lmem.addData(("u1", t(day, "10:30"), day.toLong))
          q.processAllAvailable()
          q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        }
      } finally q.stop()
    }
    val fixed = drive((l, r) => Streams.rangeJoinStream(l, r, key = "k",
      leftTs = "lts", rightTs = "rts", windowMs = 3600 * 1000L,
      watermark = "10 minutes"), "state_bound_fixed", rightHasEnd = false)
    // at most the current round + the not-yet-evicted previous round(s)
    // may sit in state (the watermark that evicts round i arrives with
    // round i+1), while 2×round rows were fed
    assertStateBounded(fixed, "fixed-window")
    val variable = drive((l, r) => Streams.rangeJoinStream(l, r, key = "k",
      leftTs = "lts", rightStart = "rts", rightEnd = "rend",
      maxWindowMs = 2 * 3600 * 1000L, watermark = "10 minutes",
      joinType = "inner"), "state_bound_var", rightHasEnd = true)
    assertStateBounded(variable, "variable-window")
  }

  test("overlapJoinStream state stays bounded at the derived " +
      "start-to-start band") {
    implicit val sqlCtx = spark.sqlContext
    def t(day: Int, hm: String) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hm:00")
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
        watermark = "10 minutes", joinType = "inner")
      .writeStream.format("memory").queryName("state_bound_overlap")
      .outputMode("append").start()
    val totals = try {
      (1 to 8).map { day =>
        lmem.addData(("u1", t(day, "10:00"), t(day, "10:30"), day.toLong))
        rmem.addData(("u1", t(day, "10:15"), t(day, "10:45"), day.toLong))
        q.processAllAvailable()
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      }
    } finally q.stop()
    assertStateBounded(totals, "overlap")
  }

  test("pinned divergence: forward asOfStream resolves duplicate right " +
      "timestamps to an arbitrary one of the duplicates (documented; the " +
      "batch value-tuple tiebreak needs an order rows don't carry)") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = Streams.asOfStream(
        lmem.toDF().toDF("sym", "ts", "tid"),
        rmem.toDF().toDF("sym", "ts", "price"),
        keyCols = Seq("sym"), tsCol = "ts", valCols = Seq("price"),
        toleranceMs = Some(3600 * 1000L), prefix = "asof_",
        direction = "forward", watermark = "1 hour")
      .select("tid", "asof_price")
      .writeStream.format("memory").queryName("pin_dup_right")
      .outputMode("append").start()
    val rows = try {
      lmem.addData(("A", t("2024-01-01 10:00:00"), 1L)) // pends
      q.processAllAvailable()
      // two rights at the SAME timestamp resolve it; which one wins is
      // explicitly arbitrary — this test fails if the state machine ever
      // starts dropping the match or inventing a third value
      rmem.addData(("A", t("2024-01-01 10:30:00"), 1.0),
        ("A", t("2024-01-01 10:30:00"), 2.0))
      q.processAllAvailable()
      spark.table("pin_dup_right").as[(Long, Option[Double])]
        .collect().toMap
    } finally q.stop()
    assert(rows(1L).exists(v => v == 1.0 || v == 2.0),
      s"duplicate-ts right must resolve to ONE of the duplicates: $rows")
  }

  test("pinned divergence: cross-micro-batch skew resolves a left against " +
      "the retained newest right (documented; batch nearest would pick " +
      "the already-discarded closer right)") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq(("A", t("2024-01-01 10:00:00"), 1.0),
      ("A", t("2024-01-01 10:05:00"), 3.0))
    val trades = Seq(("A", t("2024-01-01 10:02:00"), 1L))
    val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = Streams.asOfStream(
        lmem.toDF().toDF("sym", "ts", "tid"),
        rmem.toDF().toDF("sym", "ts", "price"),
        keyCols = Seq("sym"), tsCol = "ts", valCols = Seq("price"),
        toleranceMs = Some(3600 * 1000L), prefix = "asof_",
        direction = "nearest", watermark = "1 hour")
      .select("tid", "asof_price")
      .writeStream.format("memory").queryName("pin_skew")
      .outputMode("append").start()
    val streamed = try {
      // BOTH rights land before the left (source skew): the 10:00 right
      // is superseded by 10:05 and discarded before the 10:02 left shows
      rmem.addData(quotes: _*)
      q.processAllAvailable()
      lmem.addData(trades: _*)
      q.processAllAvailable()
      spark.table("pin_skew").as[(Long, Option[Double])].collect().toMap
    } finally q.stop()
    // online: the retained 10:05 right is the best witness still alive
    assert(streamed(1L).contains(3.0),
      s"skewed left must resolve against the retained right: $streamed")
    // the batch twin, with full history, picks the CLOSER 10:00 right —
    // asserting it here keeps the divergence visible, not just asserted
    val batch = graft.operators.Joins.asOf(
        trades.toDF("sym", "ts", "tid"), quotes.toDF("sym", "ts", "price"),
        Seq("sym"), "ts", "ts", Seq("price"), "asof_", "nearest",
        Some(3600L * 1000 * 1000))
      .select($"tid", $"asof_price").as[(Long, Option[Double])]
      .collect().toMap
    assert(batch(1L).contains(1.0), s"batch twin shape changed: $batch")
  }

  test("sessionize closes a session on gap and keeps state within gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // two events 5 min apart (same session), then a 30-min jump → closes it
      mem.addData(
        Event(1L, t("2024-01-01 10:00:00"), "click", 1.0),
        Event(1L, t("2024-01-01 10:05:00"), "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(1L, t("2024-01-01 10:40:00"), "view", 3.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[Streams.Session].collect()
      assert(sessions.length == 1)
      val s = sessions.head
      assert(s.user_id == 1L && s.nEvents == 2 && s.totalValue == 3.0)
    } finally q.stop()
  }
}
