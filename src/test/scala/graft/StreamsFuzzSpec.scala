package graft

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Joins
import graft.streaming.Streams

/** Seeded differential fuzz for the streaming join family — the
  * randomized sibling of StreamsSpec's fixture parity tests, in the
  * mold of RangeJoinFuzzSpec: random keyed event sets (duplicate
  * timestamps, null bounds, null keys, inverted and over-length
  * intervals) delivered across RANDOMIZED multi-micro-batch schedules
  * via MemoryStream — the adversarial axis hand fixtures cannot cover
  * (batch boundaries and their interaction with state carry-over) —
  * then compared row-for-row against the batch twins.
  *
  * Watermark discipline, per family:
  *  - The stream-stream joins use a 48-hour watermark over a 24-hour
  *    fixture span, so NO delivery order can make an in-fixture row
  *    late (dropping late rows is correct streaming behavior, but it is
  *    not what parity probes); chunks are therefore fully shuffled. A
  *    far-future closer on BOTH streams then pushes the watermarks past
  *    every fixture band, forcing unmatched outer rows to flush.
  *  - The as-of scenarios deliver in global event-time order across
  *    random batch boundaries, through ONE tagged source (see
  *    [[runAsof]] for why two sources cannot guarantee order under a
  *    free-running trigger) — in-order delivery is the contract under
  *    which the online operator promises batch equality (its scaladoc);
  *    the two documented forward/nearest divergences are excluded by
  *    construction (right timestamps unique per key; no cross-source
  *    skew under global ordering) and pinned by their own named tests
  *    in StreamsSpec. Boundaries never split an equal-timestamp group,
  *    so the inclusive at-ts match cannot be broken by a batch seam.
  */
class StreamsFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val KeyPool = Vector("k0", "k1", "k2", "k3")
  private val Base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private val Hour = 3600L * 1000
  private val Minute = 60L * 1000
  private val CloserOff = 30L * 24 * Hour // +30 days, past every band
  private def ts(off: Long) = new java.sql.Timestamp(Base + off)
  private val MicrosPerHour = Hour * 1000 // batch binWidth unit

  private def randKey(rnd: Random) = KeyPool(rnd.nextInt(KeyPool.size))
  // minute granularity over 24 h: 1440 slots for ~25 events per side, so
  // cross- and same-key timestamp collisions occur naturally
  private def randOff(rnd: Random) = rnd.nextInt(24 * 60).toLong * Minute

  /** Fully shuffled random chunking (2–3 chunks) — the stream-stream
    * delivery schedule, where disorder is safe under the long watermark.
    */
  private def shuffledChunks[A](rnd: Random, events: Seq[A]): Seq[Seq[A]] = {
    val shuffled = rnd.shuffle(events)
    val cuts = Seq.fill(1 + rnd.nextInt(2))(rnd.nextInt(shuffled.size + 1))
    (Seq(0) ++ cuts.sorted ++ Seq(shuffled.size)).sliding(2).map {
      case Seq(a, b) => shuffled.slice(a, b)
      case _ => Seq.empty
    }.toSeq
  }

  /** Event-time-ordered random chunking (2–4 chunks) for the as-of
    * scenarios; a cut never lands inside an equal-timestamp run.
    */
  private def orderedChunks[A](rnd: Random, events: Seq[A],
      tsOf: A => Long): Seq[Seq[A]] = {
    val sorted = events.sortBy(tsOf)
    val raw = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(sorted.size + 1))
    val cuts = raw.map { c =>
      var i = c
      while (i > 0 && i < sorted.size &&
        tsOf(sorted(i)) == tsOf(sorted(i - 1))) i += 1
      i
    }.sorted
    (Seq(0) ++ cuts ++ Seq(sorted.size)).sliding(2).map {
      case Seq(a, b) => sorted.slice(a, b)
      case _ => Seq.empty
    }.toSeq
  }

  // ---------------------------------------------------------------- //
  //  stream-stream joins                                             //
  // ---------------------------------------------------------------- //

  type Out3 = (String, Option[Long], Option[Long])

  test("fuzz: fixed-window rangeJoinStream equals batch rangeJoin across " +
      "shuffled micro-batch schedules (inner/left_outer/full_outer × seeds)") {
    for (seed <- Seq(11, 12);
        joinType <- Seq("inner", "left_outer", "full_outer")) {
      val rnd = new Random(seed)
      val lfix = (0 until 25).map(i => (randKey(rnd), ts(randOff(rnd)),
        1000L + i))
      val rfix = (0 until 25).map(i => (randKey(rnd), ts(randOff(rnd)),
        2000L + i))
      val name = s"fz_fixed_${seed}_$joinType"
      val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
      val rmem = MemoryStream[(String, java.sql.Timestamp, Long)]
      val q = Streams.rangeJoinStream(
          lmem.toDF().toDF("k", "lts", "lid"),
          rmem.toDF().toDF("k", "rts", "rid"),
          key = "k", leftTs = "lts", rightTs = "rts", windowMs = 2 * Hour,
          watermark = "48 hours", joinType = joinType)
        .select("k", "lid", "rid")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val streamed = try {
        val lcs = shuffledChunks(rnd, lfix)
        val rcs = shuffledChunks(rnd, rfix)
        for (i <- 0 until math.max(lcs.size, rcs.size)) {
          if (i < lcs.size && lcs(i).nonEmpty) lmem.addData(lcs(i): _*)
          if (i < rcs.size && rcs(i).nonEmpty) rmem.addData(rcs(i): _*)
          q.processAllAvailable()
        }
        lmem.addData(("wmclose", ts(CloserOff), -1L))
        rmem.addData(("wmclose", ts(CloserOff), -1L))
        q.processAllAvailable()
        spark.table(name).as[Out3].collect().toSet
          .filterNot(_._1 == "wmclose")
      } finally q.stop()
      val lb = lfix.toDF("k", "lts", "lid")
      val rb = rfix.toDF("k", "rts", "rid")
        .withColumn("rend", $"rts" + expr("INTERVAL 2 HOURS"))
      val bdf = joinType match {
        case "inner" => Joins.rangeJoin(
          lb, rb, Seq("k"), "lts", "rts", "rend", MicrosPerHour)
        case "left_outer" => Joins.rangeJoinLeftOuter(
          lb, rb, Seq("k"), "lts", "rts", "rend", MicrosPerHour)
        case _ => Joins.rangeJoinFullOuter(
          lb, rb, Seq("k"), "lts", "rts", "rend", MicrosPerHour)
      }
      val batch = bdf.select("k", "lid", "rid").as[Out3].collect().toSet
      assert(streamed == batch,
        s"seed=$seed joinType=$joinType fixed-window divergence:\n" +
          s" stream-only ${streamed -- batch}\n batch-only  ${batch -- streamed}")
    }
  }

  test("fuzz: variable-window rangeJoinStream equals batch rangeJoin on " +
      "cap-surviving windows — null ends, inverted and over-length " +
      "windows included") {
    val maxWin = 2 * Hour
    for (seed <- Seq(31, 32);
        joinType <- Seq("inner", "left_outer", "full_outer")) {
      val rnd = new Random(seed)
      val lfix = (0 until 22).map(i => (randKey(rnd), ts(randOff(rnd)),
        1000L + i))
      val rfix = (0 until 22).map { i =>
        val lo = randOff(rnd)
        // ~10% null end, ~10% inverted, rest 0–3 h (≈ a third over-cap)
        val hi: java.sql.Timestamp = rnd.nextInt(10) match {
          case 0 => null
          case 1 => ts(lo - (1 + rnd.nextInt(30)) * Minute)
          case _ => ts(lo + rnd.nextInt(181).toLong * Minute)
        }
        (randKey(rnd), ts(lo), hi, 2000L + i)
      }
      val name = s"fz_var_${seed}_$joinType"
      val lmem = MemoryStream[(String, java.sql.Timestamp, Long)]
      val rmem = MemoryStream[(String, java.sql.Timestamp,
        java.sql.Timestamp, Long)]
      val q = Streams.rangeJoinStream(
          lmem.toDF().toDF("k", "lts", "lid"),
          rmem.toDF().toDF("k", "r_lo", "r_hi", "rid"),
          key = "k", leftTs = "lts", rightStart = "r_lo", rightEnd = "r_hi",
          maxWindowMs = maxWin, watermark = "48 hours", joinType = joinType)
        .select("k", "lid", "rid")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val streamed = try {
        val lcs = shuffledChunks(rnd, lfix)
        val rcs = shuffledChunks(rnd, rfix)
        for (i <- 0 until math.max(lcs.size, rcs.size)) {
          if (i < lcs.size && lcs(i).nonEmpty) lmem.addData(lcs(i): _*)
          if (i < rcs.size && rcs(i).nonEmpty) rmem.addData(rcs(i): _*)
          q.processAllAvailable()
        }
        lmem.addData(("wmclose", ts(CloserOff), -1L))
        rmem.addData(("wmclose", ts(CloserOff), ts(CloserOff + Hour), -1L))
        q.processAllAvailable()
        spark.table(name).as[Out3].collect().toSet
          .filterNot(_._1 == "wmclose")
      } finally q.stop()
      // the batch twin sees the capped input — over-length windows are
      // the operator's documented (and counted) exclusion
      val rCapped = rfix.filter { case (_, lo, hi, _) =>
        hi == null || hi.getTime <= lo.getTime + maxWin }
      val lb = lfix.toDF("k", "lts", "lid")
      val rb = rCapped.toDF("k", "r_lo", "r_hi", "rid")
      val bdf = joinType match {
        case "inner" => Joins.rangeJoin(
          lb, rb, Seq("k"), "lts", "r_lo", "r_hi", MicrosPerHour)
        case "left_outer" => Joins.rangeJoinLeftOuter(
          lb, rb, Seq("k"), "lts", "r_lo", "r_hi", MicrosPerHour)
        case _ => Joins.rangeJoinFullOuter(
          lb, rb, Seq("k"), "lts", "r_lo", "r_hi", MicrosPerHour)
      }
      val batch = bdf.select("k", "lid", "rid").as[Out3].collect().toSet
      assert(streamed == batch,
        s"seed=$seed joinType=$joinType variable-window divergence:\n" +
          s" stream-only ${streamed -- batch}\n batch-only  ${batch -- streamed}")
    }
  }

  test("fuzz: overlapJoinStream equals batch intervalOverlapJoin on " +
      "cap-surviving intervals — null ends and inverted intervals on " +
      "both sides") {
    val maxLen = 2 * Hour
    def intervals(rnd: Random, idBase: Long) = (0 until 22).map { i =>
      val lo = randOff(rnd)
      val hi: java.sql.Timestamp = rnd.nextInt(10) match {
        case 0 => null
        case 1 => ts(lo - (1 + rnd.nextInt(30)) * Minute)
        case _ => ts(lo + rnd.nextInt(181).toLong * Minute)
      }
      (randKey(rnd), ts(lo), hi, idBase + i)
    }
    def capped(fix: Seq[(String, java.sql.Timestamp, java.sql.Timestamp,
        Long)]) = fix.filter { case (_, lo, hi, _) =>
      hi == null || hi.getTime <= lo.getTime + maxLen }
    for (seed <- Seq(41, 42);
        joinType <- Seq("inner", "left_outer", "full_outer")) {
      val rnd = new Random(seed)
      val lfix = intervals(rnd, 1000L)
      val rfix = intervals(rnd, 2000L)
      val name = s"fz_overlap_${seed}_$joinType"
      val lmem = MemoryStream[(String, java.sql.Timestamp,
        java.sql.Timestamp, Long)]
      val rmem = MemoryStream[(String, java.sql.Timestamp,
        java.sql.Timestamp, Long)]
      val q = Streams.overlapJoinStream(
          lmem.toDF().toDF("k", "l_lo", "l_hi", "lid"),
          rmem.toDF().toDF("k", "r_lo", "r_hi", "rid"),
          key = "k", leftStart = "l_lo", leftEnd = "l_hi",
          rightStart = "r_lo", rightEnd = "r_hi",
          maxLeftLenMs = maxLen, maxRightLenMs = maxLen,
          watermark = "48 hours", joinType = joinType)
        .select("k", "lid", "rid")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val streamed = try {
        val lcs = shuffledChunks(rnd, lfix)
        val rcs = shuffledChunks(rnd, rfix)
        for (i <- 0 until math.max(lcs.size, rcs.size)) {
          if (i < lcs.size && lcs(i).nonEmpty) lmem.addData(lcs(i): _*)
          if (i < rcs.size && rcs(i).nonEmpty) rmem.addData(rcs(i): _*)
          q.processAllAvailable()
        }
        lmem.addData(("wmclose", ts(CloserOff), ts(CloserOff + Hour), -1L))
        rmem.addData(("wmclose", ts(CloserOff), ts(CloserOff + Hour), -1L))
        q.processAllAvailable()
        spark.table(name).as[Out3].collect().toSet
          .filterNot(_._1 == "wmclose")
      } finally q.stop()
      val lb = capped(lfix).toDF("k", "l_lo", "l_hi", "lid")
      val rb = capped(rfix).toDF("k", "r_lo", "r_hi", "rid")
      val bdf = joinType match {
        case "inner" => Joins.intervalOverlapJoin(lb, rb, Seq("k"),
          "l_lo", "l_hi", "r_lo", "r_hi", MicrosPerHour)
        case "left_outer" => Joins.intervalOverlapJoinLeftOuter(lb, rb,
          Seq("k"), "l_lo", "l_hi", "r_lo", "r_hi", MicrosPerHour)
        case _ => Joins.intervalOverlapJoinFullOuter(lb, rb, Seq("k"),
          "l_lo", "l_hi", "r_lo", "r_hi", MicrosPerHour)
      }
      val batch = bdf.select("k", "lid", "rid").as[Out3].collect().toSet
      assert(streamed == batch,
        s"seed=$seed joinType=$joinType overlap divergence:\n" +
          s" stream-only ${streamed -- batch}\n batch-only  ${batch -- streamed}")
    }
  }

  // ---------------------------------------------------------------- //
  //  as-of joins                                                     //
  // ---------------------------------------------------------------- //

  private type LRow = (String, java.sql.Timestamp, Long)   // sym, ts, tid
  private type RRow = (String, java.sql.Timestamp, Double) // sym, ts, price
  private type AsofOut = (Option[String], Long, Option[Double])

  /** Random as-of fixture: lefts with null-ts and null-key rows mixed in;
    * rights deduped to one row per (key, ts) — the duplicate-right-ts
    * tiebreak is a documented divergence with its own pinned test — plus
    * one null-ts and one null-key right (both dropped by contract on both
    * engines).
    */
  private def asofFixture(rnd: Random): (Seq[LRow], Seq[RRow]) = {
    val lefts = (0 until 25).map(i =>
      (randKey(rnd), ts(randOff(rnd)), 100L + i)) ++
      Seq((randKey(rnd), null.asInstanceOf[java.sql.Timestamp], 900L),
        (null.asInstanceOf[String], ts(randOff(rnd)), 901L))
    val rights = (0 until 20).map(i =>
        (randKey(rnd), ts(randOff(rnd)), (i + 1).toDouble))
      .groupBy(r => (r._1, r._2.getTime)).map(_._2.head).toSeq ++
      Seq((randKey(rnd), null.asInstanceOf[java.sql.Timestamp], -1.0),
        (null.asInstanceOf[String], ts(randOff(rnd)), -2.0))
    (lefts, rights)
  }

  private def eventTs(t: java.sql.Timestamp): Long =
    if (t == null) Long.MinValue else t.getTime

  private type Tagged = (Int, String, java.sql.Timestamp, Long, Double)

  /** Deliver both sides of an as-of fixture in global event-time order
    * across random batch boundaries, run to completion (plus right-only
    * watermark closers when `closers`, for the timeout-driven
    * directions), and return the streamed output.
    *
    * Both sides are fed from ONE tagged MemoryStream, split into the
    * left/right inputs inside the query. A continuously-triggering
    * query may cut a micro-batch between two `addData` calls, and with
    * two independent sources such a cut can capture a left WITHOUT an
    * already-added older right (the two sources' offsets are scanned at
    * different instants) — manufacturing exactly the cross-source-skew
    * divergence the operator documents away, which is not what parity
    * probes. One source = one offset log: a single `addData` block is
    * atomic, so every possible cut is a prefix of the global
    * event-time order being delivered — the operator's in-order
    * contract — wherever the trigger lands. (This very fuzz found the
    * two-source flake on its first run.)
    */
  private def runAsof(rnd: Random, lefts: Seq[LRow], rights: Seq[RRow],
      name: String, closers: Boolean)(
      mk: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)
        => org.apache.spark.sql.DataFrame): Set[AsofOut] = {
    val mem = MemoryStream[Tagged]
    val base = mem.toDF().toDF("side", "sym", "ts", "tid", "price")
    val q = mk(base.filter(col("side") === 0).select("sym", "ts", "tid"),
        base.filter(col("side") === 1).select("sym", "ts", "price"))
      .select("sym", "tid", "asof_price")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val merged: Seq[Tagged] =
        lefts.map { case (k, t, id) => (0, k, t, id, 0.0) } ++
          rights.map { case (k, t, v) => (1, k, t, -1L, v) }
      val cs = orderedChunks(rnd, merged, (e: Tagged) => eventTs(e._3))
      cs.filter(_.nonEmpty).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
      if (closers) {
        // push the watermark past every horizon, then one further batch
        // for the event-time timeouts to fire (rights emit nothing)
        mem.addData((1, "wmclose", ts(CloserOff), -1L, 0.0))
        q.processAllAvailable()
        mem.addData((1, "wmclose", ts(CloserOff + Hour), -1L, 0.0))
        q.processAllAvailable()
      }
      spark.table(name).as[AsofOut].collect().toSet
    } finally q.stop()
  }

  private def asofBatch(lefts: Seq[LRow], rights: Seq[RRow],
      direction: String, tolMs: Option[Long]): Set[AsofOut] =
    Joins.asOf(lefts.toDF("sym", "ts", "tid"),
        rights.toDF("sym", "ts", "price"),
        Seq("sym"), "ts", "ts", Seq("price"), "asof_", direction,
        tolMs.map(_ * 1000)) // stream ms → the batch twin's micros
      .select("sym", "tid", "asof_price").as[AsofOut].collect().toSet

  test("fuzz: backward asOfStream equals batch asOf under in-order " +
      "randomized batch boundaries, with and without tolerance") {
    for (seed <- Seq(21, 22, 23)) {
      val rnd = new Random(seed)
      val (lefts, rights) = asofFixture(rnd)
      val tol = if (seed % 2 == 0) Some(90 * Minute) else None
      val streamed = runAsof(rnd, lefts, rights,
          s"fz_asof_bwd_$seed", closers = false) { (l, r) =>
        Streams.asOfStream(l, r, keyCols = Seq("sym"), tsCol = "ts",
          valCols = Seq("price"), toleranceMs = tol, prefix = "asof_")
      }
      val batch = asofBatch(lefts, rights, "backward", tol)
      assert(streamed == batch,
        s"seed=$seed tol=$tol backward divergence:\n" +
          s" stream-only ${streamed -- batch}\n batch-only  ${batch -- streamed}")
    }
  }

  test("fuzz: bootstrapped backward asOfStream (snapshot ≤ T0 + streamed " +
      "tail) equals batch asOf over the CONCATENATED right history") {
    // the mid-history start the bootstrap overload exists for: the right
    // side's pre-T0 rows arrive as a batch snapshot, only the tail is
    // streamed; parity must hold against batch asOf over ALL rights
    val T0 = 12 * Hour // noon of the 24 h fixture day
    for (seed <- Seq(61, 62, 63)) {
      val rnd = new Random(seed)
      val (lefts, rights) = asofFixture(rnd)
      val (snapRights, tailRights) =
        rights.partition(r => eventTs(r._2) <= Base + T0)
      // null-ts/null-key rights land in the snapshot half (MinValue ≤
      // T0) — the bootstrap reduction must DROP them, same contract as
      // the streamed path
      val snapshot = snapRights.toDF("sym", "ts", "price")
      // the deployment contract (operator scaladoc): BOTH streams start
      // at T0 — a pre-T0 left sees only its key's one retained snapshot
      // pair, the documented best-effort divergence, not what parity
      // probes. Null-key/null-ts lefts stay: they enrich as nulls on
      // both engines regardless of era.
      val tailLefts = lefts.filter(l => eventTs(l._2) > Base + T0 ||
        l._1 == null || l._2 == null)
      val tol = if (seed % 2 == 0) Some(90 * Minute) else None
      val streamed = runAsof(rnd, tailLefts, tailRights,
          s"fz_asof_boot_$seed", closers = false) { (l, r) =>
        Streams.asOfStream(l, r, keyCols = Seq("sym"), tsCol = "ts",
          valCols = Seq("price"), toleranceMs = tol, prefix = "asof_",
          initialSnapshot = snapshot)
      }
      val batch = asofBatch(tailLefts, rights, "backward", tol)
      assert(streamed == batch,
        s"seed=$seed tol=$tol bootstrap divergence " +
          s"(|snapshot|=${snapRights.size}, |tail|=${tailRights.size}):\n" +
          s" stream-only ${streamed -- batch}\n batch-only  ${batch -- streamed}")
    }
  }

  test("fuzz: bootstrapped nearest/forward asOfStream (snapshot ≤ T0 + " +
      "streamed tail) equal batch asOf over the concatenated history — " +
      "the snapshot serves as the backward witness for nearest") {
    val T0 = 12 * Hour
    for (seed <- Seq(71, 72); direction <- Seq("nearest", "forward")) {
      val rnd = new Random(seed)
      val (lefts, rights) = asofFixture(rnd)
      val (snapRights, tailRights) =
        rights.partition(r => eventTs(r._2) <= Base + T0)
      val snapshot = snapRights.toDF("sym", "ts", "price")
      // stream-from-T0 contract, as in the backward bootstrap fuzz; the
      // tolerance spans back across T0 so nearest can genuinely choose
      // a SNAPSHOT pair over a streamed forward right
      val tailLefts = lefts.filter(l => eventTs(l._2) > Base + T0 ||
        l._1 == null || l._2 == null)
      val tol = 4 * Hour
      val streamed = runAsof(rnd, tailLefts, tailRights,
          s"fz_asof_boot_${direction}_$seed", closers = true) { (l, r) =>
        Streams.asOfStream(l, r, keyCols = Seq("sym"), tsCol = "ts",
          valCols = Seq("price"), toleranceMs = Some(tol),
          prefix = "asof_", direction = direction,
          watermark = "10 minutes", initialSnapshot = snapshot)
      }
      val batch = asofBatch(tailLefts, rights, direction, Some(tol))
      assert(streamed == batch,
        s"seed=$seed direction=$direction bootstrap divergence " +
          s"(|snapshot|=${snapRights.size}, |tail|=${tailRights.size}):\n" +
          s" stream-only ${streamed -- batch}\n batch-only  ${batch -- streamed}")
    }
  }

  test("fuzz: forward and nearest asOfStream equal batch asOf under " +
      "in-order randomized batch boundaries — pending lefts resolved by " +
      "arrival or by the horizon timeout") {
    for (seed <- Seq(51, 52); direction <- Seq("forward", "nearest")) {
      val rnd = new Random(seed)
      val (lefts, rights) = asofFixture(rnd)
      val tol = 2 * Hour
      val streamed = runAsof(rnd, lefts, rights,
          s"fz_asof_${direction}_$seed", closers = true) { (l, r) =>
        Streams.asOfStream(l, r, keyCols = Seq("sym"), tsCol = "ts",
          valCols = Seq("price"), toleranceMs = Some(tol),
          prefix = "asof_", direction = direction,
          watermark = "10 minutes")
      }
      val batch = asofBatch(lefts, rights, direction, Some(tol))
      assert(streamed == batch,
        s"seed=$seed direction=$direction divergence:\n" +
          s" stream-only ${streamed -- batch}\n batch-only  ${batch -- streamed}")
    }
  }
}
