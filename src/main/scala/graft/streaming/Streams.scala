package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (SURVEY.md §2.9/M7 — not a reference
  * capability; replaces its "skip files already downloaded" incremental
  * re-run, `jigsaw/io_utils.py:89,150`, with checkpointed exactly-once file
  * ingestion).
  */
object Streams {

  /** Incremental corpus-metadata ingestion: the streaming form of
    * TagOps.loadMetadata. New `meta_<id>.json` files are picked up exactly
    * once per checkpoint; the batch query shape is identical.
    */
  def tagStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = "dataset STRING, tags ARRAY<STRING>"
    val raw = spark.readStream
      .schema(schema)
      .option("multiLine", "true")
      .option("pathGlobFilter", "meta_*.json")
      .option("maxFilesPerTrigger", 1000)
      .json(dir)
    raw
      .withColumn("image_id",
        regexp_extract(input_file_name(), "meta_([^/]+?)\\.json$", 1))
      .withColumn("tags",
        when(col("tags").isNull || size(col("tags")) === 0,
          array(lit(graft.operators.TagOps.UntaggedTag)))
          .otherwise(col("tags")))
      .select("image_id", "tags")
  }

  /** Hourly tumbling-window event aggregation with late-data handling — the
    * streaming form of q12_events_hourly. Watermark bounds state: at scale
    * this is the knob that keeps the state store finite.
    */
  def hourlyEventCounts(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact dedup: drop re-deliveries of the same key within the
    * watermark horizon (state is bounded by the watermark — the streaming
    * form of Dedup.exact for at-least-once upstream sources).
    */
  def dedupStream(df: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String = "1 hour"): DataFrame = {
    require(keyCols.nonEmpty, "dedupStream needs at least one key column")
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  final case class Event(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long,
      totalValue: Double)
  final case class Session(user_id: Long, startMs: Long, endMs: Long,
      nEvents: Long, totalValue: Double)

  /** Session windows per user with an inactivity gap, via
    * flatMapGroupsWithState (custom state — KeyValueGroupedDataset path).
    *
    * Event-time timeouts: a session closes when a later event for the same
    * user exceeds the gap, or when the WATERMARK passes lastSeen + gap —
    * data-driven, no wall clock, so state stays bounded at scale and
    * behavior is reproducible in tests. Caller must set the watermark.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, batch, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              Session(userId, s.start, s.lastSeen, s.nEvents, s.totalValue))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed += Session(userId, s.start, s.lastSeen, s.nEvents,
                    s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
