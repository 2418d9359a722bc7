package graft.core

import org.apache.spark.sql.SparkSession

/** One place for engine session config so Verify / Bench / tests agree.
  *
  * Scale notes: shuffle partitions default to the local core count here; on a
  * real cluster this is AQE-governed (`spark.sql.adaptive.coalescePartitions`)
  * with `initialPartitionNum` sized to ~2-3× total cores. Nothing in the
  * library assumes local mode.
  */
object GraftSession {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def builder(appName: String): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // engine SQL functions + plan rewrites via the standard extension
      // point — the same line a cluster deployment puts in spark-defaults
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS) which vanilla Spark rejects;
      // read as long and let Tables.load restore a timestamp column.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata timestamps are parquet timestamp[us] WITHOUT the
      // adjusted-to-UTC flag; by default Spark 3.4+ infers those as
      // TIMESTAMP_NTZ, which unix_millis/unix_micros reject. Read them as
      // TimestampType (the session TZ above is UTC, so the micros are
      // identical) — the same instant semantics DuckDB's oracle applies to
      // the same files.
      // COUPLING: this flag is session-global and only lossless BECAUSE
      // the session TZ above is pinned to UTC — under any other TZ a
      // genuinely wall-clock (NTZ) parquet column would silently shift
      // when reinterpreted as an instant. If this session ever reads
      // non-testdata parquet with intended-NTZ semantics, scope the flag
      // to the testdata read path instead of setting it here.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")

  def get(appName: String): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the extensions conf above injects RangeJoinRewrite into the
    // operator-optimization batch, which runs BEFORE RewriteSubquery turns
    // EXISTS/IN predicates into semi/anti joins; this second, late-batch
    // registration catches those (idempotent — see its doc)
    graft.GraftExtensions.registerLateRule(spark)
    spark
  }
}
