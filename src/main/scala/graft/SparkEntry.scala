package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{JigsawSurface, PipelineQueries, Query, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-area registries under [[graft.queries]];
  * each [[Query]] carries its Spark program and (when SQL-expressible) the
  * DuckDB oracle the driver hash-compares against.
  */
object SparkEntry {

  /** All registered queries, in registration order. */
  def registry: Seq[Query] =
    Relational.all ++ JigsawSurface.all ++ PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A mini jigsaw pipeline over `documents`: tag filters → union+dedup →
    * seeded sample, i.e. the reference's filter-and-load path (§3.2) on the
    * harness data.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.operators.TagOps
    val docs = graft.core.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("tags", array(col("lang"), col("source")))
    val sets = Seq(
      TagOps.andFilter(docs, Seq("en")),
      TagOps.orFilter(docs, Seq("de", "fr")))
    TagOps.sampleExact(TagOps.joinSets(sets, key = "doc_id"),
      n = 25, seed = 42, key = "doc_id")
      .select("doc_id", "lang", "source")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
