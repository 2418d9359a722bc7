package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame program plus (optionally) an
  * equivalent ANSI-SQL oracle the driver runs in DuckDB over the same parquet
  * tables. Queries with no SQL-expressible oracle (seeded sampling, MinHash,
  * …) set `oracle = None` and get a weaker rows-only check.
  *
  * Determinism contract (driver hash-compares values): every query ends in a
  * total ORDER BY, every float aggregate is rounded, every timestamp is
  * formatted to a string, and DuckDB integer sums are cast to BIGINT so both
  * engines produce identical (column-name, value) multisets.
  */
final case class Query(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Query {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Query =
    Query(name, run, Some(oracle))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Query =
    Query(name, run, None)
}
