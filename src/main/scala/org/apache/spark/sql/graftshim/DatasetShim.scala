package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge for Spark internals that are `private[sql]` in 4.x: moving between
  * a Dataset and its InternalRow RDD without the external-Row codec. Used by
  * [[graft.operators.Splits.withGlobalIndex]] to append a global index
  * without decoding every row to `Row` and re-encoding it back through
  * `CatalystTypeConverters` (a per-field round trip that dominates runtime
  * on wide tables). Lives inside the `org.apache.spark.sql` namespace solely
  * for access; the engine's own code stays under `graft`.
  */
object DatasetShim {

  /** The physical InternalRow RDD of a DataFrame (post-optimization plan).
    * Rows may be reused buffers — callers must `.copy()` before buffering.
    */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.toRdd

  /** Wrap an InternalRow RDD as a DataFrame without converter overhead. */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
