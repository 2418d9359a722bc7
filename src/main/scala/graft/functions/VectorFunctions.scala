package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT/DOUBLE>` embedding columns, built from
  * codegen'd higher-order builtins (`zip_with` + `aggregate`) — no UDFs, so
  * the expressions stay inside WholeStageCodegen and can be pushed around by
  * Catalyst like any other projection.
  */
object VectorFunctions {

  /** Elementwise dot product; inputs cast to double for stable math. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than sqrt for ranking). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
}
