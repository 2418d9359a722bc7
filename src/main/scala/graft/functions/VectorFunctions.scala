package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT/DOUBLE>` embedding columns.
  *
  * The dot-product family (`dot`/`norm`/`cosine`) rides the native
  * codegen'd [[ArrayDotProduct]] expression — the same kernel the
  * `graft_dot`/`graft_cosine` SQL functions use — because Catalyst
  * higher-order functions (`zip_with`+`aggregate`) are interpreted PER
  * ELEMENT, and these primitives run once per corpus row in every
  * similarity operator. Values are identical to the HOF formulation for
  * well-formed vectors (same left-to-right summation order), and the null
  * contract matches it too: a null ARRAY, a null ELEMENT, or MISMATCHED
  * lengths give null, so corrupted or truncated vectors rank nowhere
  * instead of scoring as if the hole were 0 or the tail didn't exist.
  * The remaining helpers (`l2sq`,
  * `maxAbs`, `l2normalize`, `quantizeInt8`) stay HOF-built only because
  * they are off the similarity hot path — nothing structural prevents
  * native forms if one ever lands on it.
  */
object VectorFunctions {

  /** Elementwise dot product; inputs cast to double for stable math. */
  def dot(a: Column, b: Column): Column = ArrayDotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than sqrt for ranking). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Largest absolute component — the scale used by symmetric int8
    * quantization. 0-vectors give scale 0 (quantize guards against it).
    */
  def maxAbs(a: Column): Column =
    array_max(transform(a.cast("array<double>"), x => abs(x)))

  /** L2-normalized copy of the vector (unit length; 0-vector → 0-vector). */
  def l2normalize(a: Column): Column = {
    val n = norm(a)
    transform(a.cast("array<double>"),
      x => when(n === 0.0, 0.0).otherwise(x / n))
  }

  /** Symmetric int8 scalar quantization: q_i = round(127 · x_i / maxAbs),
    * the standard vector-index compression (4× smaller than float32, exact
    * integer math after the scale division so results are engine-portable).
    * Dequantize with `q_i · maxAbs / 127`. 0-vectors quantize to all-0.
    */
  def quantizeInt8(a: Column, scale: Column): Column =
    transform(a.cast("array<double>"),
      x => when(scale === 0.0, lit(0))
        .otherwise(round(lit(127.0) * x / scale, 0).cast("int")))
}
