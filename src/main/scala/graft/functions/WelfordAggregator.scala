package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-element (e.g. per-pixel) streaming mean/variance over equal-length
  * float tensors — the reference's Welford aggregate
  * (`jigsaw/models/feature_points/model.py:75-90` update, `:103-113`
  * finalize) made distributable.
  *
  * The reference's update is the sequential Welford recurrence; a Spark
  * aggregation also needs a MERGE of two partial states, which is the Chan
  * et al. parallel form:
  *
  *   delta = meanB - meanA
  *   mean  = meanA + delta * nB / (nA + nB)
  *   M2    = M2A + M2B + delta² * nA·nB / (nA + nB)
  *
  * Finalize: (mean, stdev = sqrt(M2 / n)) — population stdev, matching the
  * reference's `sqrt(M2/count)`.
  *
  * Shape contract (F10, `feature_points/model.py:79-80,123-126`): every
  * tensor must match the first-seen length; mismatch raises.
  */
final case class WelfordBuffer(n: Long, mean: Array[Double],
    m2: Array[Double])

final case class WelfordResult(count: Long, mean: Seq[Double],
    stdev: Seq[Double])

class WelfordAggregator
    extends Aggregator[Seq[Float], WelfordBuffer, WelfordResult] {

  override def zero: WelfordBuffer =
    WelfordBuffer(0L, Array.empty, Array.empty)

  override def reduce(b: WelfordBuffer, a: Seq[Float]): WelfordBuffer = {
    if (b.n == 0L) {
      val mean = a.map(_.toDouble).toArray
      WelfordBuffer(1L, mean, Array.fill(a.length)(0.0))
    } else {
      require(a.length == b.mean.length,
        s"tensor shape mismatch: ${a.length} vs first-seen ${b.mean.length}")
      val n1 = b.n + 1
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble
        val delta = x - b.mean(i)
        b.mean(i) += delta / n1
        b.m2(i) += delta * (x - b.mean(i))
        i += 1
      }
      WelfordBuffer(n1, b.mean, b.m2)
    }
  }

  override def merge(a: WelfordBuffer, b: WelfordBuffer): WelfordBuffer = {
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      require(a.mean.length == b.mean.length,
        s"tensor shape mismatch in merge: ${a.mean.length} vs ${b.mean.length}")
      val n = a.n + b.n
      val mean = new Array[Double](a.mean.length)
      val m2 = new Array[Double](a.mean.length)
      var i = 0
      while (i < a.mean.length) {
        val delta = b.mean(i) - a.mean(i)
        mean(i) = a.mean(i) + delta * b.n / n
        m2(i) = a.m2(i) + b.m2(i) + delta * delta * a.n * b.n / n
        i += 1
      }
      WelfordBuffer(n, mean, m2)
    }
  }

  override def finish(r: WelfordBuffer): WelfordResult =
    WelfordResult(r.n,
      r.mean.toSeq,
      r.m2.map(v => math.sqrt(v / math.max(r.n, 1L))).toSeq)

  override def bufferEncoder: Encoder[WelfordBuffer] =
    Encoders.product[WelfordBuffer]
  override def outputEncoder: Encoder[WelfordResult] =
    Encoders.product[WelfordResult]
}

object WelfordAggregator {
  /** Column form: `df.agg(WelfordAggregator.of($"tensor"))`. */
  def of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(new WelfordAggregator).apply(c)
  }
}
