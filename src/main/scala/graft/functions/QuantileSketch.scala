package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Mergeable streaming-quantile sketch as a typed `Aggregator` — the
 * custom-aggregation extension point SURVEY §4 reserves for statistical
 * reductions the builtins lack. The reference exposes exact `quantile`
 * over in-cell arrays; at 100 TB an explicit-dim quantile needs a
 * mergeable sketch instead of a sort.
 *
 * Design: DDSketch-style log-scaled buckets with relative accuracy
 * `alpha` — bucket(x) = ceil(log_gamma(x)), gamma = (1+alpha)/(1-alpha).
 * Deterministic and order-independent (bucket counts simply add), so
 * map-side partial aggregation works and results are reproducible
 * across partitionings — unlike sampling sketches.
 *
 * Handles positives, negatives (mirrored buckets) and zeros. Quantile
 * answers carry relative error <= alpha for nonzero values.
 */
object QuantileSketch {

  final case class Sketch(
      counts: Map[Int, Long],    // log-bucket -> count (positives)
      negCounts: Map[Int, Long], // mirrored buckets for negatives
      zeros: Long,
      total: Long)

  object Sketch {
    val empty: Sketch = Sketch(Map.empty, Map.empty, 0L, 0L)
  }

  final class QuantileAgg(q: Double, alpha: Double = 0.01)
      extends Aggregator[Double, Sketch, Double] {
    require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
    private val gamma = (1 + alpha) / (1 - alpha)
    private val logGamma = math.log(gamma)

    private def bucket(x: Double): Int =
      math.ceil(math.log(x) / logGamma).toInt

    /** midpoint value represented by a bucket */
    private def value(b: Int): Double =
      2.0 * math.pow(gamma, b) / (gamma + 1)

    override def zero: Sketch = Sketch.empty

    override def reduce(s: Sketch, x: Double): Sketch =
      if (x.isNaN) s // NaN = missing: excluded, not counted as zero
      else if (x == 0.0) s.copy(zeros = s.zeros + 1, total = s.total + 1)
      else if (x > 0) {
        val b = bucket(x)
        s.copy(counts = s.counts + (b -> (s.counts.getOrElse(b, 0L) + 1)),
          total = s.total + 1)
      } else {
        val b = bucket(-x)
        s.copy(negCounts = s.negCounts + (b -> (s.negCounts.getOrElse(b, 0L) + 1)),
          total = s.total + 1)
      }

    override def merge(a: Sketch, b: Sketch): Sketch = Sketch(
      counts = (a.counts.keySet ++ b.counts.keySet).map(k =>
        k -> (a.counts.getOrElse(k, 0L) + b.counts.getOrElse(k, 0L))).toMap,
      negCounts = (a.negCounts.keySet ++ b.negCounts.keySet).map(k =>
        k -> (a.negCounts.getOrElse(k, 0L) + b.negCounts.getOrElse(k, 0L))).toMap,
      zeros = a.zeros + b.zeros,
      total = a.total + b.total)

    override def finish(s: Sketch): Double = {
      if (s.total == 0) return Double.NaN
      val rank = math.max(1L, math.ceil(q * s.total).toLong)
      // ascending walk: negatives (most negative first), zeros, positives
      var seen = 0L
      for (b <- s.negCounts.keys.toSeq.sorted(Ordering[Int].reverse)) {
        seen += s.negCounts(b)
        if (seen >= rank) return -value(b)
      }
      seen += s.zeros
      if (seen >= rank) return 0.0
      for (b <- s.counts.keys.toSeq.sorted) {
        seen += s.counts(b)
        if (seen >= rank) return value(b)
      }
      // numerical safety: fall back to the largest bucket
      s.counts.keys.toSeq.sorted.lastOption.map(value)
        .getOrElse(0.0)
    }

    override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Untyped-column form for groupBy().agg(...) and SQL registration. */
  def quantileUdaf(q: Double, alpha: Double = 0.01)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new QuantileAgg(q, alpha))
}
