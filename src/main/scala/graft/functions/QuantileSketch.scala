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
 * The buffer is a MUTABLE open-hash structure (kryo-encoded): the
 * aggregation hot path updates in place with zero per-row allocation —
 * an immutable Map would copy a HAMT path per input row.
 *
 * Handles positives, negatives (mirrored buckets) and zeros; NaN is
 * treated as missing. Quantile answers carry relative error <= alpha
 * for nonzero values.
 */
object QuantileSketch {

  /** Mutable sketch buffer (bucket -> count maps mutated in place). */
  final class Sketch(
      val counts: java.util.HashMap[Int, Long],
      val negCounts: java.util.HashMap[Int, Long],
      var zeros: Long,
      var total: Long) extends Serializable {
    def this() = this(new java.util.HashMap, new java.util.HashMap, 0L, 0L)
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

    override def zero: Sketch = new Sketch()

    override def reduce(s: Sketch, x: Double): Sketch = {
      if (x.isNaN) return s // NaN = missing: excluded entirely
      if (x == 0.0) s.zeros += 1
      else if (x > 0) s.counts.merge(bucket(x), 1L, (x: Long, y: Long) => x + y)
      else s.negCounts.merge(bucket(-x), 1L, (x: Long, y: Long) => x + y)
      s.total += 1
      s
    }

    override def merge(a: Sketch, b: Sketch): Sketch = {
      b.counts.forEach((k, v) => a.counts.merge(k, v, (x: Long, y: Long) => x + y))
      b.negCounts.forEach((k, v) => a.negCounts.merge(k, v, (x: Long, y: Long) => x + y))
      a.zeros += b.zeros
      a.total += b.total
      a
    }

    override def finish(s: Sketch): Double = {
      if (s.total == 0) return Double.NaN
      val rank = math.max(1L, math.ceil(q * s.total).toLong)
      import scala.jdk.CollectionConverters._
      // ascending walk: negatives (most negative first), zeros, positives
      var seen = 0L
      for (b <- s.negCounts.keySet.asScala.toSeq.sorted(Ordering[Int].reverse)) {
        seen += s.negCounts.get(b)
        if (seen >= rank) return -value(b)
      }
      seen += s.zeros
      if (seen >= rank) return 0.0
      val pos = s.counts.keySet.asScala.toSeq.sorted
      for (b <- pos) {
        seen += s.counts.get(b)
        if (seen >= rank) return value(b)
      }
      // numerical safety: fall back to the largest bucket
      pos.lastOption.map(value).getOrElse(0.0)
    }

    override def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Untyped-column form for groupBy().agg(...) and SQL registration. */
  def quantileUdaf(q: Double, alpha: Double = 0.01)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new QuantileAgg(q, alpha))
}
