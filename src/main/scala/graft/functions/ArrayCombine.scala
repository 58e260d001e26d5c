package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Elementwise array aggregation — the engine of `oph_aggregate` over
 * ARRAY-measure cubes (the reference collapses fragments of array cubes
 * cell-by-cell: fragment-local partial then global final,
 * `/root/reference/src/oph_json/oph_json_objkeys.h:98` operator).
 *
 * A typed `Aggregator` is the scalable shape: the buffer is ONE cell
 * array + ONE count array per group per partition, reduced locally and
 * merged in the exchange — map-side partial aggregation with constant
 * memory per group, unlike a `collect_list` fold that would materialize
 * every row of a group before combining. Safe at 1000 executors.
 *
 * Ragged inputs are handled associatively: the buffer extends to the
 * LONGEST array seen and each cell tracks how many rows contributed, so
 * cell i aggregates exactly the rows that have a position i — the
 * merge order can never change the result.
 *
 * `op`: sum | max | min | avg | count. avg divides each cell's running
 * sum by that cell's contribution count; count emits the counts.
 */
final case class ArrayAggBuffer(var cells: Array[Double], var counts: Array[Long])

final class ArrayCombine(op: String)
    extends Aggregator[Seq[Double], ArrayAggBuffer, Seq[Double]] {

  private def combine(a: Double, b: Double): Double = op match {
    case "max" => math.max(a, b)
    case "min" => math.min(a, b)
    case _ => a + b // sum | avg | count(cells unused)
  }

  private def grow(b: ArrayAggBuffer, n: Int): Unit = {
    if (b.cells == null) {
      b.cells = new Array[Double](n)
      b.counts = new Array[Long](n)
    } else if (b.cells.length < n) {
      b.cells = java.util.Arrays.copyOf(b.cells, n)
      b.counts = java.util.Arrays.copyOf(b.counts, n)
    }
  }

  override def zero: ArrayAggBuffer = ArrayAggBuffer(null, null)

  override def reduce(b: ArrayAggBuffer, a: Seq[Double]): ArrayAggBuffer = {
    if (a == null) return b
    grow(b, a.length)
    var i = 0
    a.foreach { v =>
      b.cells(i) = if (b.counts(i) == 0L) v else combine(b.cells(i), v)
      b.counts(i) += 1L
      i += 1
    }
    b
  }

  override def merge(x: ArrayAggBuffer, y: ArrayAggBuffer): ArrayAggBuffer = {
    if (y.cells == null) return x
    if (x.cells == null) return y
    val (big, small) = if (x.cells.length >= y.cells.length) (x, y) else (y, x)
    var i = 0
    while (i < small.cells.length) {
      if (small.counts(i) > 0L)
        big.cells(i) =
          if (big.counts(i) == 0L) small.cells(i)
          else combine(big.cells(i), small.cells(i))
      big.counts(i) += small.counts(i)
      i += 1
    }
    big
  }

  override def finish(b: ArrayAggBuffer): Seq[Double] =
    if (b.cells == null) Seq.empty
    else op match {
      case "avg" => b.cells.toSeq.zip(b.counts).map { case (s, n) =>
        if (n == 0L) Double.NaN else s / n }
      case "count" => b.counts.toSeq.map(_.toDouble)
      case _ => b.cells.toSeq
    }

  override def bufferEncoder: Encoder[ArrayAggBuffer] =
    Encoders.product[ArrayAggBuffer]
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object ArrayCombine {
  val ops: Set[String] = Set("sum", "max", "min", "avg", "count")

  /** Column function: elementwise-aggregate an array column. */
  def apply(op: String): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(ops.contains(op), s"ArrayCombine op '$op'")
    org.apache.spark.sql.functions.udaf(new ArrayCombine(op),
      ExpressionEncoder[Seq[Double]]())
  }
}
