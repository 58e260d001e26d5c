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
 * A typed `Aggregator` is the scalable shape: the buffer is ONE array
 * (+ count) per group per partition, reduced locally and merged in the
 * exchange — map-side partial aggregation with constant memory per
 * group, unlike a `collect_list` fold that would materialize every row
 * of a group before combining. Safe at 1000 executors.
 *
 * `op`: sum | max | min | avg | count. avg divides the running sums by
 * the row count at finish; count emits the per-cell row count.
 */
final case class ArrayAggBuffer(var cells: Array[Double], var n: Long)

final class ArrayCombine(op: String)
    extends Aggregator[Seq[Double], ArrayAggBuffer, Seq[Double]] {

  private def combine(a: Double, b: Double): Double = op match {
    case "max" => math.max(a, b)
    case "min" => math.min(a, b)
    case _ => a + b // sum | avg | count(cells unused)
  }

  override def zero: ArrayAggBuffer = ArrayAggBuffer(null, 0L)

  override def reduce(b: ArrayAggBuffer, a: Seq[Double]): ArrayAggBuffer = {
    if (a == null) return b
    if (b.cells == null) b.cells = a.toArray
    else {
      val n = math.min(b.cells.length, a.length)
      var i = 0
      while (i < n) { b.cells(i) = combine(b.cells(i), a(i)); i += 1 }
    }
    b.n += 1L
    b
  }

  override def merge(x: ArrayAggBuffer, y: ArrayAggBuffer): ArrayAggBuffer = {
    if (y.cells == null) return { x.n += y.n; x }
    if (x.cells == null) return { y.n += x.n; y }
    val n = math.min(x.cells.length, y.cells.length)
    var i = 0
    while (i < n) { x.cells(i) = combine(x.cells(i), y.cells(i)); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: ArrayAggBuffer): Seq[Double] =
    if (b.cells == null) Seq.empty
    else op match {
      case "avg" => b.cells.toSeq.map(_ / b.n)
      case "count" => Seq.fill(b.cells.length)(b.n.toDouble)
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
