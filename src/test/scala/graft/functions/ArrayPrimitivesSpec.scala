package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ArrayPrimitivesSpec extends SparkSpec {
  import spark.implicits._

  private def eval(query: String, arr: Seq[Double]): Any = {
    val df = Seq(Tuple1(arr)).toDF("m")
    df.select(ArrayPrimitives(query, $"m").as("r")).collect()(0).get(0)
  }

  test("parser handles nesting and literals") {
    val ast = ArrayPrimitives.parse("oph_sum(oph_mul_scalar(measure, 2.5))")
    assert(ast == ArrayPrimitives.Call("oph_sum", Seq(
      ArrayPrimitives.Call("oph_mul_scalar", Seq(
        ArrayPrimitives.Measure, ArrayPrimitives.Num(2.5))))))
  }

  test("parser rejects trailing input and unknown shapes") {
    intercept[IllegalArgumentException](ArrayPrimitives.parse("oph_abs(measure) x"))
    intercept[IllegalArgumentException](ArrayPrimitives.parse("123abc("))
  }

  test("unknown primitive fails at compile") {
    intercept[IllegalArgumentException](
      eval("oph_nope(measure)", Seq(1.0)))
  }

  test("elementwise primitives") {
    assert(eval("oph_mul_scalar(measure, 3)", Seq(1.0, 2.0)) == Seq(3.0, 6.0))
    assert(eval("oph_sum_scalar(measure, 1)", Seq(1.0, 2.0)) == Seq(2.0, 3.0))
    assert(eval("oph_abs(oph_negate(measure))", Seq(1.0, 2.0)) == Seq(1.0, 2.0))
    assert(eval("oph_pow(measure, 2)", Seq(2.0, 3.0)) == Seq(4.0, 9.0))
  }

  test("binary array primitives") {
    assert(eval("oph_sum_array(measure, measure)", Seq(1.0, 2.0)) == Seq(2.0, 4.0))
    assert(eval("oph_mul_array(measure, measure)", Seq(3.0, 4.0)) == Seq(9.0, 16.0))
  }

  test("predicate: threshold/then/else") {
    assert(eval("oph_predicate(measure, 2, 1, 0)", Seq(1.0, 2.0, 3.0)) ==
      Seq(0.0, 0.0, 1.0))
  }

  test("reductions") {
    assert(eval("oph_sum(measure)", Seq(1.0, 2.0, 3.0)) == 6.0)
    assert(eval("oph_avg(measure)", Seq(1.0, 2.0, 3.0)) == 2.0)
    assert(eval("oph_max(measure)", Seq(1.0, 5.0, 3.0)) == 5.0)
    assert(eval("oph_arg_max(measure)", Seq(1.0, 5.0, 3.0)) == 2L)
    assert(eval("oph_count(measure)", Seq(1.0, 5.0, 3.0)) == 3L)
  }

  test("moving average uses partial leading windows") {
    assert(eval("oph_moving_avg(measure, 3)", Seq(3.0, 6.0, 9.0, 12.0)) ==
      Seq(3.0, 4.5, 6.0, 9.0))
  }

  test("boxplot five-number summary") {
    assert(eval("oph_boxplot(measure)", Seq(4.0, 1.0, 3.0, 2.0)) ==
      Seq(1.0, 1.0, 2.0, 3.0, 4.0))
  }

  test("head/tail/reverse") {
    assert(eval("oph_head(measure, 2)", Seq(1.0, 2.0, 3.0)) == Seq(1.0, 2.0))
    assert(eval("oph_tail(measure, 2)", Seq(1.0, 2.0, 3.0)) == Seq(2.0, 3.0))
    assert(eval("oph_reverse(measure)", Seq(1.0, 2.0)) == Seq(2.0, 1.0))
  }

  test("sort and gsl alias") {
    assert(eval("oph_sort(measure)", Seq(3.0, 1.0, 2.0)) == Seq(1.0, 2.0, 3.0))
    assert(eval("oph_gsl_sort(measure)", Seq(2.0, 1.0)) == Seq(1.0, 2.0))
    assert(eval("oph_gsl_sd(measure)", Seq(2.0, 4.0)) == 1.0)
  }

  test("shift fills vacated slots; any offset magnitude") {
    assert(eval("oph_shift(measure, 1, 0)", Seq(1.0, 2.0, 3.0)) ==
      Seq(0.0, 1.0, 2.0))
    assert(eval("oph_shift(measure, -2, 9)", Seq(1.0, 2.0, 3.0)) ==
      Seq(3.0, 9.0, 9.0))
    assert(eval("oph_shift(measure, 5, 7)", Seq(1.0, 2.0)) == Seq(7.0, 7.0))
  }

  test("rotate is circular in both directions") {
    assert(eval("oph_rotate(measure, 1)", Seq(1.0, 2.0, 3.0)) ==
      Seq(3.0, 1.0, 2.0))
    assert(eval("oph_rotate(measure, -1)", Seq(1.0, 2.0, 3.0)) ==
      Seq(2.0, 3.0, 1.0))
    assert(eval("oph_rotate(measure, 4)", Seq(1.0, 2.0, 3.0)) ==
      Seq(3.0, 1.0, 2.0))
  }

  test("index-generating primitives return [] for an empty cell") {
    // sequence(1, 0) in Spark is the DESCENDING [1, 0] — without the
    // guard these would emit two garbage elements instead of []
    assert(eval("oph_shift(measure, 1, 0)", Seq.empty[Double]) == Seq())
    assert(eval("oph_rotate(measure, 2)", Seq.empty[Double]) == Seq())
    assert(eval("oph_gsl_fft(measure)", Seq.empty[Double]) == Seq())
  }

  test("padding/extend/interlace/concat reshape cells") {
    assert(eval("oph_padding(measure, 4, 0)", Seq(1.0, 2.0)) ==
      Seq(1.0, 2.0, 0.0, 0.0))
    assert(eval("oph_padding(measure, 1, 0)", Seq(1.0, 2.0)) == Seq(1.0, 2.0))
    assert(eval("oph_extend(measure, 2)", Seq(1.0, 2.0)) ==
      Seq(1.0, 1.0, 2.0, 2.0))
    assert(eval("oph_interlace(measure, oph_mul_scalar(measure, 10))",
      Seq(1.0, 2.0)) == Seq(1.0, 10.0, 2.0, 20.0))
    assert(eval("oph_concat(measure, oph_reverse(measure))", Seq(1.0, 2.0)) ==
      Seq(1.0, 2.0, 2.0, 1.0))
  }

  test("find counts matching elements") {
    assert(eval("oph_find(measure, 2)", Seq(2.0, 1.0, 2.0)) == 2L)
    assert(eval("oph_find(measure, 9)", Seq(2.0, 1.0)) == 0L)
  }

  test("gsl_histogram: uniform bins, upper bound exclusive") {
    assert(eval("oph_gsl_histogram(measure, 3, 0, 30)",
      Seq(5.0, 15.0, 15.0, 29.0, 30.0, -1.0)) == Seq(1L, 2L, 1L))
  }

  test("gsl_fft matches a naive DFT") {
    val xs = Seq(1.0, 2.0, 3.0, 5.0)
    val n = xs.length
    val expected = (0 until n).flatMap { k =>
      val re = xs.zipWithIndex.map { case (x, j) =>
        x * math.cos(-2 * math.Pi * k * j / n) }.sum
      val im = xs.zipWithIndex.map { case (x, j) =>
        x * math.sin(-2 * math.Pi * k * j / n) }.sum
      Seq(re, im)
    }
    val got = eval("oph_gsl_fft(measure)", xs)
      .asInstanceOf[scala.collection.Seq[Any]]
      .map(_.asInstanceOf[Double]).toSeq
    assert(got.length == 2 * n)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got $g expected $e") }
    // parseval sanity: sum |X_k|^2 = n * sum x_j^2
    val energy = got.grouped(2).map(p => p(0) * p(0) + p(1) * p(1)).sum
    assert(math.abs(energy - n * xs.map(x => x * x).sum) < 1e-9)
  }
}
