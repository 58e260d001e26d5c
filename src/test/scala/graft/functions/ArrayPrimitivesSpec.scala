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

  private def approx(got: Any, exp: Seq[Double], tol: Double = 1e-12): Unit = {
    val g = got.asInstanceOf[scala.collection.Seq[Any]]
      .map(_.asInstanceOf[Double]).toSeq
    assert(g.length == exp.length, s"got $g expected $exp")
    g.zip(exp).foreach { case (a, b) =>
      assert(math.abs(a - b) <= tol, s"got $g expected $exp") }
  }

  test("math: function by name, quoted or reference-style") {
    approx(eval("oph_math(measure, 'sin')", Seq(0.0, math.Pi / 2)),
      Seq(0.0, 1.0), 1e-15)
    approx(eval("oph_math(measure, 'OPH_MATH_LOG10')", Seq(1.0, 100.0)),
      Seq(0.0, 2.0))
    approx(eval("oph_math(measure, sqr)", Seq(3.0, -2.0)), Seq(9.0, 4.0))
    approx(eval("oph_math(measure, 'floor')", Seq(1.7, -1.2)),
      Seq(1.0, -2.0))
    intercept[IllegalArgumentException](
      eval("oph_math(measure, 'nope')", Seq(1.0)))
  }

  test("elementwise pairing: max/min/arg of two cells") {
    assert(eval("oph_max_array(measure, oph_reverse(measure))",
      Seq(1.0, 5.0, 2.0)) == Seq(2.0, 5.0, 2.0))
    assert(eval("oph_min_array(measure, oph_reverse(measure))",
      Seq(1.0, 5.0, 2.0)) == Seq(1.0, 5.0, 1.0))
    assert(eval("oph_arg_max_array(measure, oph_reverse(measure))",
      Seq(1.0, 5.0, 2.0)) == Seq(2.0, 1.0, 1.0))
    assert(eval("oph_arg_min_array(measure, oph_reverse(measure))",
      Seq(1.0, 5.0, 2.0)) == Seq(1.0, 1.0, 2.0))
  }

  test("mask keeps nonzero-mask cells, zeroes the rest") {
    assert(eval("oph_mask(measure, oph_predicate(measure, 2, 1, 0))",
      Seq(1.0, 2.0, 3.0)) == Seq(0.0, 0.0, 3.0))
  }

  test("replace rewrites exact values; NaN `from` hits NaN cells") {
    assert(eval("oph_replace(measure, 2, 9)", Seq(1.0, 2.0, 3.0)) ==
      Seq(1.0, 9.0, 3.0))
    val got = eval("oph_replace(measure, 0.0, 7)", Seq(1.0, 0.0))
    assert(got == Seq(1.0, 7.0))
  }

  test("vector / scalar2array literals") {
    assert(eval("oph_vector(1, 2.5, 3)", Seq(0.0)) == Seq(1.0, 2.5, 3.0))
    assert(eval("oph_scalar2array(oph_sum(measure), 3)", Seq(1.0, 2.0)) ==
      Seq(3.0, 3.0, 3.0))
  }

  test("cast truncates toward zero for integer targets") {
    assert(eval("oph_cast(measure, 'int')", Seq(1.7, -1.7, 2.0)) ==
      Seq(1.0, -1.0, 2.0))
    assert(eval("oph_cast(measure, 'double')", Seq(1.7)) == Seq(1.7))
    intercept[IllegalArgumentException](
      eval("oph_cast(measure, 'complex')", Seq(1.0)))
  }

  test("accumulate: native cumulative scan, all ops") {
    assert(eval("oph_accumulate(measure)", Seq(1.0, 2.0, 3.0)) ==
      Seq(1.0, 3.0, 6.0))
    assert(eval("oph_cumsum(measure)", Seq(-1.0, 1.0)) == Seq(-1.0, 0.0))
    assert(eval("oph_accumulate(measure, 'max')", Seq(1.0, 3.0, 2.0)) ==
      Seq(1.0, 3.0, 3.0))
    assert(eval("oph_accumulate(measure, 'min')", Seq(2.0, 1.0, 3.0)) ==
      Seq(2.0, 1.0, 1.0))
    assert(eval("oph_accumulate(measure, 'mul')", Seq(2.0, 3.0, 4.0)) ==
      Seq(2.0, 6.0, 24.0))
  }

  test("deaccumulate inverts accumulate; empty cell stays empty") {
    assert(eval("oph_deaccumulate(oph_accumulate(measure))",
      Seq(1.0, 2.0, 3.0)) == Seq(1.0, 2.0, 3.0))
    assert(eval("oph_deaccumulate(measure)", Seq.empty[Double]) ==
      Seq.empty[Double])
  }

  test("get_subarray: 1-based slice; subarray2 filter syntax") {
    assert(eval("oph_get_subarray(measure, 2, 2)",
      Seq(1.0, 2.0, 3.0, 4.0)) == Seq(2.0, 3.0))
    assert(eval("oph_get_subarray2(measure, '1:2,4')",
      Seq(1.0, 2.0, 3.0, 4.0)) == Seq(1.0, 2.0, 4.0))
    assert(eval("oph_get_subarray2(measure, '2:2:end')",
      Seq(1.0, 2.0, 3.0, 4.0, 5.0)) == Seq(2.0, 4.0))
    // range past the cell clamps; fully-out-of-range part is empty
    assert(eval("oph_get_subarray2(measure, '3:9')", Seq(1.0, 2.0, 3.0)) ==
      Seq(3.0))
    assert(eval("oph_get_subarray2(measure, '7:9,1')", Seq(1.0, 2.0)) ==
      Seq(1.0))
  }

  test("gsl_stats: selected statistics in request order") {
    approx(eval("oph_gsl_stats(measure, 'mean|max|min')",
      Seq(1.0, 2.0, 3.0)), Seq(2.0, 3.0, 1.0))
    approx(eval("oph_gsl_stats(measure, 'sum+absdev')",
      Seq(1.0, 2.0, 3.0)), Seq(6.0, 2.0 / 3.0), 1e-12)
    intercept[IllegalArgumentException](
      eval("oph_gsl_stats(measure, 'mode')", Seq(1.0)))
  }

  test("operator: reduction by name; append/count_array aliases") {
    assert(eval("oph_operator(measure, 'OPH_SUM')", Seq(1.0, 2.0)) == 3.0)
    assert(eval("oph_operator(measure, max)", Seq(1.0, 5.0)) == 5.0)
    assert(eval("oph_append(measure, measure)", Seq(1.0, 2.0)) ==
      Seq(1.0, 2.0, 1.0, 2.0))
    assert(eval("oph_count_array(measure)", Seq(1.0, 2.0)) == 2L)
  }

  test("string args only where a primitive expects them") {
    intercept[IllegalArgumentException](eval("oph_abs('sin')", Seq(1.0)))
  }

  test("gsl_ifft inverts gsl_fft; complex unpack primitives") {
    val xs = Seq(1.0, -2.5, 3.0, 0.5, 7.25)
    // ifft(fft(x)) packs back as [x0, ~0, x1, ~0, ...]
    val round = eval("oph_gsl_ifft(oph_gsl_fft(measure))", xs)
      .asInstanceOf[scala.collection.Seq[Any]]
      .map(_.asInstanceOf[Double]).toSeq
    assert(round.length == 2 * xs.length)
    round.grouped(2).zip(xs.iterator).foreach { case (Seq(re, im), x) =>
      assert(math.abs(re - x) < 1e-9, s"re $re vs $x")
      assert(math.abs(im) < 1e-9, s"im $im not ~0")
    }
    val reals = eval(
      "oph_gsl_complex_get_real(oph_gsl_ifft(oph_gsl_fft(measure)))", xs)
      .asInstanceOf[scala.collection.Seq[Any]]
      .map(_.asInstanceOf[Double]).toSeq
    assert(reals.zip(xs).forall { case (g, e) => math.abs(g - e) < 1e-9 })
    // abs/arg of a known packed cell: [3,4] -> r 5, theta atan2(4,3)
    approx(eval("oph_gsl_complex_get_abs(measure)", Seq(3.0, 4.0)),
      Seq(5.0), 1e-12)
    approx(eval("oph_gsl_complex_get_arg(measure)", Seq(3.0, 4.0)),
      Seq(math.atan2(4.0, 3.0)), 1e-12)
    approx(eval("oph_gsl_complex_get_imag(measure)", Seq(3.0, 4.0)),
      Seq(4.0), 1e-12)
    // empty cell stays empty through the packed paths
    assert(eval("oph_gsl_ifft(measure)", Seq.empty[Double]) ==
      Seq.empty[Double])
  }
}
