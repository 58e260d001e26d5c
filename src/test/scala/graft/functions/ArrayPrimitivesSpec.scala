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
}
