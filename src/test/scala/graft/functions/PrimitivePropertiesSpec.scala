package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/**
 * Algebraic identities of the apply-primitive compiler (the SURVEY §5
 * test plan's property checks), evaluated through Spark on batched
 * random arrays — one job per property, not per case.
 */
class PrimitivePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val arrays: Seq[Seq[Double]] =
    Seq.fill(60)(Seq.fill(rnd.nextInt(12) + 1)(
      math.rint(rnd.nextDouble() * 200 - 100))) // integral doubles: exact sums

  private def evalAll(query: String): Seq[Any] = {
    arrays.toDF("m")
      .select(ArrayPrimitives(query, $"m").as("r"))
      .collect().map(_.get(0)).toSeq
  }

  test("property: sum(mul_scalar(m, k)) == k * sum(m)") {
    val lhs = evalAll("oph_sum(oph_mul_scalar(measure, 3))")
    val rhs = evalAll("oph_sum(measure)")
    lhs.zip(rhs).foreach { case (l: Double, r: Double) =>
      assert(math.abs(l - 3 * r) < 1e-9)
    }
  }

  test("property: accumulate equals scanLeft; deaccumulate inverts it") {
    val cum = evalAll("oph_accumulate(measure)")
    arrays.zip(cum).foreach { case (a, c) =>
      val want = a.tail.scanLeft(a.head)(_ + _)
      val got = c.asInstanceOf[scala.collection.Seq[Double]].toSeq
      got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    }
    val round = evalAll("oph_deaccumulate(oph_accumulate(measure))")
    arrays.zip(round).foreach { case (a, r) =>
      val got = r.asInstanceOf[scala.collection.Seq[Double]].toSeq
      got.zip(a).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    }
  }

  test("property: cummax is monotone and bounded by max") {
    val cm = evalAll("oph_accumulate(measure, 'max')")
    arrays.zip(cm).foreach { case (a, c) =>
      val got = c.asInstanceOf[scala.collection.Seq[Double]].toSeq
      assert(got == got.sorted, s"cummax not monotone: $got")
      assert(got.last == a.max)
    }
  }

  test("property: get_subarray2('1:end') is the identity") {
    val ident = evalAll("oph_get_subarray2(measure, '1:end')")
    arrays.zip(ident).foreach { case (a, r) =>
      assert(r.asInstanceOf[scala.collection.Seq[Double]].toSeq == a)
    }
  }

  test("property: reverse is an involution") {
    val twice = evalAll("oph_reverse(oph_reverse(measure))")
    arrays.zip(twice).foreach { case (a, t) =>
      assert(t.asInstanceOf[scala.collection.Seq[Double]].toSeq == a)
    }
  }

  test("property: max(m) == -min(negate(m)); count invariant under transforms") {
    val maxes = evalAll("oph_max(measure)")
    val negMins = evalAll("oph_min(oph_negate(measure))")
    maxes.zip(negMins).foreach { case (mx: Double, nm: Double) =>
      assert(mx == -nm)
    }
    val counts = evalAll("oph_count(oph_abs(oph_sum_scalar(measure, 5)))")
    arrays.zip(counts).foreach { case (a, c) => assert(c == a.length.toLong) }
  }

  test("property: sum_array(m, m) == mul_scalar(m, 2) elementwise") {
    val lhs = evalAll("oph_sum_array(measure, measure)")
    val rhs = evalAll("oph_mul_scalar(measure, 2)")
    lhs.zip(rhs).foreach { case (l, r) => assert(l == r) }
  }

  test("property: moving_avg(m, 1) == m; boxplot bounds enclose the array") {
    val id = evalAll("oph_moving_avg(measure, 1)")
    arrays.zip(id).foreach { case (a, t) =>
      val got = t.asInstanceOf[scala.collection.Seq[Double]].toSeq
      got.zip(a).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    }
    val boxes = evalAll("oph_boxplot(measure)")
    arrays.zip(boxes).foreach { case (a, b) =>
      val Seq(mn, q1, med, q3, mx) = b.asInstanceOf[scala.collection.Seq[Double]].toSeq
      assert(mn == a.min && mx == a.max)
      assert(mn <= q1 && q1 <= med && med <= q3 && q3 <= mx)
    }
  }

  test("property: quantile(1.0) == max; arg_max points at a maximal element") {
    val q1 = evalAll("oph_quantile(measure, 1.0)")
    arrays.zip(q1).foreach { case (a, q) => assert(q == a.max) }
    val am = evalAll("oph_arg_max(measure)")
    arrays.zip(am).foreach { case (a, i) =>
      assert(a(i.asInstanceOf[Long].toInt - 1) == a.max)
    }
  }
}
