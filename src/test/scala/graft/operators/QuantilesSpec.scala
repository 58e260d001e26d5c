package graft.operators

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def disc(sorted: Seq[Double], q: Double): Double =
    sorted(math.max(1L, math.ceil(q * sorted.size).toLong).toInt - 1)

  test("exactQuantiles equals the rank-ceil(q*N) element, nulls ignored") {
    val raw = (1 to 997).map(i => ((i * 37) % 1009).toDouble)
    val df = (raw.map(Option(_)) ++ Seq(None, None))
      .toDF("x")
    val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Quantiles.exactQuantiles(df, "x", qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = raw.sorted
    qs.foreach(q => assert(got(q) == disc(sorted, q), s"q=$q"))
  }

  test("exactQuantiles survives a duplicate-heavy column (refinement)") {
    // 90% one hot value: the hot bucket exceeds a tiny collectCap and
    // forces the refinement path, which must short-circuit on lo==hi
    val vals = Seq.fill(900)(42.0) ++ (1 to 100).map(_.toDouble)
    val df = vals.toDF("x")
    val got = Quantiles.exactQuantiles(df, "x", Seq(0.5, 0.99),
      buckets = 16, collectCap = 8)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    assert(got(0.5) == disc(sorted, 0.5))
    assert(got(0.99) == disc(sorted, 0.99))
  }

  test("exactQuantiles boundary ranks: q*N integral picks that rank") {
    val df = (1 to 8).map(_.toDouble).toDF("x")
    val got = Quantiles.exactQuantiles(df, "x", Seq(0.25, 0.5))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(0.25) == 2.0 && got(0.5) == 4.0)
  }

  test("exactQuantiles rejects out-of-range q and empty input loudly") {
    val df = Seq(1.0).toDF("x")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "x", Seq(1.5))
    }
    val empty = Seq.empty[Double].toDF("x")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(empty, "x", Seq(0.5))
    }
  }
}
