package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch median within the relative-accuracy bound") {
    val xs = (1 to 10000).map(_.toDouble)
    val udaf = QuantileSketch.quantileUdaf(0.5, alpha = 0.01)
    val got = xs.toDF("x").agg(udaf($"x").as("m")).as[Double].head()
    val exact = 5000.0
    assert(math.abs(got - exact) / exact <= 0.011, s"got $got")
  }

  test("sketch is order- and partitioning-independent") {
    val xs = new scala.util.Random(3).shuffle((1 to 5000).map(_.toDouble))
    val udaf = QuantileSketch.quantileUdaf(0.9, alpha = 0.02)
    val a = xs.toDF("x").repartition(2).agg(udaf($"x")).as[Double].head()
    val b = xs.sorted.toDF("x").repartition(13).agg(udaf($"x")).as[Double].head()
    assert(a == b) // deterministic buckets: identical, not just close
    assert(math.abs(a - 4500.0) / 4500.0 <= 0.021)
  }

  test("handles negatives, zeros, empty groups") {
    val udaf = QuantileSketch.quantileUdaf(0.5, alpha = 0.01)
    val med = Seq(-10.0, -5.0, 0.0, 5.0, 10.0).toDF("x")
      .agg(udaf($"x")).as[Double].head()
    assert(med == 0.0)
    val neg = Seq(-8.0, -4.0, -2.0).toDF("x").agg(udaf($"x")).as[Double].head()
    assert(math.abs(neg - (-4.0)) / 4.0 <= 0.011)
    val empty = Seq.empty[Double].toDF("x").agg(udaf($"x")).as[Double].head()
    assert(empty.isNaN)
  }

  test("grouped quantiles over lineitem agree with exact within alpha") {
    val li = spark.read.parquet(sf("lineitem"))
    val udaf = QuantileSketch.quantileUdaf(0.5, alpha = 0.01)
    val sketch = li.groupBy("l_returnflag")
      .agg(udaf(col("l_quantity")).as("m"))
      .as[(String, Double)].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("m"))
      .as[(String, Double)].collect().toMap
    sketch.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)) / exact(k) <= 0.05, s"$k: $v vs ${exact(k)}")
    }
  }
}
