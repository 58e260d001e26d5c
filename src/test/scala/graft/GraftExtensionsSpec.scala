package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  // getOrCreate would ignore withExtensions once the shared test
  // session exists, so register into it directly — the same descriptors
  // the SparkSessionExtensions path injects
  private lazy val spark = {
    val s = SparkTestBase.spark
    GraftExtensions.register(s)
    s
  }

  test("graft_moving_avg callable from SQL") {
    import spark.implicits._
    Seq(Tuple1(Seq(2.0, 4.0, 6.0))).toDF("a").createOrReplaceTempView("t")
    val out = spark.sql("SELECT graft_moving_avg(a, 2) AS m FROM t")
      .as[Seq[Double]].head()
    assert(out == Seq(2.0, 3.0, 5.0))
  }

  test("graft_poly_hash callable from SQL and rejects bad arity") {
    import spark.implicits._
    val h = spark.sql("SELECT graft_poly_hash('abc') AS h").as[Long].head()
    val ref = "abc".foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)
    assert(h == ref)
    intercept[Exception](
      spark.sql("SELECT graft_moving_avg(array(1.0))").collect())
  }
}
