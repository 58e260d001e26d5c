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

  test("graft_cosine_sim callable from SQL") {
    import spark.implicits._
    Seq((Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0)))
      .toDF("a", "b", "c").createOrReplaceTempView("cos_t")
    val out = spark.sql(
      """SELECT graft_cosine_sim(a, b) AS same,
                graft_cosine_sim(a, c) AS orth FROM cos_t""")
      .as[(Double, Double)].head()
    assert(math.abs(out._1 - 1.0) < 1e-12 && math.abs(out._2) < 1e-12)
  }

  test("graft_cosine_sim accepts array<float>/array<int> like the Scala API") {
    import spark.implicits._
    Seq((Seq(1.0f, 2.0f), Seq(1, 2)))
      .toDF("f", "i").createOrReplaceTempView("cos_ft")
    val out = spark.sql(
      "SELECT graft_cosine_sim(f, i) AS s FROM cos_ft").as[Double].head()
    assert(math.abs(out - 1.0) < 1e-12)
  }
}
