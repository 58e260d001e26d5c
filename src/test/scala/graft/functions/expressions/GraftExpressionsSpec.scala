package graft.functions.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import graft.SparkSpec

class GraftExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("moving_avg matches hand-computed partial-window means") {
    val out = Seq(Tuple1(Seq(3.0, 6.0, 9.0, 12.0))).toDF("a")
      .select(GraftExpressions.moving_avg($"a", 3).as("m"))
      .as[Seq[Double]].head()
    assert(out == Seq(3.0, 4.5, 6.0, 9.0))
  }

  test("moving_avg k=1 is identity; empty array passes through") {
    val df = Seq(Tuple1(Seq(1.0, 2.0)), Tuple1(Seq.empty[Double])).toDF("a")
    val rows = df.select(GraftExpressions.moving_avg($"a", 1).as("m"))
      .as[Seq[Double]].collect()
    assert(rows(0) == Seq(1.0, 2.0))
    assert(rows(1) == Seq.empty[Double])
  }

  test("moving_avg agrees with the interpreted HOF formulation") {
    val arrs = (1 to 50).map(i =>
      Tuple1((1 to (i % 13) + 1).map(j => (i * j % 17).toDouble)))
    val df = arrs.toDF("a")
    val k = 4
    val hof = transform($"a", (_, i0) => {
      val start = greatest(i0 - lit(k - 1), lit(0)) + 1
      val len = i0 + 1 - start + 1
      val win = slice($"a", start.cast("int"), len.cast("int"))
      F.aggregate(win, lit(0.0), (acc, x) => acc + x) / size(win).cast("double")
    })
    val both = df.select(
      GraftExpressions.moving_avg($"a", k).as("native"),
      hof.as("hof")).as[(Seq[Double], Seq[Double])].collect()
    both.foreach { case (n, h) =>
      n.zip(h).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("moving_avg executes inside whole-stage codegen") {
    // non-literal input (range) so the projection isn't constant-folded
    val df = spark.range(10)
      .select(array($"id".cast("double"), ($"id" + 1).cast("double")).as("a"))
      .select(GraftExpressions.moving_avg($"a", 2).as("m"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.count() == 10)
  }

  test("poly_hash is the documented polynomial mod prime") {
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    val inputs = Seq("", "a", "hello world", "Hello World", "ü-umlaut")
    val got = inputs.toDF("s")
      .select(GraftExpressions.poly_hash($"s").as("h")).as[Long].collect()
    inputs.zip(got).foreach { case (s, h) => assert(h == ref(s), s) }
  }

  test("poly_hash null propagates") {
    val got = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(GraftExpressions.poly_hash($"s").as("h"))
      .as[Option[Long]].collect()
    assert(got(0).isEmpty && got(1).nonEmpty)
  }
}
