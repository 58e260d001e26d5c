package graft.functions.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.Dedup

/** The fused native NgramJaccard must be BIT-identical to the
  * interpreted HOF formulation it replaced (r15) — same tokenization
  * (lower, split \s+, no trim), same short-doc whole-text fallback,
  * same distinct-set Jaccard — across adversarial edge shapes. */
class NgramJaccardParitySpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "one two", // shorter than n: whole text is the single gram
    "one two", // identical short pair -> jaccard 1.0
    "", // empty text: single empty token, one gram
    "  leading whitespace counts", // no-trim: empty first token
    "trailing whitespace counts  ",
    "Mixed CASE Text mixed case text mixed case",
    "a a a a a a a a", // heavy repetition -> distinct collapses
    "été 中文 tokens with unicode été")

  test("native agrees with the HOF on every pair, n in 1..4") {
    val pairs = for (a <- texts; b <- texts) yield (a, b)
    val df = pairs.toDF("a", "b")
    for (n <- 1 to 4) {
      val rows = df.select(
        Dedup.ngramJaccard(col("a"), col("b"), n).as("native"),
        Dedup.ngramJaccardHof(col("a"), col("b"), n).as("hof"))
        .as[(Double, Double)].collect()
      rows.foreach { case (nat, hof) =>
        assert(nat == hof, s"n=$n native=$nat hof=$hof") }
    }
  }

  test("identical docs score 1.0; disjoint docs score 0.0") {
    val df = Seq(("alpha beta gamma delta", "alpha beta gamma delta"),
      ("alpha beta gamma", "delta epsilon zeta")).toDF("a", "b")
    val out = df.select(Dedup.ngramJaccard(col("a"), col("b"), 2))
      .as[Double].collect()
    assert(out(0) == 1.0 && out(1) == 0.0)
  }

  test("native executes inside whole-stage codegen") {
    // non-literal input (range) so the projection isn't constant-folded
    val df = spark.range(10)
      .select(concat_ws(" ", lit("tok"), $"id".cast("string"),
        lit("alpha beta gamma")).as("t"))
      .select(Dedup.ngramJaccard(col("t"), col("t"), 3).as("j"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.as[Double].collect().forall(_ == 1.0))
  }
}
