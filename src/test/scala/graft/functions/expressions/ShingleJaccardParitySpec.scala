package graft.functions.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.Dedup

/** The fused ShingleJaccard must be BIT-identical to the
  * `size(array_intersect(shinglesOf(a), shinglesOf(b))) /
  * size(array_union(...))` HOF it replaced in the LSH verify step:
  * same SQL-substring character windows, same xxhash64 seed, same
  * short-text single-shingle fallback, same distinct-set division. */
class ShingleJaccardParitySpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "abc",    // shorter than k=5: whole text is the single shingle
    "abc",    // identical short pair -> 1.0
    "",       // empty: single empty shingle
    "aaaaaaaaaaaa", // heavy repetition -> distinct collapses to one
    "ababababababab",
    "été 中文 codepoints exercise SQL substring semantics été",
    "  leading and trailing spaces  ",
    "0123456789" * 8)

  test("native agrees with the HOF on every pair, k in 3..7") {
    val pairs = for (a <- texts; b <- texts) yield (a, b)
    val df = pairs.toDF("a", "b")
    for (k <- Seq(3, 5, 7)) {
      val rows = df.select(
        HashExpressions.shingle_jaccard(col("a"), col("b"), k).as("nat"),
        Dedup.shingleJaccardHof(col("a"), col("b"), k).as("hof"))
        .as[(Double, Double)].collect()
      rows.foreach { case (nat, hof) =>
        assert(nat == hof, s"k=$k native=$nat hof=$hof") }
    }
  }

  test("long unicode documents: forward-walk boundaries stay bit-exact " +
      "with the HOF (VERDICT r17 #2 — the O(chars²) substringSQL fix)") {
    // >=64 KB docs mixing 1-, 2-, 3- and 4-byte codepoints so byte
    // offsets and character offsets diverge everywhere; one edit in
    // the middle so jaccard is strictly inside (0, 1)
    val unit = "ascii été 中文混合 𝒰nicode🜚 tail "
    val bigA = unit * 2400                      // ~70k chars, ~110 KB
    val bigB = (unit * 1200) + "EDIT-POINT" + (unit * 1200)
    val df = Seq((bigA, bigB), (bigA, bigA), (bigB, bigA))
      .toDF("a", "b")
    for (k <- Seq(3, 5, 9)) {
      val rows = df.select(
        HashExpressions.shingle_jaccard(col("a"), col("b"), k).as("nat"),
        Dedup.shingleJaccardHof(col("a"), col("b"), k).as("hof"))
        .as[(Double, Double)].collect()
      rows.foreach { case (nat, hof) =>
        assert(nat == hof, s"k=$k native=$nat hof=$hof") }
      assert(rows.exists { case (nat, _) => nat > 0.0 && nat < 1.0 })
    }
  }

  test("identical docs score 1.0; disjoint docs score 0.0; codegen") {
    val df = spark.range(8)
      .select(concat(lit("document body "), $"id".cast("string")).as("a"),
        concat(lit("document body "), $"id".cast("string")).as("b"))
      .select(HashExpressions.shingle_jaccard(col("a"), col("b"), 5).as("j"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.as[Double].collect().forall(_ == 1.0))
    val dj = Seq(("abcdefgh", "stuvwxyz")).toDF("a", "b")
      .select(HashExpressions.shingle_jaccard(col("a"), col("b"), 5))
      .as[Double].head()
    assert(dj == 0.0)
  }
}
