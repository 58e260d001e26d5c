package graft.functions.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.Dedup

/** The native ExciseSpans (sorted two-pointer walk, VERDICT r16 #7)
  * must be BIT-identical to the per-token existential HOF it replaced:
  * same tokenization (SQL trim = spaces only, split \s+ keeps a leading
  * empty token), same drop set for overlapping / unsorted / duplicate
  * spans, same single-space re-join, and identical pass-through for
  * documents with no span row. */
class StripSpansParitySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"),
    (3L, "  leading whitespace counts here"), // trim strips the lead
    (4L, "trailing whitespace counts  "),
    (5L, "single"),
    (6L, ""), // empty doc: one empty token at index 0
    (7L, "tab\tand\nnewline separated tokens stay intact"),
    (8L, "a b c d e f g h i j k l m n o p q r s t"),
    (9L, "no spans here at all"),
    (10L, "été 中文 unicode tokens survive excision été 中文"))
    .toDF("doc_id", "text")

  // overlapping, unsorted, duplicated, and out-of-range spans on
  // purpose — the HOF's existential semantics must be reproduced
  private val spans = Seq(
    (1L, 2L, 4L), (1L, 3L, 6L),   // overlap -> tokens 2..6 drop
    (2L, 5L, 7L), (2L, 0L, 0L),   // unsorted arrival order
    (3L, 0L, 1L),
    (4L, 2L, 9L),                 // reaches past the last token
    (5L, 0L, 0L),                 // whole doc -> empty string
    (6L, 0L, 0L),                 // the empty token drops too
    (8L, 1L, 3L), (8L, 1L, 3L),   // duplicate span rows
    (8L, 10L, 12L), (8L, 11L, 11L),
    (10L, 1L, 1L))
    .toDF("doc_id", "span_start", "span_end")

  test("native stripSpans is bit-identical to the HOF form") {
    val nat = Dedup.stripSpans(docs, spans, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    val hof = Dedup.stripSpansHof(docs, spans, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(nat.keySet == hof.keySet)
    nat.keySet.toSeq.sorted.foreach { id =>
      assert(nat(id) == hof(id),
        s"doc $id: native='${nat(id)}' hof='${hof(id)}'")
    }
    // spot-pin the interesting shapes so a joint drift in both forms
    // can't pass silently
    assert(nat(1L) == "the quick lazy dog") // tokens 2..6 excised
    assert(nat(5L) == "")
    assert(nat(9L) == "no spans here at all") // no spans: verbatim
  }

  test("native excision executes inside whole-stage codegen") {
    val df = spark.range(8)
      .select($"id", concat_ws(" ", lit("a b c d"),
        $"id".cast("string")).as("t"),
        array(struct(lit(1L).as("s"), lit(2L).as("e"))).as("sp"))
      .select(HashExpressions.excise_spans(col("t"), col("sp")).as("out"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.as[String].collect().forall(s =>
      s.startsWith("a d ")), df.as[String].collect().mkString("|"))
  }
}
