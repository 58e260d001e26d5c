package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(implicit
      e: org.apache.spark.sql.Encoder[T]): T =
    Seq(Tuple1(text)).toDF("t").select(c.as("r")).as[T].head()

  test("tokenCount handles empties and runs of whitespace") {
    assert(one[Long](TextAnalysis.tokenCount($"t"), "a b  c") == 3L)
    assert(one[Long](TextAnalysis.tokenCount($"t"), "") == 0L)
    assert(one[Long](TextAnalysis.tokenCount($"t"), "   ") == 0L)
    assert(one[Long](TextAnalysis.tokenCount($"t"), "one") == 1L)
  }

  test("punctRatio counts sentence punctuation") {
    assert(one[Double](TextAnalysis.punctRatio($"t"), "ab.,") == 0.5)
    assert(one[Double](TextAnalysis.punctRatio($"t"), "") == 0.0)
  }

  test("alphaTokenRatio") {
    assert(one[Double](TextAnalysis.alphaTokenRatio($"t"), "abc 123 def") ==
      2.0 / 3.0)
  }

  test("stopwordRatio counts language stopwords") {
    assert(one[Double](TextAnalysis.stopwordRatio($"t", "en"),
      "the cat and the dog") == 3.0 / 5.0)
  }

  test("langId picks the dominant stopword language") {
    assert(one[String](TextAnalysis.langId($"t"),
      "the cat and the dog is here") == "en")
    assert(one[String](TextAnalysis.langId($"t"),
      "der hund und die katze ist nicht da") == "de")
    assert(one[String](TextAnalysis.langId($"t"),
      "xyzzy plugh qwerty") == "und")
  }

  test("tfidf matches the closed-form score on a tiny corpus") {
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidf(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Double)].collect()
    // df: a->2 (idf 0), b/c->1 (idf ln 2); doc1 = 1*ln2, doc2 = 1*ln2
    val ln2 = math.rint(math.log(2) * 10000) / 10000
    assert(got.toSeq == Seq((1L, ln2), (2L, ln2)))
  }

  test("fingerprint is deterministic, normalized, and content-sensitive") {
    val fp1 = one[Long](TextAnalysis.fingerprint($"t"), "Hello   World")
    val fp2 = one[Long](TextAnalysis.fingerprint($"t"), "hello world")
    val fp3 = one[Long](TextAnalysis.fingerprint($"t"), "hello worlds")
    assert(fp1 == fp2)   // case + whitespace normalized
    assert(fp2 != fp3)
    assert(fp1 >= 0L && fp1 < 1000000007L)
  }

  test("PII redaction replaces emails and phones, counts match") {
    val t = "write to alice.smith+x@corp.example.org or call " +
      "+44 (20) 7946-0958 today; bob@bad leaves no address"
    assert(one[String](TextAnalysis.redactPii($"t"), t) ==
      "write to <EMAIL> or call <PHONE> today; bob@bad leaves no address")
    assert(one[Long](TextAnalysis.emailCount($"t"), t) == 1L)
    assert(one[Long](TextAnalysis.phoneCount($"t"), t) == 1L)
    // clean text passes through untouched
    val clean = "no contact details at all here"
    assert(one[String](TextAnalysis.redactPii($"t"), clean) == clean)
    assert(one[Long](TextAnalysis.emailCount($"t"), clean) == 0L)
  }

  test("qualityScore is bounded and ranks prose above noise") {
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "the cat is seen in the garden for a while with all of them there"
    val noise = ";;; !!! ??? ,,, ... 123 456"
    val p = one[Double](TextAnalysis.qualityScore($"t"), prose)
    val n = one[Double](TextAnalysis.qualityScore($"t"), noise)
    assert(p > n)
    assert(p >= 0.0 && p <= 1.0 && n >= 0.0 && n <= 1.0)
  }
}
