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

  test("lmScore: common-bigram text outscores gibberish; exact values") {
    // corpus: 'a b' appears in 3 docs (cb=3, cu(a)=3+..), 'x q' once
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b"),
      (4L, "x q"), (5L, ""), (6L, "solo")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(df, "doc_id", "text",
        minCount = 2, topK = 100)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // vocab V = distinct tokens over non-empty docs: a,b,c,x,q,solo = 6
    // tables (min count 2): uni a->3, b->3, c->2; big (a,b)->3, (b,c)->2
    def lp(cb: Long, cu: Long): Double = math.log((cb + 1.0) / (cu + 6.0))
    val d1 = BigDecimal((lp(3, 3) + lp(2, 3)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d3 = BigDecimal(lp(3, 3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d4 = BigDecimal(lp(0, 0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L)) // blank+solo drop
    assert(got(0) == ((1L, 2L, d1)))
    assert(got(2) == ((3L, 1L, d3)))
    assert(got(3) == ((4L, 1L, d4)))
    assert(d1 > d4 && d3 > d4) // common text beats gibberish
    // scale shape: bounded top-K via TakeOrdered, scoring joins
    // broadcast — the corpus never sort-merge-joins on grams
    val plan = TextAnalysis.lmScore(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"), plan.take(500))
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

  test("bm25 matches the hand-computed Robertson/Lucene formula") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "nothing else here")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text",
      query = Seq("apple", "banana"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, dl=(3,2,3), avgdl=8/3; df(apple)=1, df(banana)=2
    val avgdl = 8.0 / 3.0
    def idf(df: Int) = math.log(1.0 + (3 - df + 0.5) / (df + 0.5))
    def tfn(tf: Int, dl: Int) =
      tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    def r4(x: Double) = math.rint(x * 10000) / 10000
    assert(got.keySet == Set(1L, 2L))   // doc 3 has no hit: absent
    assert(got(1L) == r4(idf(1) * tfn(2, 3) + idf(2) * tfn(1, 3)))
    assert(got(2L) == r4(idf(2) * tfn(1, 2)))
  }

  test("bm25 keeps the query-side frames broadcast — no SortMergeJoin") {
    val docs = Seq((1L, "apple pie"), (2L, "banana split"))
      .toDF("doc_id", "text")
    val plan = TextAnalysis.bm25(docs, "doc_id", "text",
      query = Seq("apple", "banana"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("BroadcastExchange"))
  }

  test("repetitionSignals matches the hand-computed gram census") {
    val docs = Seq(
      (1L, "a b a b c"),  // "a b" twice among 4 bigrams of len 3
      (2L, "x x x x"),    // total 2/3/4-gram repetition
      (3L, "solo"),       // no n-grams at all
      (4L, "")            // blank
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    // doc 1: 2-grams tot=12 best=6 dup=6; 3-grams tot=15 best=5 dup=0;
    //        4-grams tot=14 best=7 dup=0
    assert(got(1L) == Seq(0.5, 0.5, 0.3333, 0.0, 0.5, 0.0))
    // doc 2: "x x"x3 tot=9; "x x x"x2 tot=10; "x x x x"x1 tot=7
    assert(got(2L) == Seq(1.0, 1.0, 1.0, 1.0, 1.0, 0.0))
    assert(got(3L) == Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    assert(got(4L) == Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("gopherFilter verdicts and ordered fail reasons") {
    val keeper = (Seq("the") ++ (0 until 30).map(i => s"word$i"))
      .mkString(" ")
    val docs = Seq(
      (1L, Seq.fill(40)("ha").mkString(" ")), // repetitive 2-char soup
      (2L, "tiny doc"),
      (3L, keeper)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFilter(docs, "doc_id", "text")
      .select("doc_id", "keep", "fail_reasons")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2))))
      .toMap
    // doc 1: mean_wlen 2.0, no stopwords, top2=dup2=1.0
    assert(got(1L) == ((false, "wordlen_lo,stopwords,rep_top2,rep_dup2")))
    // doc 2: 2 tokens, mean 3.5, one gram (top2=1.0, dup2=0)
    assert(got(2L) == ((false, "tokens_lo,wordlen_lo,stopwords,rep_top2")))
    // doc 3: 31 tokens, 'the' present, all bigrams distinct
    assert(got(3L) == ((true, "")))
  }

  test("gopherFilter and repetitionSignals drop null text, not keep it") {
    val docs = Seq((1L, null: String)).toDF("doc_id", "text")
    val v = TextAnalysis.gopherFilter(docs, "doc_id", "text")
      .select("keep", "fail_reasons", "n_tokens").head()
    assert(!v.getBoolean(0))
    assert(v.getString(1).contains("tokens_lo"))
    assert(v.getLong(2) == 0L)
    val r = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .head().toSeq.tail
    assert(r == Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("repetitionSignals plans as a pure projection — zero exchanges") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val plan = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
