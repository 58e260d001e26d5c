package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats computes Gopher-style ratios") {
    val df = Seq(
      (1L, "a b a b a"),            // 2 distinct / 5; g2 = ab ba ab ba -> dup 0.5; top a = 3/5
      (2L, "all words here differ"),
      (3L, "")).toDF("doc_id", "text")
    val r = CorpusOps.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getDouble(1) == 0.4)     // distinct_token_ratio
    assert(r(0).getDouble(2) == 0.5)     // dup_2gram_frac
    assert(r(0).getDouble(3) == 0.6)     // top_token_frac
    assert(r(1).getDouble(1) == 1.0)
    assert(r(1).getDouble(2) == 0.0)
    assert(r(1).getDouble(3) == 0.25)
    assert(r(2).getDouble(1) == 0.0 && r(2).getDouble(2) == 0.0 &&
      r(2).getDouble(3) == 0.0)          // empty doc: all guards fire
  }

  test("decontaminate flags exactly the docs sharing a 5-gram") {
    val docs = Seq(
      (1L, "q w e r t y u i o p"),      // contains the benchmark 5-grams
      (2L, "totally unrelated words live here now"),
      (3L, "x q w e r t z z z")         // shares 'q w e r t' only
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("q w e r t y")).toDF("text")
    val r = CorpusOps.decontaminate(docs, bench, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
    // bench grams: "q w e r t", "w e r t y"
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((1L, 2L), (3L, 1L)))
    // the benchmark side broadcasts — no shuffle of the corpus side
    val plan = CorpusOps.decontaminate(docs, bench, "doc_id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("domainStats extracts hostnames and honors the blocklist") {
    val df = Seq(
      (1L, "go to https://a.example.org/x and http://b.example.org/y"),
      (2L, "again https://a.example.org/z plus https://bad.example.com/k"),
      (3L, "no urls at all")).toDF("doc_id", "text")
    val r = CorpusOps.domainStats(df, "doc_id", "text",
        blocklist = Seq("bad.example.com"))
      .orderBy("domain").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq(("a.example.org", 2L, 2L), ("b.example.org", 1L, 1L)))
  }

  test("packShards matches the sequential exclusive-prefix assignment") {
    // weights 30,40,50,... over ids 1..40; budget 200
    val rows = (1L to 40L).map(i => (i, 20L + 10L * (i % 5)))
    val df = rows.toDF("doc_id", "w")
    val got = CorpusOps.packShards(df, "doc_id", "w", budget = 200L,
        numPartitions = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L
    val want = rows.map { case (id, w) =>
      val shard = (cum / 200L); cum += w; (id, shard)
    }
    assert(got.toSeq == want)
    // more than one shard actually produced
    assert(got.map(_._2).distinct.length > 3)
  }

  test("spanDedup counts globally duplicated token windows per doc") {
    val base = "a b c d e f g h i j k l"      // 12 tokens -> 3 windows @ w=10
    val df = Seq(
      (1L, base),                             // duplicated by doc 2
      (2L, base),
      (3L, "totally different words one two three four five six seven"),
      (4L, "short doc")                       // < 10 tokens: no windows
    ).toDF("doc_id", "text")
    val r = CorpusOps.spanDedup(df, "doc_id", "text", w = 10)
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L)) // doc 4 absent
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 3 &&
      r(0).getDouble(3) == 1.0)              // all windows duplicated
    assert(r(1).getLong(2) == 3)
    assert(r(2).getLong(1) == 1 && r(2).getLong(2) == 0 &&
      r(2).getDouble(3) == 0.0)
  }

  test("spanDedupSalted matches spanDedup exactly on a hot-boilerplate corpus") {
    // doc texts share ONE boilerplate window (the hot key: 24 copies,
    // >= the test threshold) plus per-doc unique windows and a
    // cold-duplicated pair — the parity must hold across the
    // hot-broadcast path, the cold-join path, and the unique path
    val boiler = "standard legal footer text all rights reserved inc ltd"
    val docs = (1L to 24L).map { i =>
      (i, s"$boiler unique body $i with words w${i}a w${i}b w${i}c w${i}d")
    } ++ Seq(
      (100L, "cold duplicated sentence pair one two three four five six"),
      (101L, "cold duplicated sentence pair one two three four five six"),
      (102L, "entirely unique document nine eight seven six five four three"))
    val df = docs.toDF("doc_id", "text")
    for (w <- Seq(5, 10)) {
      val plain = CorpusOps.spanDedup(df, "doc_id", "text", w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val salted = CorpusOps.spanDedupSalted(df, "doc_id", "text", w,
        hotThreshold = 20L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(salted == plain, s"w=$w:\n${(salted diff plain).take(3)} | " +
        s"${(plain diff salted).take(3)}")
    }
    // degenerate thresholds: everything hot / nothing hot still exact
    val plain = CorpusOps.spanDedup(df, "doc_id", "text", 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    for (t <- Seq(2L, 1000000L)) {
      val s2 = CorpusOps.spanDedupSalted(df, "doc_id", "text", 10, t)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(s2 == plain, s"threshold $t diverged")
    }
  }

  test("native word_gram_hashes matches the HOF formulation bit-for-bit") {
    val texts = Seq("The  quick   Brown fox jumps over the lazy dog",
      " padded   both  ends ", "one two", "single", "", "   ",
      "a b c d e f g h i j k l m n o p")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- Seq(2, 5)) {
      val tk = split(lower(trim(col("text"))), "\\s+")
      val hof = when(size(tk) >= n,
        transform(sequence(lit(1), size(tk) - (n - 1)),
          i => xxhash64(concat_ws(" ", slice(tk, i, lit(n))))))
        .otherwise(array().cast("array<long>"))
      val native = graft.functions.expressions.HashExpressions
        .word_gram_hashes(col("text"), n)
      val rows = df.select(col("id"), hof.as("h"), native.as("v"))
        .as[(Long, Seq[Long], Seq[Long])].collect()
      rows.foreach { case (id, h, v) =>
        assert(h == v, s"mismatch for id=$id n=$n: $h vs $v") }
    }
  }

  test("property: native gram hashes match the HOF on random texts") {
    // 300 random texts over a nasty alphabet (runs of every \s class,
    // unicode letters, empties) — one batched DataFrame comparison
    val rnd = new scala.util.Random(7)
    val alphabet = "ab YZ\t\n\r\f\u000B  é Ж 9 .,"
    val texts = Seq.fill(300) {
      val len = rnd.nextInt(60)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val n = 3
    val tk = split(lower(trim(col("text"))), "\\s+")
    val hof = when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => xxhash64(concat_ws(" ", slice(tk, i, lit(n))))))
      .otherwise(array().cast("array<long>"))
    val native = graft.functions.expressions.HashExpressions
      .word_gram_hashes(col("text"), n)
    val bad = df.filter(not(hof <=> native)).count()
    assert(bad == 0, s"$bad/300 random texts mismatched")
  }

  test("property: native top-token count matches the HOF on random arrays") {
    // same nasty alphabet; arrays include empty strings, repeats, and
    // null elements (null groups count 0 under BOTH formulations)
    val rnd = new scala.util.Random(11)
    val pool = Seq("a", "b", "ab", "", "é", "Ж", "a b", "\t")
    val arrays: Seq[Seq[String]] = Seq.fill(300) {
      val len = rnd.nextInt(30)
      (1 to len).map(_ =>
        if (rnd.nextInt(10) == 0) null else pool(rnd.nextInt(pool.size)))
    }
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "tk")
    val hof = when(size(col("tk")) === 0, lit(0)).otherwise(
      array_max(transform(array_distinct(col("tk")),
        t => size(filter(col("tk"), x => x === t)))))
    val native = graft.functions.expressions.HashExpressions
      .top_token_count(col("tk"))
    val bad = df.filter(not(hof <=> native)).count()
    assert(bad == 0, s"$bad/300 random arrays mismatched")
  }

  test("property: native gram run stats match the HOF on random token arrays") {
    // the sort-fold HOF is the independent oracle for the hashed
    // native pass: runs in a sorted array and buckets in a hash map
    // must count the same thing, including null tokens (array_join /
    // concatWs both skip them), empty strings, unicode char lengths,
    // and the floor-half-up rounding
    val rnd = new scala.util.Random(13)
    val pool = Seq("a", "b", "ab", "", "é", "Ж", "ω1", null)
    val arrays: Seq[Seq[String]] = Seq.fill(300) {
      val len = rnd.nextInt(40)
      (1 to len).map(_ => pool(rnd.nextInt(pool.size)))
    }
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "__t")
    Seq(1, 2, 3).foreach { n =>
      val hof = TextAnalysis.gramRunStatsHof("__t", n)
      val native = graft.functions.expressions.GramRunStats
        .gram_run_stats(col("__t"), Seq(n))
      val bad = df.filter(
        not(hof.getField("top") <=> native.getField(s"top$n")) ||
        not(hof.getField("dup") <=> native.getField(s"dup$n"))).count()
      assert(bad == 0, s"n=$n: $bad/300 random arrays mismatched")
    }
  }

  test("repetitionStats handles a 50k-token document linearly") {
    // the long-document tail: 50k tokens over 1k distinct words. The
    // old distinct-x-scan HOF did 5e7 string comparisons in this one
    // cell; the native count does 5e4 map hits. Wall-clock bound is a
    // regression tripwire, not a benchmark (generous for shared CI).
    val rnd = new scala.util.Random(3)
    val doc = (1 to 50000).map(_ => s"w${rnd.nextInt(1000)}").mkString(" ")
    val df = Seq((1L, doc), (2L, "a a b")).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val rows = CorpusOps.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows(1).getDouble(3) == 0.6667) // top 'a' = 2/3, sane output
    val top = rows(0).getDouble(3)
    assert(top > 0.0 && top < 0.01, s"top_token_frac=$top")
    assert(secs < 30, f"50k-token repetitionStats took $secs%.1f s")
  }

  test("mixtureSample upsamples small groups and respects the budget") {
    // 900 docs in group "big", 100 in "small"; raw shares 90/10,
    // sqrt-smoothed shares 30/10 -> "small" keeps a ~3x larger rate
    val df = ((1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))).toDF("doc_id", "grp")
    val kept = CorpusOps.mixtureSample(df, "doc_id", "grp", budget = 400L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bigRate = kept.count(_._2 == "big") / 900.0
    val smallRate = kept.count(_._2 == "small") / 100.0
    assert(smallRate > bigRate * 2, s"big=$bigRate small=$smallRate")
    // the multiplicative hash spreads the rates close to their targets
    assert(kept.length > 250 && kept.length < 550, kept.length.toString)
    // deterministic: same input -> identical sample
    val again = CorpusOps.mixtureSample(df, "doc_id", "grp", budget = 400L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet == again.toSet)
  }

  test("mixtureSample rejects a non-integral id column loudly") {
    // a string id would hash to null row-by-row and silently return an
    // EMPTY sample — the misuse must throw instead
    val df = Seq(("doc-1", "g"), ("doc-2", "g")).toDF("doc_id", "grp")
    val err = intercept[IllegalArgumentException] {
      CorpusOps.mixtureSample(df, "doc_id", "grp", budget = 1L)
    }
    assert(err.getMessage.contains("integral"))
  }

  test("spanDedup explodes once and shuffles exactly twice, no join") {
    val df = (1L to 50L).map(i => (i, ("tok " * 15).trim + s" $i"))
      .toDF("doc_id", "text")
    val plan = CorpusOps.spanDedup(df, "doc_id", "text", w = 10)
      .queryExecution.executedPlan.toString
    // one pass over the corpus (single explode), one whash shuffle for
    // the window count + one doc-id shuffle for the rollup, no join
    assert(plan.split("Generate explode").length - 1 == 1, plan)
    assert(plan.split("Exchange hashpartitioning").length - 1 == 2, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("packSequences: concat-then-chunk slices cover every token once") {
    // docs of 0..9 tokens over 30 ids; seqLen 16 forces mid-doc cuts,
    // the zero-token docs must vanish
    val rows = (1L to 30L).map(i => (i, i % 10))
    val df = rows.toDF("doc_id", "n")
    val got = CorpusOps.packSequences(df, "doc_id", "n", seqLen = 16,
        numPartitions = 4)
      .orderBy("doc_id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // brute-force sequential reference
    var start = 0L
    val want = rows.filter(_._2 > 0).flatMap { case (id, n) =>
      val s = start; start += n
      (s / 16 to (s + n - 1) / 16).map { q =>
        val from = math.max(s, q * 16); val to = math.min(s + n, (q + 1) * 16)
        (id, q, from - s, to - s, from - q * 16)
      }
    }
    assert(got.toSeq == want)
    // every sequence except the last is exactly full
    val perSeq = got.groupBy(_._2).view
      .mapValues(_.map(x => x._4 - x._3).sum).toMap
    val lastSeq = perSeq.keys.max
    perSeq.foreach { case (q, tot) =>
      if (q != lastSeq) assert(tot == 16L, s"seq $q holds $tot tokens") }
    // slice bounds are doc-local and end-exclusive
    got.foreach { case (id, _, from, to, off) =>
      assert(from >= 0 && to > from && off >= 0 && off < 16,
        s"bad slice ($id, $from, $to, $off)") }
  }

  test("packSequences: a doc longer than seqLen spans multiple windows") {
    val df = Seq((1L, 5L), (2L, 40L), (3L, 3L)).toDF("doc_id", "n")
    val got = CorpusOps.packSequences(df, "doc_id", "n", seqLen = 16)
      .orderBy("doc_id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 2 starts at token 5, spans tokens [5, 45) -> seqs 0,1,2
    assert(got.filter(_._1 == 2L).map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(got.filter(_._1 == 2L).map(x => x._4 - x._3).sum == 40L)
    // same scale shape as packShards: per-partition window + broadcast
    // offsets, never a single-task global window
    val plan = CorpusOps.packSequences(df, "doc_id", "n", seqLen = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__pid"))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  test("packSequences invariants on a 200-doc random corpus") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map(i => (i, rnd.nextInt(40).toLong))
    val L = 32
    val df = rows.toDF("doc_id", "n")
    val got = CorpusOps.packSequences(df, "doc_id", "n", seqLen = L,
        numPartitions = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byDoc = got.groupBy(_._1)
    // every non-empty doc's slices cover its tokens exactly once
    rows.filter(_._2 > 0).foreach { case (id, n) =>
      val slices = byDoc.getOrElse(id, Array.empty).sortBy(_._2)
      assert(slices.map(x => x._4 - x._3).sum == n, s"doc $id")
      assert(slices.head._3 == 0 && slices.last._4 == n, s"doc $id bounds")
      slices.sliding(2).foreach {
        case Array(p, q) => assert(p._4 == q._3, s"doc $id gap")
        case _ => ()
      }
    }
    rows.filter(_._2 == 0).foreach { case (id, _) =>
      assert(!byDoc.contains(id)) }
    // every sequence except the highest holds exactly L tokens
    val bySeq = got.groupBy(_._2).view.mapValues(_.map(x => x._4 - x._3).sum)
    val last = bySeq.keys.max
    bySeq.foreach { case (q, tot) =>
      if (q != last) assert(tot == L.toLong, s"seq $q holds $tot") }
    // slice offsets sit inside the window
    got.foreach { case (_, _, from, to, off) =>
      assert(off >= 0 && off < L && to - from <= L) }
  }

  test("packShards never collapses to a single-partition global window") {
    val df = (1L to 1000L).map(i => (i, 7L)).toDF("doc_id", "w")
    val plan = CorpusOps.packShards(df, "doc_id", "w", budget = 100L,
      numPartitions = 8).queryExecution.executedPlan.toString
    // the data-bearing window runs per range partition, keyed by __pid;
    // only the 8-row offset frame uses an unpartitioned window
    assert(plan.contains("__pid"))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  private def rankHash(id: Long): Long =
    ((id % 1000000007L) * 2654435761L) % 1000000007L

  test("stratifiedSample equals the naive full-stratum rank") {
    // strata big enough (5000 >> quota*margin=80) that the hash-cutoff
    // prefilter is live — the exact-rank contract must survive it
    val df = (0L until 10000L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")).toDF("doc_id", "lang")
    val got = CorpusOps.stratifiedSample(df, "doc_id", "lang", quota = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val naive = (0L until 10000L).groupBy(_ % 2).values.flatMap { ids =>
      ids.sortBy(i => (rankHash(i), i)).take(10).zipWithIndex
        .map { case (i, k) =>
          (i, if (i % 2 == 0) "a" else "b", (k + 1).toLong) }
    }.toSet
    assert(got == naive && got.size == 20)
  }

  test("stratifiedSample returns whole strata smaller than the quota") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "lang")
    val got = CorpusOps.stratifiedSample(df, "doc_id", "lang", quota = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "x"), (2L, "x"), (3L, "y")))
  }

  test("stratifiedSample recovers a stratum the prefilter under-selects") {
    // adversarial ids whose rank hashes ALL sit above the margin=2
    // cutoff (~2/5 of the hash space here): the census must detect the
    // deficient stratum and re-rank it without the prefilter
    val ids = (0L until 200000L)
      .filter(i => rankHash(i) > 600000000L).take(5)
    assert(ids.size == 5)
    val df = ids.map(i => (i, "hot")).toDF("doc_id", "lang")
    val got = CorpusOps.stratifiedSample(df, "doc_id", "lang",
      quota = 2, margin = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val want = ids.sortBy(i => (rankHash(i), i)).take(2).zipWithIndex
      .map { case (i, k) => (i, (k + 1).toLong) }.toSet
    assert(got == want)
  }

  test("stratifiedSample rejects non-integral id columns loudly") {
    val df = Seq(("a", "x")).toDF("doc_id", "lang")
    intercept[IllegalArgumentException] {
      CorpusOps.stratifiedSample(df, "doc_id", "lang", quota = 1)
    }
  }

  test("weightedSample equals the driver-side exponential race") {
    val rows = (1L to 500L).map(i => (i, (i % 37 + 1).toDouble))
    val df = rows.toDF("doc_id", "w").repartition(7)
    val got = CorpusOps.weightedSample(df, "doc_id", "w", k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val P = 2147483647L
    val want = rows.map { case (id, w) =>
      val h = ((id % P) * 1103515245L + 12345L) % P
      val key = BigDecimal(w / -math.log((h + 0.5) / P.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, w, key)
    }.sortBy(t => (-t._3, t._1)).take(25).zipWithIndex
      .map { case ((id, w, _), i) => (id, w, (i + 1).toLong) }
    assert(got.sortBy(_._3).toSeq == want)
  }

  test("weightedSample: selection frequency tracks weight " +
      "(heavy ids dominate)") {
    // ids 1..1000; weight 100 for ids <= 50, 1 otherwise. A k=100
    // draw must take most of the heavy ids — proportional inclusion,
    // not uniform (uniform would include ~5 heavy ids)
    val rows = (1L to 1000L).map(i =>
      (i, if (i <= 50) 100.0 else 1.0))
    val got = CorpusOps.weightedSample(rows.toDF("doc_id", "w"),
      "doc_id", "w", k = 100).collect().map(_.getLong(0)).toSet
    val heavy = got.count(_ <= 50L)
    assert(heavy >= 35, s"expected most heavy ids sampled, got $heavy")
  }

  test("weightedSample plan is a top-k, not a global sort") {
    val df = (1L to 100L).map(i => (i, 1.0)).toDF("doc_id", "w")
    val plan = CorpusOps.weightedSample(df, "doc_id", "w", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("weightedSampleByGroup equals the per-group driver race, " +
      "bounded-buffer plan") {
    val rows = (1L to 600L).map(i =>
      (i, s"g${i % 5}", (i % 23 + 1).toDouble))
    val df = rows.toDF("doc_id", "lang", "w").repartition(7)
    val got = CorpusOps.weightedSampleByGroup(df, "doc_id", "lang",
        "w", quota = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val P = 2147483647L
    val want = rows.groupBy(_._2).flatMap { case (g, rs) =>
      rs.map { case (id, _, w) =>
        val h = ((id % P) * 1103515245L + 12345L) % P
        val key = BigDecimal(w / -math.log((h + 0.5) / P.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, key)
      }.sortBy(t => (-t._2, t._1)).take(7).zipWithIndex
        .map { case ((id, _), i) => (g, id, (i + 1).toLong) }
    }.toSet
    assert(got == want)
    val plan = CorpusOps.weightedSampleByGroup(df, "doc_id", "lang",
      "w", quota = 7).queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Sort "))
  }

  test("corpusDiff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "same"), (2L, "will change"), (3L, "goes away"))
      .toDF("doc_id", "text")
    val nu = Seq((1L, "same"), (2L, "did change"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val got = CorpusOps.corpusDiff(old, nu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("leakFreeSplit keeps every cluster on one side, ~permille " +
      "fractions, stable under growth") {
    val clusters = (1L to 3000L).map(i => (i, i % 500)) // 500 clusters
    val df = clusters.toDF("doc_id", "cluster_id")
    val got = CorpusOps.leakFreeSplit(df, "doc_id", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // one split per cluster — never straddles
    assert(got.groupBy(_._2).forall(_._2.map(_._3).distinct.size == 1))
    // fractions track the permille thresholds over 500 clusters
    val byCluster = got.groupBy(_._2).map(_._2.head._3).toSeq
    val train = byCluster.count(_ == "train")
    assert(train > 350 && train < 450, s"train clusters: $train")
    assert(byCluster.count(_ == "valid") > 20)
    assert(byCluster.count(_ == "test") > 20)
    // growth stability: new docs joining a cluster never move it
    val grown = df.unionByName(
      Seq((9001L, 7L), (9002L, 7L)).toDF("doc_id", "cluster_id"))
    val again = CorpusOps.leakFreeSplit(grown, "doc_id", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    got.foreach { case (id, _, s) => assert(again(id) == s) }
  }

  test("leakFreeSplit rejects bad fractions and non-integral clusters") {
    val df = Seq((1L, 1L)).toDF("doc_id", "cluster_id")
    intercept[IllegalArgumentException] {
      CorpusOps.leakFreeSplit(df, "doc_id", "cluster_id",
        trainPm = 950, validPm = 100)
    }
    val bad = Seq((1L, "c")).toDF("doc_id", "cluster_id")
    intercept[IllegalArgumentException] {
      CorpusOps.leakFreeSplit(bad, "doc_id", "cluster_id")
    }
  }

  test("weightedSample rejects non-integral ids and k < 1 loudly") {
    val df = Seq(("a", 1.0)).toDF("doc_id", "w")
    intercept[IllegalArgumentException] {
      CorpusOps.weightedSample(df, "doc_id", "w", k = 1)
    }
    val ok = Seq((1L, 1.0)).toDF("doc_id", "w")
    intercept[IllegalArgumentException] {
      CorpusOps.weightedSample(ok, "doc_id", "w", k = 0)
    }
  }

  test("stripBoilerplateLines removes cross-doc lines, keeps order and empties") {
    val docs = Seq(
      (1L, "alpha one\nall rights reserved\nunique to one"),
      (2L, "beta two\n  all rights reserved  \n\nkeep me"),
      (3L, "all rights reserved\ngamma three"),
      (4L, "all rights reserved") // fully boilerplate: survives, empty
    ).toDF("doc_id", "text")
    val got = CorpusOps.stripBoilerplateLines(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the shared line trims equal in all 4 docs -> stripped everywhere
    // (doc 2's padded variant too); doc 2's empty line is structure
    assert(got === Map(
      1L -> "alpha one\nunique to one",
      2L -> "beta two\n\nkeep me",
      3L -> "gamma three",
      4L -> ""))
  }

  test("stripBoilerplateLines counts DISTINCT docs, not occurrences") {
    // one doc repeating a line 5 times must not make it corpus
    // boilerplate for everyone else
    val docs = Seq(
      (1L, "spam\nspam\nspam\nspam\nspam"),
      (2L, "spam\nreal content")
    ).toDF("doc_id", "text")
    val got = CorpusOps.stripBoilerplateLines(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "spam\nspam\nspam\nspam\nspam")
    assert(got(2L) == "spam\nreal content")
  }

  test("chunkOverlap windows cover every token with the declared overlap") {
    val text = (1 to 25).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val got = CorpusOps.chunkOverlap(docs, "doc_id", "text",
        chunk = 10, overlap = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    // starts 0, 6, 12, 18 -> ceil((25-10)/6)=3 -> 4 chunks
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1.head._3.startsWith("t1 t2") && d1.head._4 == 10L)
    assert(d1.last._3 == (19 to 25).map(i => s"t$i").mkString(" "))
    assert(d1.last._4 == 7L)
    // consecutive chunks share exactly `overlap` tokens
    val c0 = d1(0)._3.split(" ").toSeq
    val c1 = d1(1)._3.split(" ").toSeq
    assert(c0.takeRight(4) == c1.take(4))
    // full coverage: union of chunk tokens == document tokens
    assert(d1.flatMap(_._3.split(" ")).distinct.length == 25)
    // short doc: one partial chunk; empty doc: no chunks
    val d2 = got.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._3 == "a b c" && d2.head._4 == 3L)
    assert(!got.exists(_._1 == 3L))
  }

  test("chunkOverlap is row-local: zero exchanges in the plan") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val p = CorpusOps.chunkOverlap(docs, "doc_id", "text", 4, 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking shuffled:\n$p")
  }
}
