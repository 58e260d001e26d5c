package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Bpe.Merge
import graft.pipeline.TextAnalysis

/** Golden BPE fixtures: the merge loop and the encoder are pinned
  * against a hand-computed Sennrich-style corpus (no end-of-word
  * marker), plus the distributed faces over real testdata. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // histogram: low x5, lower x2, newest x6, widest x3
  private val hist = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  // Hand-derivation (weighted pair counts per round, count-desc then
  // lexicographic tiebreak):
  //   r0: (e,s)=9 ties (s,t)=9 -> "e s" wins
  //   r1: (es,t)=9
  //   r2: (l,o)=7 ties (o,w)=7 -> "l o" wins
  //   r3: (lo,w)=7
  //   r4: (e,w)=6 ties (n,e),(w,est) -> "e w" wins
  //   r5: (ew,est)=6 ties (n,ew) -> "ew est" wins
  private val golden = Array(
    Merge(0, "e", "s", 9L), Merge(1, "es", "t", 9L),
    Merge(2, "l", "o", 7L), Merge(3, "lo", "w", 7L),
    Merge(4, "e", "w", 6L), Merge(5, "ew", "est", 6L))

  test("train reproduces the hand-computed merge sequence") {
    assert(Bpe.train(hist, 6).toSeq == golden.toSeq)
  }

  test("train stops when the best pair is below minCount") {
    assert(Bpe.train(Seq(("ab", 1L)), 10, minCount = 2L).isEmpty)
    // and keeps going past ties without double-counting
    assert(Bpe.train(hist, 100).length >= 6)
  }

  test("encodeWord applies merges by rank priority, leftmost-first") {
    val t = new Bpe.BpeTable(golden)
    assert(t.encodeWord("newest").toSeq == Seq("n", "ewest"))
    assert(t.encodeWord("low").toSeq == Seq("low"))
    assert(t.encodeWord("lower").toSeq == Seq("low", "e", "r"))
    assert(t.encodeWord("widest").toSeq == Seq("w", "i", "d", "est"))
    // unseen word: only table pairs fuse
    assert(t.encodeWord("wider").toSeq == Seq("w", "i", "d", "e", "r"))
    // repeated pair: all occurrences fuse in one leftmost-first pass
    assert(t.encodeWord("seses").toSeq == Seq("s", "es", "es"))
    // overlap never double-consumes a symbol
    assert(t.encodeWord("esss").toSeq == Seq("es", "s", "s"))
    assert(t.encodeWord("").isEmpty)
    // memo hit returns the identical segmentation
    assert(t.encodeWord("newest").toSeq == Seq("n", "ewest"))
  }

  test("train segmentation and encodeWord agree on every trained word") {
    // encode(lowest-rank-present) == train(sequential by rank): for a
    // TRAINED table a later merge can never create an earlier pair, so
    // the two orders coincide — assert it for the whole fixture vocab
    val t = new Bpe.BpeTable(golden)
    assert(t.encodeWord("newest").mkString("|") == "n|ewest")
    assert(t.encodeWord("low").mkString("|") == "low")
  }

  test("bpePairCounts matches the hand census on a tiny corpus") {
    // one doc per histogram word repetition keeps the counts identical
    val docs = hist.flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w)
    }.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpePairCounts(docs, "text", k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("es", 9L), ("st", 9L), ("we", 8L)))
  }

  test("bpeLearn + bpeEncodeDocs round-trip on real documents") {
    val docs = spark.read.parquet(sf("documents")).limit(400)
    val merges = TextAnalysis.bpeLearn(docs, "text",
      maxWords = 2048, numMerges = 48)
    assert(merges.length > 0 && merges.map(_.rank).toSeq ==
      (0 until merges.length))
    // every learned symbol is buildable from earlier merges or chars
    val vocab = scala.collection.mutable.Set[String]()
    merges.foreach { m =>
      assert(m.left.length == 1 || vocab.contains(m.left),
        s"left ${m.left} of rank ${m.rank} has no provenance")
      assert(m.right.length == 1 || vocab.contains(m.right),
        s"right ${m.right} of rank ${m.rank} has no provenance")
      vocab += m.left + m.right
    }
    val enc = TextAnalysis.bpeEncodeDocs(docs, "doc_id", "text", merges)
    val bad = enc.join(docs, "doc_id")
      .where(concat_ws("", col("tokens")) =!=
        regexp_replace(lower(trim(col("text"))), "\\s+", ""))
      .count()
    assert(bad == 0L, s"$bad documents fail BPE reconstruction")
    // compression: merges must actually fuse — total tokens strictly
    // below total characters-of-tokens
    val (nTok, nChr) = enc.select(
      sum(size(col("tokens"))).cast("long"),
      sum(length(concat_ws("", col("tokens")))).cast("long"))
      .as[(Long, Long)].head()
    assert(nTok < nChr, s"no compression: $nTok tokens vs $nChr chars")
  }

  test("bpeEncodeDocs null and blank contracts") {
    val docs = Seq((1L, "ab ab"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val merges = Array(Merge(0, "a", "b", 2L))
    val got = TextAnalysis.bpeEncodeDocs(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(got == Seq(
      (1L, Seq("ab", "ab")), (2L, Seq.empty), (3L, Seq.empty)))
  }

  // Hand-derivation WITH the end-of-word marker (Sennrich form): the
  // marker is a word-final symbol, so (t,</w>) joins the r0 9-count
  // tie and (est,</w>) fuses at r2 — boundary-aware units the
  // markerless table cannot learn.
  //   r0: (e,s)=9 ties (s,t),(t,</w>) -> (e,s)
  //   r1: (es,t)=9 ties (t,</w>) -> (es,t)
  //   r2: (est,</w>)=9
  //   r3: (l,o)=7 ties (o,w) -> (l,o)
  //   r4: (lo,w)=7
  //   r5: (e,w)=6 ties (n,e),(w,est</w>) -> (e,w)
  private val goldenEow = Array(
    Merge(0, "e", "s", 9L), Merge(1, "es", "t", 9L),
    Merge(2, "est", "</w>", 9L), Merge(3, "l", "o", 7L),
    Merge(4, "lo", "w", 7L), Merge(5, "e", "w", 6L))

  test("end-of-word training reproduces the hand-computed sequence") {
    assert(Bpe.train(hist, 6, endOfWord = true).toSeq == goldenEow.toSeq)
  }

  test("end-of-word encoding emits boundary-aware tokens that decode") {
    val t = new Bpe.BpeTable(goldenEow, endOfWord = true)
    assert(t.encodeWord("newest").toSeq == Seq("n", "ew", "est</w>"))
    assert(t.encodeWord("low").toSeq == Seq("low", "</w>"))
    assert(t.encodeWord("").isEmpty)
    // boundaries come back from the flat stream
    val toks = t.encodeWord("newest") ++ t.encodeWord("low") ++
      t.encodeWord("widest")
    assert(t.decode(toks.iterator) == "newest low widest")
  }

  test("byte-level bijection is exact over all 256 bytes") {
    assert(Bpe.byteEncoder.distinct.length == 256)
    val nasty = "héllo wörld 😀🚀 日本語 привет \u0001\u00AD mixed"
    assert(Bpe.fromByteSymbols(Bpe.toByteSymbols(nasty)) == nasty)
    // every single byte value survives the round trip
    val all = new String((0 until 256).map(_.toByte).toArray,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val utf8Safe = new String(all.getBytes(
      java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(Bpe.fromByteSymbols(Bpe.toByteSymbols(utf8Safe)) == utf8Safe)
  }

  test("byte-level + EOW tables are lossless on non-Latin words") {
    val hist = Seq(("dog🐶", 3L), ("dog", 5L), ("日本語", 4L),
      ("привет", 2L), ("café", 2L), ("naïve", 2L))
    val merges = Bpe.train(hist, 32, byteLevel = true, endOfWord = true)
    assert(merges.nonEmpty)
    val t = new Bpe.BpeTable(merges, byteLevel = true, endOfWord = true)
    hist.foreach { case (w, _) =>
      val toks = t.encodeWord(w)
      assert(t.decode(toks.iterator) == w, s"lossy on '$w': $toks")
    }
    // multi-word stream restores boundaries too
    val stream = hist.flatMap { case (w, _) => t.encodeWord(w) }
    assert(t.decode(stream.iterator) == hist.map(_._1).mkString(" "))
    // and unseen emoji (no trained merges touch it) still round-trips
    assert(t.decode(t.encodeWord("🦄🦄").iterator) == "🦄🦄")
  }

  test("byte-level EOW marker cannot be forged by content") {
    // an HTML-ish corpus where '</w>' is frequent CONTENT: in byte
    // mode the word-boundary marker lives outside the byte alphabet,
    // so merges can assemble the literal string but never the marker —
    // decode(encode(x)) stays exact even for '</w>'-bearing words
    val hist = Seq(("</w>", 9L), ("a</w>b", 6L), ("<w></w>", 4L),
      ("plain", 3L))
    val merges = Bpe.train(hist, 48, minCount = 1L,
      byteLevel = true, endOfWord = true)
    val t = new Bpe.BpeTable(merges, byteLevel = true, endOfWord = true)
    hist.foreach { case (w, _) =>
      assert(t.decode(t.encodeWord(w).iterator) == w,
        s"lossy on '$w': ${t.encodeWord(w).toSeq}")
    }
    val stream = hist.flatMap { case (w, _) => t.encodeWord(w) }
    assert(t.decode(stream.iterator) == hist.map(_._1).mkString(" "))
  }

  test("distributed byte-level decode matches through the expressions") {
    val docs = Seq((1L, "cats 😀 chase 日本 dogs"), (2L, "plain ascii"),
      (3L, "")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeLearn(docs, "text", maxWords = 64,
      numMerges = 16, minCount = 1L, byteLevel = true, endOfWord = true)
    val enc = TextAnalysis.bpeEncodeDocs(docs, "doc_id", "text", merges,
      byteLevel = true, endOfWord = true)
    val dec = TextAnalysis.bpeDecodeDocs(enc, "doc_id", "tokens", merges,
      byteLevel = true, endOfWord = true)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(dec == Seq((1L, "cats 😀 chase 日本 dogs"),
      (2L, "plain ascii"), (3L, "")))
  }
}
