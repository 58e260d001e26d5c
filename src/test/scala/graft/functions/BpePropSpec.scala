package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/**
 * Property tests for the BPE trainer/encoder: randomized corpora
 * (including non-BMP code points, which must never split inside a
 * surrogate pair) complement BpeSpec's hand-computed golden merge
 * sequences.
 */
class BpePropSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // words over a tiny alphabet (forces merges) plus astral-plane
  // characters (surrogate-pair handling)
  private val wordGen: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.oneOf("a", "b", "c"),
      1 -> Gen.oneOf("é", "中"),
      1 -> Gen.oneOf(
        new String(Character.toChars(0x1F600)),   // emoji
        new String(Character.toChars(0x10348))))) // Gothic hwair
  } yield cs.mkString

  private val histGen: Gen[Seq[(String, Long)]] = for {
    nw <- Gen.choose(1, 20)
    ws <- Gen.listOfN(nw, wordGen)
    cs <- Gen.listOfN(nw, Gen.choose(1L, 50L))
  } yield ws.distinct.zip(cs)

  test("encodeWord is lossless and never splits a surrogate pair") {
    check(Prop.forAll(histGen, Gen.choose(0, 32)) { (hist, nm) =>
      val table = new Bpe.BpeTable(Bpe.train(hist, nm))
      hist.forall { case (w, _) =>
        val toks = table.encodeWord(w)
        toks.mkString == w && toks.forall(t =>
          !Character.isLowSurrogate(t.head) &&
            !Character.isHighSurrogate(t.last))
      }
    })
  }

  test("trained segmentation equals encodeWord on every corpus word") {
    // the trainer's in-place segmentation and the rank-priority encoder
    // must agree — the invariant that makes offline training and
    // distributed encoding interchangeable
    check(Prop.forAll(histGen, Gen.choose(0, 32)) { (hist, nm) =>
      val merges = Bpe.train(hist, nm, minCount = 1L)
      val table = new Bpe.BpeTable(merges)
      // replay training segmentation independently
      val words = hist.map { case (w, _) =>
        var syms = w.codePoints().toArray.toSeq
          .map(cp => new String(Character.toChars(cp)))
        merges.foreach { m =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == m.left &&
                syms(i + 1) == m.right) {
              out += m.left + m.right; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toSeq
        }
        w -> syms
      }
      words.forall { case (w, syms) =>
        table.encodeWord(w).toSeq == syms }
    })
  }

  test("merge table is invariant to histogram order") {
    check(Prop.forAll(histGen, Gen.choose(1, 16)) { (hist, nm) =>
      Bpe.train(hist, nm).toSeq == Bpe.train(hist.reverse, nm).toSeq
    })
  }
}
