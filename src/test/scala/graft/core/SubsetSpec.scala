package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/**
 * Subset algebra spec — mirrors the reference's parser semantics
 * (`/root/reference/src/oph_subset_library.c:64-190`) and the
 * `oph_set subset_filter` compressor
 * (`/root/reference/src/oph_flow_control_operators.c:1427-1513`).
 */
class SubsetSpec extends AnyFunSuite {

  // ---------------------------------------------------------- parsing

  test("single value") {
    val s = Subset.parse("5")
    assert(s.intervals == Seq(Subset.Interval(5, 1, 5)))
    assert(s.count == 1)
  }

  test("interval start:end") {
    val s = Subset.parse("3:8")
    assert(s.intervals == Seq(Subset.Interval(3, 1, 8)))
    assert(s.indices == Seq(3L, 4L, 5L, 6L, 7L, 8L))
  }

  test("stride start:stride:end") {
    val s = Subset.parse("1:2:10")
    assert(s.indices == Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("multi-interval union") {
    val s = Subset.parse("1:3,7,9:2:13")
    assert(s.indices == Seq(1L, 2L, 3L, 7L, 9L, 11L, 13L))
  }

  test("'end' keyword resolves to dimension size in each position") {
    assert(Subset.parse("end", Some(10)).indices == Seq(10L))
    assert(Subset.parse("8:end", Some(10)).indices == Seq(8L, 9L, 10L))
    assert(Subset.parse("2:4:end", Some(10)).indices == Seq(2L, 6L, 10L))
  }

  test("'end' keyword is case-insensitive (reference strncasecmp)") {
    assert(Subset.parse("END", Some(5)).indices == Seq(5L))
    assert(Subset.parse("End", Some(5)).indices == Seq(5L))
  }

  test("'end' without known size errors") {
    intercept[Subset.BoundsError](Subset.parse("1:end"))
  }

  test("start > end errors") {
    intercept[Subset.BoundsError](Subset.parse("8:3"))
  }

  test("more than 3 fields errors") {
    intercept[Subset.SyntaxError](Subset.parse("1:2:3:4"))
  }

  test("zero or negative indices error (grammar is 1-based)") {
    intercept[Subset.SyntaxError](Subset.parse("0:5"))
    intercept[Subset.SyntaxError](Subset.parse("-3"))
  }

  test("garbage errors") {
    intercept[Subset.ParseError](Subset.parse(""))
    intercept[Subset.ParseError](Subset.parse("a:b"))
    intercept[Subset.ParseError](Subset.parse("1,,2"))
  }

  test("counts match the reference formula 1 + (end-start)/stride") {
    assert(Subset.parse("1:2:10").count == 5)
    assert(Subset.parse("1:3:10").count == 4)
    assert(Subset.parse("5:5").count == 1)
  }

  // ------------------------------------------------------ membership

  test("contains matches enumerated indices") {
    val s = Subset.parse("2:3:20,25")
    val members = (1L to 30L).filter(s.contains)
    assert(members == s.indices.filter(_ <= 30))
  }

  test("property: indices are exactly the contains-set") {
    val prop = Prop.forAll(Gen.choose(1L, 50L), Gen.choose(1L, 5L),
      Gen.choose(0L, 30L)) { (start: Long, stride: Long, span: Long) =>
      val end = start + span
      val s = Subset.Spec(Seq(Subset.Interval(start, stride, end)))
      s.indices == (start to end).filter(s.contains)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: compress(indices) parses back to the same index set") {
    val prop = Prop.forAll(Gen.nonEmptyListOf(Gen.choose(1L, 60L))) {
      (vs: List[Long]) =>
        val sorted = vs.distinct.sorted
        val rendered = Subset.compress(sorted)
        Subset.parse(rendered).indices == sorted
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------- rendering

  test("render round-trips") {
    for (str <- Seq("1:3", "5", "1:2:9", "1:3,7,9:2:13"))
      assert(Subset.parse(str).render == str)
  }

  // ------------------------------------------------------ compressor

  test("compress: consecutive run becomes start:end") {
    assert(Subset.compress(Seq(1L, 2L, 3L, 4L)) == "1:4")
  }

  test("compress: lone values stay single") {
    assert(Subset.compress(Seq(5L)) == "5")
    assert(Subset.compress(Seq(5L, 7L)) == "5,7")
  }

  test("compress: pair with matching offset merges (reference merges runs of >=2)") {
    assert(Subset.compress(Seq(5L, 7L), offset = 2) == "5:7")
  }

  test("compress: mixed runs") {
    assert(Subset.compress(Seq(1L, 2L, 3L, 7L, 8L, 10L)) == "1:3,7:8,10")
  }

  test("compress: never sorts or dedups (reference processes input order)") {
    assert(Subset.compress(Seq(3L, 1L, 2L)) == "3,1:2")
    assert(Subset.compress(Seq(2L, 2L)) == "2,2")
  }

  test("compress: empty input") {
    assert(Subset.compress(Seq.empty) == "")
  }

  test("compressReal: run renders with half-offset margins") {
    // values sampled at offset 1.0: run [2.0..4.0] -> 1.5:4.5
    assert(Subset.compressReal(Seq(2.0, 3.0, 4.0), 1.0) == "1.5:4.5")
  }

  test("compressReal: lone value renders as itself") {
    assert(Subset.compressReal(Seq(2.5), 1.0) == "2.5")
    assert(Subset.compressReal(Seq(1.0, 5.0), 1.0) == "1,5")
  }
}
