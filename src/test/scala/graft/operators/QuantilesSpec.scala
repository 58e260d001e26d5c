package graft.operators

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def disc(sorted: Seq[Double], q: Double): Double =
    sorted(math.max(1L, math.ceil(q * sorted.size).toLong).toInt - 1)

  test("exactQuantiles equals the rank-ceil(q*N) element, nulls ignored") {
    val raw = (1 to 997).map(i => ((i * 37) % 1009).toDouble)
    val df = (raw.map(Option(_)) ++ Seq(None, None))
      .toDF("x")
    val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Quantiles.exactQuantiles(df, "x", qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = raw.sorted
    qs.foreach(q => assert(got(q) == disc(sorted, q), s"q=$q"))
  }

  test("exactQuantiles survives a duplicate-heavy column (refinement)") {
    // 90% one hot value: the hot bucket exceeds a tiny collectCap and
    // forces the refinement path, which must short-circuit on lo==hi
    val vals = Seq.fill(900)(42.0) ++ (1 to 100).map(_.toDouble)
    val df = vals.toDF("x")
    val got = Quantiles.exactQuantiles(df, "x", Seq(0.5, 0.99),
      buckets = 16, collectCap = 8)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    assert(got(0.5) == disc(sorted, 0.5))
    assert(got(0.99) == disc(sorted, 0.99))
  }

  test("exactQuantiles boundary ranks: q*N integral picks that rank") {
    val df = (1 to 8).map(_.toDouble).toDF("x")
    val got = Quantiles.exactQuantiles(df, "x", Seq(0.25, 0.5))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(0.25) == 2.0 && got(0.5) == 4.0)
  }

  test("exactQuantilesByGroup matches per-group rank-ceil, null group kept") {
    // three skewed groups + a NULL group; per-group sizes differ so
    // the same q maps to different ranks per group
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Option[String], Double)] =
      (1 to 400).map(i => (Some("a"), ((i * 31) % 997).toDouble)) ++
      (1 to 97).map(i => (Some("b"), ((i * 13) % 211).toDouble)) ++
      (1 to 5).map(i => (Some("c"), i.toDouble)) ++
      (1 to 23).map(_ => (None, rnd.nextInt(50).toDouble))
    val df = rows.toDF("g", "x")
    val qs = Seq(0.1, 0.5, 0.9, 1.0)
    val got = Quantiles.exactQuantilesByGroup(df, "g", "x", qs)
      .collect()
      .map(r => (Option(r.getString(0)), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val byG = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).sorted }
    assert(got.size == byG.size * qs.size)
    byG.foreach { case (g, sorted) =>
      qs.foreach(q => assert(got((g, q)) == disc(sorted, q),
        s"g=$g q=$q")) }
  }

  test("exactQuantilesByGroup: identical ranges never share a cell; " +
      "duplicate-heavy groups refine") {
    // both groups span exactly [1,100] (identical candidate ranges —
    // the cell-identity trap) but with different distributions, and
    // a hot value forces the oversized-bucket path per group
    val a = Seq(1.0, 100.0) ++ Seq.fill(500)(40.0) ++
      (1 to 50).map(_.toDouble)
    val b = Seq(1.0, 100.0) ++ Seq.fill(500)(60.0) ++
      (51 to 99).map(_.toDouble)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "x")
    val got = Quantiles.exactQuantilesByGroup(df, "g", "x",
        Seq(0.5, 0.95), buckets = 16, collectCap = 8)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got(("a", 0.5)) == disc(a.sorted, 0.5))
    assert(got(("b", 0.5)) == disc(b.sorted, 0.5))
    assert(got(("a", 0.95)) == disc(a.sorted, 0.95))
    assert(got(("b", 0.95)) == disc(b.sorted, 0.95))
  }

  test("exactQuantilesByGroup: histogram budget shrinks buckets, " +
      "answers unchanged") {
    // 40 groups x 50 values under a 160-entry budget forces bkts down
    // to the floor (16) — correctness must ride on extra refinement
    // rounds, not on the configured bucket count
    val rows = for (g <- 1 to 40; i <- 1 to 50)
      yield (s"g$g", ((i * 17 + g) % 211).toDouble)
    val df = rows.toDF("g", "x")
    val got = Quantiles.exactQuantilesByGroup(df, "g", "x",
        Seq(0.5, 0.9), buckets = 8192, collectCap = 4, histBudget = 160)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byG = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).sorted }
    byG.foreach { case (g, sorted) =>
      assert(got((g, 0.5)) == disc(sorted, 0.5), s"g=$g")
      assert(got((g, 0.9)) == disc(sorted, 0.9), s"g=$g")
    }
  }

  test("exactQuantilesByGroup: per-round collect budget defers " +
      "buckets without losing exactness") {
    // 20 groups x 60 values with collectCap=25: only a few target
    // buckets fit each round's total budget — the rest must re-range
    // and resolve later, with answers identical to the unbounded run
    val rows = for (g <- 1 to 20; i <- 1 to 60)
      yield (s"g$g", ((i * 13 + g * 3) % 101).toDouble)
    val df = rows.toDF("g", "x")
    val qs = Seq(0.25, 0.75)
    val got = Quantiles.exactQuantilesByGroup(df, "g", "x", qs,
        buckets = 32, collectCap = 25)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byG = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).sorted }
    assert(got.size == byG.size * qs.size)
    byG.foreach { case (g, sorted) =>
      qs.foreach(q => assert(got((g, q)) == disc(sorted, q),
        s"g=$g q=$q")) }
  }

  test("exactQuantilesByGroup rejects an unbounded group domain loudly") {
    val df = (1 to 100).map(i => (s"g$i", i.toDouble)).toDF("g", "x")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantilesByGroup(df, "g", "x", Seq(0.5),
        maxGroups = 10)
    }
  }

  test("exactQuantiles rejects out-of-range q and empty input loudly") {
    val df = Seq(1.0).toDF("x")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "x", Seq(1.5))
    }
    val empty = Seq.empty[Double].toDF("x")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(empty, "x", Seq(0.5))
    }
  }
}
