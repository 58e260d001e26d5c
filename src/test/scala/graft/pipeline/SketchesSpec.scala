package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** 3 hot keys x 1000 + 1000 tail keys x 10: N = 13000, so with
    * k = 50 the threshold N/k = 260 admits exactly the hot keys. */
  private def skewed = {
    val hot = (0 until 3).flatMap(h => Seq.fill(1000)(9000L + h))
    val tail = (0 until 1000).flatMap(t => Seq.fill(10)(t.toLong))
    (hot ++ tail).toDF("key")
  }

  test("heavyHitters equals the exact groupBy + HAVING") {
    val got = Sketches.heavyHitters(spark, skewed, "key", k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(9000L -> 1000L, 9001L -> 1000L, 9002L -> 1000L))
  }

  test("heavyHitters is partition-order independent") {
    // the Misra-Gries CANDIDATE set varies with partition layout; the
    // confirmed output must not. Adversarial layouts: hot keys packed
    // into one partition, spread round-robin, and range-clustered.
    val base = skewed
    val layouts = Seq(
      base.repartition(7),
      base.repartition(3, col("key")),
      base.orderBy(col("key")).coalesce(2),
      base.orderBy(col("key").desc).repartition(13))
    val expect = Map(9000L -> 1000L, 9001L -> 1000L, 9002L -> 1000L)
    layouts.foreach { df =>
      val got = Sketches.heavyHitters(spark, df, "key", k = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expect)
    }
  }

  test("heavyHitters boundary: threshold is strictly greater-than") {
    // 4 keys x 25 each, N = 100, k = 4 -> threshold 25; no key EXCEEDS
    // 25, so the result is empty even though every key reaches it
    val flat = (0 until 4).flatMap(k => Seq.fill(25)(k.toLong)).toDF("key")
    assert(Sketches.heavyHitters(spark, flat, "key", k = 4).count() == 0)
    // and one key nudged above the threshold is reported alone
    val tipped = flat.union(Seq(2L).toDF("key"))
    val got = Sketches.heavyHitters(spark, tipped, "key", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(2L -> 26L))
  }

  test("heavyHitters: k wider than the keyspace reports everything above N/k") {
    val few = Seq(1L, 1L, 1L, 2L, 2L, 3L).toDF("key")
    val got = Sketches.heavyHitters(spark, few, "key", k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // threshold 6/100 = 0.06 -> every key qualifies with exact counts
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("heavyHitters reports a heavy NULL group exactly") {
    val df = (Seq.fill(60)(Option.empty[Long]) ++
      (0 until 40).map(i => Some(i.toLong))).toDF("key")
    val got = Sketches.heavyHitters(spark, df, "key", k = 4)
      .collect().map(r =>
        (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(1)).toMap
    // N = 100, threshold 25: only the 60-row null group qualifies
    assert(got == Map(-1L -> 60L))
  }

  test("heavyHitters on an empty frame is empty") {
    assert(Sketches.heavyHitters(
      spark, Seq.empty[Long].toDF("key"), "key", k = 8).count() == 0)
  }

  test("countMin: estimates never undercount and merging is exact-sum") {
    val keys = (0 until 2000).map(i => (i % 37).toLong) ++
      Seq.fill(500)(9999L)
    val df = keys.toDF("key").repartition(7)
    val cm = Sketches.countMin(df, "key", depth = 5, width = 256)
    assert(cm.total == 2500L)
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, n) =>
      val e = cm.estimate(k)
      assert(e >= n, s"undercount for $k: $e < $n")
      assert(e <= n + 4 * cm.total / cm.width, s"excess for $k: $e vs $n")
    }
    // an absent key estimates only collision noise
    assert(cm.estimate(123456789L) <= 4 * cm.total / cm.width)
    // partition-layout independence: the merged table is an exact sum,
    // so any repartitioning yields the identical sketch
    val cm2 = Sketches.countMin(keys.toDF("key").repartition(3), "key",
      depth = 5, width = 256)
    assert(cm.table.flatten.toSeq == cm2.table.flatten.toSeq)
  }

  test("countMin: empty input and non-integral keys") {
    val empty = Seq.empty[Long].toDF("key")
    val cm = Sketches.countMin(empty, "key")
    assert(cm.total == 0L && cm.estimate(1L) == 0L)
    val e = intercept[IllegalArgumentException](
      Sketches.countMin(Seq("a").toDF("key"), "key"))
    assert(e.getMessage.contains("non-integral"))
  }

  test("heavyHitters rejects non-integral key columns loudly") {
    val strings = Seq("a", "a", "b").toDF("key")
    val e = intercept[IllegalArgumentException](
      Sketches.heavyHitters(spark, strings, "key", k = 2))
    assert(e.getMessage.contains("non-integral"))
  }

  test("hllDistinctBand: exact counts with the estimate in band") {
    val df = (0 until 5000).map(i => (s"g${i % 3}", (i % 700).toLong))
      .toDF("grp", "uid")
    val rows = Sketches.hllDistinctBand(df, "grp", "uid")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == 3)
    // gcd(3, 700) = 1: within each residue class mod 3 every uid mod
    // 700 occurs (5000 > 2 * lcm), so each group sees all 700 uids
    rows.foreach { case (_, exact, inBand) =>
      assert(exact == 700)
      assert(inBand)
    }
  }

  test("hllDistinctBand ignores null keys exactly like countDistinct " +
      "(ADVICE r17: the surviving (group, null) pair must not count)") {
    val df = Seq[(String, Option[Long])](
      ("mixed", Some(1L)), ("mixed", Some(2L)), ("mixed", None),
      ("mixed", None),                       // nulls collapse AND drop
      ("allnull", None), ("allnull", None),  // all-null group -> 0
      ("clean", Some(7L))
    ).toDF("grp", "uid")
    val got = Sketches.hllDistinctBand(df, "grp", "uid")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .toList.sortBy(_._1)
    // countDistinct semantics: mixed=2 (not 3), allnull=0 (not 1)
    assert(got == List(("allnull", 0L, true), ("clean", 1L, true),
      ("mixed", 2L, true)), got.toString)
  }

  test("hllDistinctBand's pre-distinct estimate is bit-identical to " +
      "the raw-row HLL (registers are duplicate-insensitive)") {
    // the r17 rewrite dedupes (group, key) pairs BEFORE aggregating to
    // avoid the Expand plan; the estimate column must not move at all
    val df = (0 until 5000).map(i => (s"g${i % 3}", (i % 700).toLong))
      .toDF("grp", "uid")
    val direct = df.groupBy(col("grp"))
      .agg(approx_count_distinct(col("uid"), 0.01).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val viaDistinct = df.select(col("grp"), col("uid")).distinct()
      .groupBy(col("grp"))
      .agg(approx_count_distinct(col("uid"), 0.01).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(direct == viaDistinct, s"$direct vs $viaDistinct")
    // and the rewritten band query itself plans NO Expand
    val plan = Sketches.hllDistinctBand(df, "grp", "uid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
  }
}
