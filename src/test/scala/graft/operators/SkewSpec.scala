package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain equi-join result") {
    // one maximally hot key (40 of 50 rows) plus normal keys
    val probe = (1L to 50L).map(i =>
      (if (i <= 40) 1L else i, i, i * 2.0)).toDF("k", "row", "v")
    val build = Seq((1L, "hot"), (42L, "a"), (45L, "b"), (99L, "miss"))
      .toDF("k", "tag")
    val plain = probe.join(build, Seq("k"))
      .select("k", "row", "v", "tag").as[(Long, Long, Double, String)]
      .collect().toSet
    val salted = Skew.saltedJoin(probe, build, Seq("k"),
        scatter = col("row"), salt = 4)
      .select("k", "row", "v", "tag").as[(Long, Long, Double, String)]
      .collect().toSet
    assert(salted == plain)
    // the hot key really spreads: >1 distinct salt bucket for key 1
    val buckets = probe.filter($"k" === 1L)
      .select(pmod(xxhash64(col("row")), lit(4L)).cast("int"))
      .distinct().count()
    assert(buckets > 1, "scatter column must spread the hot key")
  }

  test("hot-key salted join detects the hot key and matches the plain join") {
    // key 1 holds 4000 of 4360 rows; the 0.5 sample at threshold 100
    // must find it and only it
    val probe = (1L to 4360L).map(i =>
      (if (i <= 4000) 1L else i, i, i * 2.0)).toDF("k", "row", "v")
    val build = ((1L to 360L).map(i => (i, s"t$i")) :+ (4100L, "t4100"))
      .toDF("k", "tag")
    val plain = probe.join(build, Seq("k"))
      .select("k", "row", "v", "tag").as[(Long, Long, Double, String)]
      .collect().toSet
    val hot = Skew.saltedJoinHot(probe, build, Seq("k"),
        scatter = col("row"), salt = 8, hotThreshold = 100L,
        sampleFraction = 0.5, maxHotKeys = 5)
      .select("k", "row", "v", "tag").as[(Long, Long, Double, String)]
      .collect().toSet
    assert(hot == plain)
    assert(plain.count(_._1 == 1L) == 4000)
  }

  test("hot-key salted join with no hot keys degrades to the plain join") {
    val probe = (1L to 500L).map(i => (i % 50, i, i * 1.0))
      .toDF("k", "row", "v")
    val build = (0L to 49L).map(i => (i, s"t$i")).toDF("k", "tag")
    val plain = probe.join(build, Seq("k"))
      .select("k", "row", "v", "tag").as[(Long, Long, Double, String)]
      .collect().toSet
    // threshold far above any key's count: the sample finds nothing
    val hot = Skew.saltedJoinHot(probe, build, Seq("k"),
        scatter = col("row"), salt = 8, hotThreshold = 1000000L,
        sampleFraction = 0.5, maxHotKeys = 5)
      .select("k", "row", "v", "tag").as[(Long, Long, Double, String)]
      .collect().toSet
    assert(hot == plain)
  }

  test("salted aggregation merges partials exactly") {
    val df = (1L to 1000L).map(i =>
      (if (i % 2 == 0) "hot" else s"k${i % 7}", i, i.toDouble / 4))
      .toDF("g", "row", "v")
    val plain = df.groupBy("g").agg(
        sum($"v").as("s"), count(lit(1)).as("n"),
        min($"v").as("mn"), max($"v").as("mx"))
      .as[(String, Double, Long, Double, Double)].collect().toSet
    val salted = Skew.saltedAgg(df, Seq("g"), "v",
        scatter = col("row"), salt = 8)
      .select(col("g"), col("sum_v"), col("n"), col("min_v"), col("max_v"))
      .as[(String, Double, Long, Double, Double)].collect().toSet
    assert(salted == plain)
  }

  test("salting never clobbers a pre-existing __salt input column") {
    // inputs that already carry '__salt' must keep it through the join
    // and aggregate unchanged (the internal salt picks a fresh name)
    val probe = (1L to 30L).map(i => (i % 3, i, s"p$i")).toDF("k", "row", "__salt")
    val build = Seq((0L, "x"), (1L, "y")).toDF("k", "tag")
    val joined = Skew.saltedJoin(probe, build, Seq("k"),
      scatter = col("row"), salt = 4)
    assert(joined.columns.contains("__salt"))
    val plain = probe.join(build, Seq("k"))
      .select("k", "row", "__salt", "tag")
      .as[(Long, Long, String, String)].collect().toSet
    assert(joined.select("k", "row", "__salt", "tag")
      .as[(Long, Long, String, String)].collect().toSet == plain)
    // build-side collision too
    val build2 = Seq((0L, "x", "b0"), (1L, "y", "b1"))
      .toDF("k", "tag", "__salt")
    // ambiguous '__salt' on both sides would break the join; the fresh
    // name must dodge BOTH frames' columns
    val j2 = Skew.saltedJoin(probe.drop("__salt"), build2, Seq("k"),
      scatter = col("row"), salt = 4)
    assert(j2.columns.contains("__salt"))
    // aggregation: a '__salt' group key survives; clashing OUTPUT
    // names are rejected loudly instead of silently replaced
    val agg = Skew.saltedAgg(probe.withColumnRenamed("__salt", "g"),
      Seq("g"), "row", scatter = col("row"), salt = 4)
    assert(agg.columns.sorted.toSeq ==
      Seq("g", "max_row", "min_row", "n", "sum_row"))
    val clashing = probe.withColumn("n", lit(1))
    val err = intercept[IllegalArgumentException] {
      Skew.saltedAgg(clashing, Seq("k"), "row",
        scatter = col("row"), salt = 4)
    }
    assert(err.getMessage.contains("n"))
  }

  test("salted join plan stays an equi-join on the widened key") {
    val probe = (1L to 20L).map(i => (i, i)).toDF("k", "row")
    val build = Seq((1L, "x")).toDF("k", "tag")
    val p = Skew.saltedJoin(probe, build, Seq("k"),
      scatter = col("row"), salt = 4)
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("Cross") && !p.contains("NestedLoop"),
      s"salted join must stay an equi-join:\n$p")
  }
}
