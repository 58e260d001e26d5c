package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString
  private def exchanges(df: DataFrame): Int =
    plan(df).linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange"))

  test("scd2FromLog collapses runs and chains validity intervals") {
    val log = Seq(
      (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "b"),
      (1L, 50L, "a"),
      (2L, 15L, "x"),
      (3L, 5L, null.asInstanceOf[String]), (3L, 6L, null.asInstanceOf[String]),
      (3L, 7L, "y")
    ).toDF("k", "seq", "v")
    val got = Warehouse.scd2FromLog(log, "k", "seq", "v")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getBoolean(4)))
      .toSet
    assert(got === Set(
      (1L, Some("a"), 10L, Some(30L), false),
      (1L, Some("b"), 30L, Some(50L), false),
      (1L, Some("a"), 50L, None, true),
      (2L, Some("x"), 15L, None, true),
      (3L, None, 5L, Some(7L), false),
      (3L, Some("y"), 7L, None, true)))
  }

  test("scd2FromLog shuffles exactly once (both windows share the key exchange)") {
    val log = spark.range(1000)
      .select(pmod(col("id"), lit(7)).as("k"), col("id").as("seq"),
        pmod(col("id"), lit(3)).cast("string").as("v"))
    val df = Warehouse.scd2FromLog(log, "k", "seq", "v")
    assert(exchanges(df) === 1, s"expected 1 exchange:\n${plan(df)}")
    assert(df.count() > 0)
  }

  test("cdcApply: last writer wins, latest delete removes, replay is idempotent") {
    val log = Seq(
      (1L, 1L, "I", 10.0), (1L, 3L, "U", 30.0), (1L, 2L, "U", 20.0),
      (2L, 1L, "I", 5.0), (2L, 2L, "D", 0.0),
      (3L, 4L, "D", 0.0), (3L, 5L, "I", 7.0),
      (4L, 9L, "U", 1.5) // upsert without prior insert still lands
    ).toDF("k", "seq", "op", "v")
    def state(l: DataFrame) =
      Warehouse.cdcApply(l, "k", "seq", "op", Seq("v"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val expected = Set((1L, 30.0), (3L, 7.0), (4L, 1.5))
    assert(state(log) === expected)
    // at-least-once redelivery: replaying the whole log changes nothing
    assert(state(log.unionByName(log)) === expected)
  }

  test("cdcApply plans one hash aggregate, never a window sort") {
    val log = spark.range(1000).select(pmod(col("id"), lit(50)).as("k"),
      col("id").as("seq"),
      when(pmod(col("id"), lit(11)) === 0, "D").otherwise("U").as("op"),
      col("id").cast("double").as("v"))
    val df = Warehouse.cdcApply(log, "k", "seq", "op", Seq("v"))
    val p = plan(df)
    assert(!p.contains("Window"), s"window sort crept in:\n$p")
    assert(exchanges(df) === 1, s"expected 1 exchange:\n$p")
    // partial + final aggregate: map-side combine bounds shuffle
    // volume to one row per (key x map task). Struct-valued buffers
    // plan as SortAggregate (per-partition sort, not global) — the
    // partial_max_by below is the property that matters.
    assert(p.contains("partial_max_by"), p)
    assert(p.linesIterator.count(_.contains("Aggregate(")) >= 2, p)
  }

  test("mergeAggState equals a full recompute over history plus batch") {
    val history = spark.range(500).select(
      pmod(col("id"), lit(13)).as("k"),
      (col("id") % 97).cast("double").as("v"))
    val batch = spark.range(500, 800).select(
      pmod(col("id"), lit(17)).as("k"), // new keys appear too
      when(col("id") % 50 === 0, lit(null)) // and null measures
        .otherwise((col("id") % 89).cast("double")).as("v"))
    val state = Warehouse.aggState(history, Seq("k"), "v")
    val mergedDf = Warehouse.mergeAggState(state, batch, Seq("k"), "v")
    val merged = mergedDf
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val full = Warehouse.aggState(history.unionByName(batch), Seq("k"), "v")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(merged.keySet === full.keySet)
    full.foreach { case (k, (n, s, mn, mx)) =>
      val (gn, gs, gmn, gmx) = merged(k)
      assert(gn == n && math.abs(gs - s) < 1e-9 && gmn == mn && gmx == mx,
        s"key $k: got ${merged(k)} want ${full(k)}")
    }
    // repeated maintenance: folding a second batch into the merged
    // state still equals the three-way recompute
    val batch2 = spark.range(800, 900).select(
      pmod(col("id"), lit(13)).as("k"), lit(1.0).as("v"))
    val merged2 = Warehouse.mergeAggState(mergedDf, batch2, Seq("k"), "v")
    val full2 = Warehouse.aggState(
      history.unionByName(batch).unionByName(batch2), Seq("k"), "v")
    assert(merged2.orderBy("k").collect().toSeq ===
      full2.select(col("k"), col("n"), col("sum_v").cast("double"),
        col("min_v").cast("double"), col("max_v").cast("double"))
        .orderBy("k").collect().toSeq)
  }

  test("scd2Lookup joins each fact to the version valid at fact time") {
    val hist = Warehouse.scd2FromLog(Seq(
      (1L, 10L, "a"), (1L, 30L, "b"), (1L, 50L, "c"),
      (2L, 20L, "x")).toDF("k", "seq", "v"), "k", "seq", "v")
    val facts = Seq((1L, 5L), (1L, 10L), (1L, 29L), (1L, 30L),
      (1L, 99L), (2L, 21L), (3L, 7L)).toDF("k", "t")
    val got = Warehouse.scd2Lookup(facts, hist, "k", "t", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(3), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 10L, "a", 10L), // boundary: valid_from == fact time matches
      (1L, 29L, "a", 10L),
      (1L, 30L, "b", 30L),
      (1L, 99L, "c", 50L),
      (2L, 21L, "x", 20L))) // (1,5) precedes history, (3,7) unknown key
  }

  test("scd2Merge incremental equals the full-log recompute") {
    val rnd = new scala.util.Random(3)
    val full = (1L to 600L).map { seq =>
      (rnd.nextInt(9).toLong, seq, s"v${rnd.nextInt(4)}")
    }
    // new key appears only in the batch window
    val log = full :+ (99L, 590L, "fresh") :+ (99L, 595L, "fresh2")
    val (oldLog, batch) = log.sortBy(_._2).partition(_._2 <= 400L)
    val hist = Warehouse.scd2FromLog(oldLog.toDF("k", "seq", "v"),
      "k", "seq", "v")
    val merged = Warehouse.scd2Merge(hist, batch.toDF("k", "seq", "v"),
      "k", "seq", "v")
    val expect = Warehouse.scd2FromLog(log.toDF("k", "seq", "v"),
      "k", "seq", "v")
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSet
    assert(key(merged) === key(expect))
  }

  test("scd2Merge validateOrder rejects late arrivals loudly") {
    val hist = Warehouse.scd2FromLog(
      Seq((1L, 100L, "a")).toDF("k", "seq", "v"), "k", "seq", "v")
    val late = Seq((1L, 50L, "b")).toDF("k", "seq", "v")
    intercept[IllegalArgumentException] {
      Warehouse.scd2Merge(hist, late, "k", "seq", "v",
        validateOrder = true)
    }
    // in-order batches pass the guard and merge normally
    val ok = Seq((1L, 150L, "b")).toDF("k", "seq", "v")
    val merged = Warehouse.scd2Merge(hist, ok, "k", "seq", "v",
      validateOrder = true)
    assert(merged.count() == 2L)
  }

  test("scd2Merge keeps the open version's valid_from when the batch repeats it") {
    val hist = Warehouse.scd2FromLog(
      Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("k", "seq", "v"),
      "k", "seq", "v")
    val merged = Warehouse.scd2Merge(hist,
      Seq((1L, 30L, "b"), (1L, 40L, "c")).toDF("k", "seq", "v"),
      "k", "seq", "v")
    val rows = merged.collect().map(r => (r.getString(1), r.getLong(2),
      Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    // "b" run must still start at 20 (no spurious version at 30)
    assert(rows === Set(("a", 10L, Some(20L)), ("b", 20L, Some(40L)),
      ("c", 40L, None)))
  }

  test("withDerived computes avg from mergeable parts") {
    val st = Seq((1L, 4L, 10.0, 1.0, 5.0)).toDF("k", "n", "sum_v",
      "min_v", "max_v")
    val r = Warehouse.withDerived(st).select("avg_v").head().getDouble(0)
    assert(r === 2.5)
  }
}
