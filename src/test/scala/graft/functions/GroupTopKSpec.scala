package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  test("topk equals the window formulation, ties broken by smaller id") {
    val df = (1L to 1000L).map(i =>
      (s"g${i % 4}", (i % 97).toDouble, i)).toDF("g", "v", "id")
      .repartition(7)   // partial buffers must merge across partitions
    val u = GroupTopK.topk(5)
    val got = df.groupBy($"g").agg(u($"v", $"id").as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rk"), $"col._1".as("id"),
        $"col._2".as("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = (1L to 1000L).map(i => (s"g${i % 4}", (i % 97).toDouble, i))
      .groupBy(_._1).flatMap { case (g, rows) =>
        rows.sortBy(t => (-t._2, t._3)).take(5).zipWithIndex
          .map { case ((_, v, id), k) => (g, k + 1, id, v) }
      }.toSet
    assert(got == want)
  }

  test("topk on a group smaller than k returns the whole group ranked") {
    val df = Seq(("a", 1.0, 10L), ("a", 3.0, 11L)).toDF("g", "v", "id")
    val got = GroupTopK.topk(5)
    val r = df.groupBy($"g").agg(got($"v", $"id").as("top"))
      .select(posexplode($"top")).collect()
      .map(x => (x.getInt(0), x.getStruct(1).getLong(0)))
    assert(r.toSeq == Seq((0, 11L), (1, 10L)))
  }

  test("topk rejects k < 1") {
    intercept[IllegalArgumentException] { GroupTopK.topk(0) }
  }

  test("topkRows returns whole winning rows + rank, ids unique per group") {
    // ids deliberately REUSED across groups (unique only within a
    // group) — the (id, group) join must not cross-match
    val rows = for (g <- Seq("a", "b", null); i <- 1L to 50L)
      yield (g, i, (i * 7 % 50).toDouble, s"payload-$g-$i")
    val df = rows.toDF("g", "id", "v", "payload").repartition(5)
    val got = GroupTopK.topkRows(df, "g", "v", "id", 3)
      .collect().map(r => (Option(r.getString(0)), r.getLong(4),
        r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    val want = rows.groupBy(r => Option(r._1)).flatMap { case (g, rs) =>
      rs.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex.map {
        case ((gg, id, v, p), rk) =>
          (Option(gg), (rk + 1).toLong, id, v, p) }
    }.toSet
    assert(got == want)
    assert(got.size == 9) // 3 groups x 3, incl. the null group
  }

  test("topkRows plan: payload never shuffles — broadcast winners join") {
    val df = Seq(("a", 1L, 2.0, "p")).toDF("g", "id", "v", "payload")
    val plan = GroupTopK.topkRows(df, "g", "v", "id", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"))
  }

  test("topkRows rejects a rank-column collision loudly") {
    val df = Seq(("a", 1L, 2.0)).toDF("g", "id", "rk")
    intercept[IllegalArgumentException] {
      GroupTopK.topkRows(df, "g", "rk", "id", 2)
    }
  }

  test("topk partial-aggregates before the exchange — no full-group sort") {
    val df = Seq(("a", 1.0, 1L), ("b", 2.0, 2L)).toDF("g", "v", "id")
    val plan = df.groupBy($"g").agg(GroupTopK.topk(3)($"v", $"id"))
      .queryExecution.executedPlan.toString
    // two aggregate stages around the exchange (map-side partial caps
    // each group at k pairs pre-shuffle); no Sort / Window anywhere
    assert(plan.contains("partial_topkagg") ||
      "(?i)partial".r.findFirstIn(plan).isDefined)
    assert(plan.contains("Exchange"))
    assert(!plan.contains("Window"))
  }
}
