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
