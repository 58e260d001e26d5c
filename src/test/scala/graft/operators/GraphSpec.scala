package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches the driver-side power iteration") {
    // 5 nodes; node 5 has no out-edges (its mass drains: dropped
    // contributions are the documented semantics), node 4 has no
    // in-edges (settles at (1-d)/N + nothing)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L),
      (4L, 5L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val d = 0.85
    val iters = 7
    var ref = Map(1L -> 0.2, 2L -> 0.2, 3L -> 0.2, 4L -> 0.2, 5L -> 0.2)
    val out = Map(1L -> Seq(2L, 3L), 2L -> Seq(3L), 3L -> Seq(1L),
      4L -> Seq(1L, 5L))
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      out.foreach { case (u, vs) =>
        vs.foreach(v => contrib(v) += ref(u) / vs.size) }
      ref = ref.keys.map(v => v -> ((1 - d) / 5 + d * contrib(v))).toMap
    }
    val got = Graph.pageRank(edges, nodes, iters, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === ref.keySet)
    ref.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-12, s"node $k: ${got(k)} vs $v") }
    // rank order sanity: 1 and 3 feed each other and dominate
    assert(got(3L) > got(5L) && got(1L) > got(4L))
  }

  test("pageRank is deterministic across runs and validates inputs") {
    val edges = (1L to 50L).map(i => (i, i % 50 + 1)).toDF("src", "dst")
    val nodes = (1L to 50L).toDF("id")
    def run() = Graph.pageRank(edges, nodes, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run() === run())
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges, nodes, 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges, nodes, 3, damping = 1.0)
    }
  }
}
