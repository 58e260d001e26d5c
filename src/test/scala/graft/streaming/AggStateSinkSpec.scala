package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AggStateSinkSpec extends SparkSpec {
  import spark.implicits._

  private def snap(df: DataFrame) = df.collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4)))).toMap

  test("sequential commits equal the full recompute; pruning keeps one snapshot") {
    val dir = Files.createTempDirectory("graft_aggsink").toString
    val batches = (0 until 3).map(b =>
      spark.range(b * 100, (b + 1) * 100).select(
        pmod(col("id"), lit(7)).as("k"),
        (col("id") % 31).cast("double").as("v")))
    batches.zipWithIndex.foreach { case (b, i) =>
      assert(AggStateSink.commit(spark, dir, i.toLong, b, Seq("k"), "v"))
    }
    val got = snap(AggStateSink.read(spark, dir).get)
    val full = snap(Warehouse.aggState(
      batches.reduce(_ unionByName _), Seq("k"), "v")
      .select(col("k"), col("n"), col("sum_v").cast("double"),
        col("min_v").cast("double"), col("max_v").cast("double")))
    assert(got === full)
    assert(AggStateSink.latest(dir) === Some(2L))
    // superseded snapshots pruned, EXCEPT the immediately-previous
    // one (one-commit grace for lazy readers of the old pointer)
    val vs = new java.io.File(dir).list().filter(_.startsWith("v_")).toSet
    assert(vs === Set("v_1", "v_2"))
  }

  test("re-delivered batch id is a no-op (at-least-once becomes exactly-once)") {
    val dir = Files.createTempDirectory("graft_aggsink2").toString
    val b0 = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")
    val b1 = Seq((1L, 5.0)).toDF("k", "v")
    assert(AggStateSink.commit(spark, dir, 0L, b0, Seq("k"), "v"))
    assert(AggStateSink.commit(spark, dir, 1L, b1, Seq("k"), "v"))
    val before = snap(AggStateSink.read(spark, dir).get)
    // crash-replay: batches 0 and 1 re-deliver — both must no-op
    assert(!AggStateSink.commit(spark, dir, 0L, b0, Seq("k"), "v"))
    assert(!AggStateSink.commit(spark, dir, 1L, b1, Seq("k"), "v"))
    assert(snap(AggStateSink.read(spark, dir).get) === before)
  }

  test("commitWith carries CDC upsert state: deletes land, replays no-op") {
    val dir = Files.createTempDirectory("graft_cdcsink").toString
    def cdcCommit(id: Long, batch: org.apache.spark.sql.DataFrame) =
      AggStateSink.commitWith(spark, dir, id) { prev =>
        val full = prev match {
          case Some(st) => st.select(col("k"), lit(-1L).as("seq"),
            lit("I").as("op"), col("v")).unionByName(batch)
          case None => batch
        }
        Warehouse.cdcApply(full, "k", "seq", "op", Seq("v"))
      }
    val b0 = Seq((1L, 1L, "I", 10.0), (2L, 2L, "I", 5.0))
      .toDF("k", "seq", "op", "v")
    val b1 = Seq((1L, 3L, "U", 11.0), (2L, 4L, "D", 0.0),
      (3L, 5L, "I", 7.0)).toDF("k", "seq", "op", "v")
    assert(cdcCommit(0L, b0) && cdcCommit(1L, b1))
    def state() = AggStateSink.read(spark, dir).get.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val expect = Set((1L, 11.0), (3L, 7.0)) // 2 deleted across batches
    assert(state() === expect)
    assert(!cdcCommit(1L, b1)) // redelivery no-ops
    assert(state() === expect)
  }

  test("crash between snapshot write and pointer swap recovers by replay") {
    val dir = Files.createTempDirectory("graft_aggsink3").toString
    val b0 = Seq((1L, 2.0)).toDF("k", "v")
    assert(AggStateSink.commit(spark, dir, 0L, b0, Seq("k"), "v"))
    // simulate the crash window: v_1 written (even garbage), pointer
    // still at 0 — the replayed commit must overwrite and land
    Warehouse.aggState(Seq((9L, 9.9)).toDF("k", "v"), Seq("k"), "v")
      .write.mode("overwrite").parquet(s"$dir/v_1")
    assert(AggStateSink.latest(dir) === Some(0L))
    val b1 = Seq((1L, 3.0)).toDF("k", "v")
    assert(AggStateSink.commit(spark, dir, 1L, b1, Seq("k"), "v"))
    val got = snap(AggStateSink.read(spark, dir).get)
    assert(got === Map(1L -> ((2L, 5.0, 2.0, 3.0))))
  }
}
