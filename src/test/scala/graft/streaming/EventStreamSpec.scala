package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeEventChunk(dir: String, idOffset: Long, n: Int): Unit = {
    val rows = (0 until n).map { i =>
      (idOffset + i,
        new java.sql.Timestamp(1700000000000L + (idOffset + i) * 60000),
        (idOffset + i) % 3,
        if (i % 2 == 0) "click" else "view",
        i.toDouble, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("file-source stream drains dropped files into windowed aggregates") {
    val dir = Files.createTempDirectory("graft_stream").toString
    writeEventChunk(dir, 0, 20)
    writeEventChunk(dir, 20, 20)

    val stream = EventStream.fileStream(spark, dir, maxFilesPerTrigger = 1)
    assert(stream.isStreaming)
    val agg = EventStream.hourlyAggregates(stream,
      watermark = "10 minutes", window_ = "10 minutes")
    // complete mode: the memory sink holds the final aggregate table
    // (update mode would append per-trigger revisions)
    val q = EventStream.startMemorySink(agg, "hourly_test", "complete")
    q.awaitTermination(60000)

    val out = spark.sql("SELECT sum(n) FROM hourly_test").as[Long].head()
    assert(out == 40L)
    val types = spark.sql("SELECT DISTINCT event_type FROM hourly_test")
      .as[String].collect().toSet
    assert(types == Set("click", "view"))
  }

  test("stateful sessionize counts gap-separated sessions per user") {
    // user 1: two bursts separated by > gap; user 2: one burst
    val rows = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(120)), // gap 119 min -> 2 sessions
      (2L, ts(5)), (2L, ts(6))
    ).map { case (u, t) => (u * 100, t, u, "e", 0.0, "{}") }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStream.sessionize(spark, df, gapMillis = 30 * 60 * 1000L)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  private def ts(minute: Int) =
    new java.sql.Timestamp(1700000000000L + minute * 60000L)
}
