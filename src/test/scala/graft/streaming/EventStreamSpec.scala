package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

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

  /** One (user_id, ts) drop file — the staging shape every
    * sessionization test shares. */
  private def writeUserTsChunk(dir: String, rows: Seq[(Long, Long)],
      off: Long): Unit =
    rows.zipWithIndex.map { case ((u, t), i) =>
      (off + i, new java.sql.Timestamp(t), u, "e", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)

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

  test("flatMapGroupsWithState session log: closed sessions emit once, open never") {
    val dir = Files.createTempDirectory("graft_sesslog").toString
    val t0 = 1700000000000L
    def chunk(rows: Seq[(Long, Long)], off: Long): Unit =
      writeUserTsChunk(dir, rows, off)
    // drop 1: user 7 bursts twice (closes one session inside the drop),
    // user 8 bursts once
    chunk(Seq((7L, t0), (7L, t0 + 60000), (7L, t0 + 7200000),
      (8L, t0)), 0)
    // drop 2: a later event for user 7 closes the second session; user
    // 8's open session stays open (never emitted)
    chunk(Seq((7L, t0 + 14400000)), 100)

    val stream = EventStream.fileStream(spark, dir, maxFilesPerTrigger = 1)
    val log = EventStream.sessionLog(spark, stream)
    val q = log.writeStream.format("memory")
      .queryName("sesslog_test").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("sesslog_test")
      .as[(Long, Long, Long, Long)].collect().toSet
    // session 0 of user 7 (2 events, 60s) closed by drop 1's third
    // event; session 1 (1 event, 0 ms) closed by drop 2 — STATE
    // crossed the batch boundary; user 8 has no closed session
    assert(rows == Set((7L, 0L, 2L, 60000L), (7L, 1L, 1L, 0L)))
  }

  test("session log: a late in-gap event from a later batch folds in without splitting") {
    val dir = Files.createTempDirectory("graft_late").toString
    val t0 = 1700000000000L
    def chunk(rows: Seq[(Long, Long)], off: Long): Unit =
      writeUserTsChunk(dir, rows, off)
    // batch 1: two events 20 min apart (one open session, clock at +20m)
    chunk(Seq((5L, t0), (5L, t0 + 1200000)), 0)
    // batch 2: a LATE event at +10m (inside the gap) and an on-time
    // event at +45m. Without the max() clock, the late event rewinds
    // last to +10m and +45m falsely splits (35m > 30m gap); with it,
    // +45m is 25m after +20m -> still ONE open session, nothing emits
    chunk(Seq((5L, t0 + 600000), (5L, t0 + 2700000)), 100)
    val stream = EventStream.fileStream(spark, dir, maxFilesPerTrigger = 1)
    val q = EventStream.sessionLog(spark, stream)
      .writeStream.format("memory")
      .queryName("late_sesslog").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.table("late_sesslog").count() == 0,
      "the late in-gap event must not split the open session")
  }

  test("evicting sessionize: timeouts emit terminal rows and drop state") {
    val dir = Files.createTempDirectory("graft_evict1").toString
    val t0 = 1700000000000L
    def chunk(rows: Seq[(Long, Long)], off: Long): Unit =
      writeUserTsChunk(dir, rows, off)
    // batch 1: user 1 has 2 sessions, user 2 has 1
    chunk(Seq((1L, t0), (1L, t0 + 60000), (1L, t0 + 7200000),
      (2L, t0)), 0)
    // batches 2+3: flush sentinels push the watermark past every
    // (last + gap), so batch 3 must fire user 1 and 2's timeouts
    chunk(Seq((99L, t0 + 90 * 60000L)), 100)
    chunk(Seq((99L, t0 + 300 * 60000L)), 200)
    val stream = EventStream.fileStream(spark, dir, maxFilesPerTrigger = 1)
    val out = EventStream.sessionizeEvicting(spark, stream,
      gapMillis = 30 * 60 * 1000L, watermark = "1 second")
    val q = out.writeStream.format("memory")
      .queryName("evict_sess").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val terminal = spark.table("evict_sess").filter(col("closed"))
      .select("userId", "sessions").as[(Long, Long)].collect().toMap
    assert(terminal.view.filterKeys(_ != 99L).toMap ==
      Map(1L -> 2L, 2L -> 1L),
      s"expected terminal eviction rows, got $terminal")
  }

  test("evicting sessionize: post-eviction events restart a fresh epoch") {
    // the DOCUMENTED trade of eviction: after a user's state is
    // removed, a later event restarts the counter at 1 (by the gap
    // definition it IS a new session); downstream sums the closed
    // counts per user across epochs. Pin it so it cannot silently
    // change.
    val dir = Files.createTempDirectory("graft_evict3").toString
    val t0 = 1700000000000L
    def chunk(rows: Seq[(Long, Long)], off: Long): Unit =
      writeUserTsChunk(dir, rows, off)
    chunk(Seq((1L, t0), (1L, t0 + 60000)), 0)       // epoch 1: 1 session
    chunk(Seq((99L, t0 + 120 * 60000L)), 100)       // advance watermark
    chunk(Seq((99L, t0 + 125 * 60000L)), 150)       // fire user 1's timeout
    chunk(Seq((1L, t0 + 180 * 60000L)), 200)        // epoch 2 begins
    chunk(Seq((99L, t0 + 360 * 60000L)), 300)       // advance watermark
    chunk(Seq((99L, t0 + 540 * 60000L)), 400)       // fire epoch-2 timeout
    val stream = EventStream.fileStream(spark, dir, maxFilesPerTrigger = 1)
    val q = EventStream.sessionizeEvicting(spark, stream,
        gapMillis = 30 * 60 * 1000L, watermark = "1 second")
      .writeStream.format("memory")
      .queryName("evict_epochs").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val closed = spark.table("evict_epochs")
      .filter(col("closed") && col("userId") === 1L)
      .select("sessions").as[Long].collect().toSeq
    // two terminal rows, one per epoch, each counting from 1 — their
    // SUM equals the batch gap-count (2 sessions)
    assert(closed == Seq(1L, 1L), s"got $closed")
  }

  test("evicting sessionize: data arriving in the timeout batch folds in") {
    // the companion shape: when a group's new data lands in the very
    // batch its timeout would fire, Spark takes the data path — the
    // event folds into the still-live state and the count CONTINUES
    // (one terminal row, never a double count)
    val dir = Files.createTempDirectory("graft_evict4").toString
    val t0 = 1700000000000L
    def chunk(rows: Seq[(Long, Long)], off: Long): Unit =
      writeUserTsChunk(dir, rows, off)
    chunk(Seq((1L, t0), (1L, t0 + 60000)), 0)
    chunk(Seq((99L, t0 + 120 * 60000L)), 100)   // watermark passes gap
    chunk(Seq((1L, t0 + 180 * 60000L)), 200)    // collides with timeout
    chunk(Seq((99L, t0 + 360 * 60000L)), 300)
    chunk(Seq((99L, t0 + 540 * 60000L)), 400)
    val stream = EventStream.fileStream(spark, dir, maxFilesPerTrigger = 1)
    val q = EventStream.sessionizeEvicting(spark, stream,
        gapMillis = 30 * 60 * 1000L, watermark = "1 second")
      .writeStream.format("memory")
      .queryName("evict_collide").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val closed = spark.table("evict_collide")
      .filter(col("closed") && col("userId") === 1L)
      .select("sessions").as[Long].collect().toSeq
    assert(closed == Seq(2L), s"got $closed")
  }

  test("evicting session log equals the full batch session log after flush") {
    val dir = Files.createTempDirectory("graft_evict2").toString
    val t0 = 1700000000000L
    def chunk(rows: Seq[(Long, Long)], off: Long): Unit =
      writeUserTsChunk(dir, rows, off)
    chunk(Seq((7L, t0), (7L, t0 + 60000), (7L, t0 + 7200000),
      (8L, t0), (8L, t0 + 120000)), 0)
    chunk(Seq((99L, t0 + 200 * 60000L)), 100)
    chunk(Seq((99L, t0 + 500 * 60000L)), 200)
    val stream = EventStream.fileStream(spark, dir, maxFilesPerTrigger = 1)
    val q = EventStream.sessionLogEvicting(spark, stream,
        watermark = "1 second")
      .writeStream.format("memory")
      .queryName("evict_log").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("evict_log").filter(col("user_id") =!= 99L)
      .as[(Long, Long, Long, Long)].collect().toSet
    // EVERY session present, trailing ones included (the NoTimeout
    // form can never emit those): user 7 = closed-in-stream session
    // (2 ev, 60s) + evicted trailing single; user 8 = evicted burst
    assert(rows == Set(
      (7L, t0, 2L, 60000L),
      (7L, t0 + 7200000, 1L, 0L),
      (8L, t0, 2L, 120000L)), s"got $rows")
  }

  test("parquet sink restart resumes exactly-once from the checkpoint") {
    val src = Files.createTempDirectory("graft_sink_src").toString
    val out = Files.createTempDirectory("graft_sink_out").toString
    val ckpt = Files.createTempDirectory("graft_sink_ck").toString
    writeEventChunk(src, 0, 10)
    writeEventChunk(src, 10, 10)
    def drain(): Unit = {
      val q = EventStream.fileStream(spark, src, maxFilesPerTrigger = 1)
        .select(col("event_id"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    drain() // run 1 commits the first two drops
    assert(spark.read.parquet(out).count() == 20)
    writeEventChunk(src, 20, 10)
    drain() // the restart must process ONLY the unseen drop: the file
    // source's checkpointed log skips the first two, and the sink's
    // _spark_metadata keeps their output committed exactly once
    val ids = spark.read.parquet(out).select("event_id")
      .as[Long].collect().sorted
    assert(ids.length == 30 && ids.toSet.size == 30)
    assert(ids.head == 0L && ids.last == 29L)
  }

  test("stateful streaming runs on the RocksDB state store provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("graft_rocks").toString
      writeEventChunk(dir, 0, 20)
      writeEventChunk(dir, 20, 20)
      val stream = EventStream.fileStream(spark, dir, maxFilesPerTrigger = 1)
      val agg = EventStream.dedupEvents(stream)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val q = agg.writeStream.format("memory")
        .queryName("rocks_test").outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      // the provider really ran: RocksDB-specific metrics appear on the
      // stateful operators of every progress event
      val progressed = q.recentProgress.flatMap(_.stateOperators)
      assert(progressed.exists(_.customMetrics.keySet.asScala
        .exists(_.toLowerCase.contains("rocksdb"))),
        "expected RocksDB state store metrics in query progress")
      val n = spark.sql("SELECT sum(n) FROM rocks_test").as[Long].head()
      assert(n == 40L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-stream interval join equals the batch join") {
    val dir = Files.createTempDirectory("graft_ssj").toString
    writeEventChunk(dir, 0, 30)
    writeEventChunk(dir, 30, 30)
    val stream = EventStream.fileStream(spark, dir, maxFilesPerTrigger = 1)
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = stream.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
    // 5-minute trailing window, 10-minute watermark
    val joined = EventStream.intervalJoin(clicks, views,
        windowMillis = 5 * 60000L, watermark = "10 minutes")
      .select(col("l.event_id").as("click_id"), col("r.view_id"))
    val q = EventStream.startMemorySink(joined, "ssj_test", "append")
    q.awaitTermination(60000)
    val got = spark.sql("SELECT click_id, view_id FROM ssj_test")
      .as[(Long, Long)].collect().toSet
    // batch reference over the same files
    val batch = spark.read.parquet(dir)
    val want = batch.as("c").filter(col("c.event_type") === "click")
      .join(batch.as("v").filter(col("v.event_type") === "view"),
        col("c.user_id") === col("v.user_id") &&
          col("v.ts") >= col("c.ts") - expr("INTERVAL 300 SECONDS") &&
          col("v.ts") <= col("c.ts"))
      .select(col("c.event_id"), col("v.event_id"))
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty && got == want)
  }

  test("watermark drops late data deterministically across ordered drops") {
    val dir = Files.createTempDirectory("graft_wm").toString
    def drop(name: String, modMinute: Int, rows: Seq[(Long, Int)]): Unit = {
      // stage as a single top-level file (the file source does not
      // recurse) with a pinned mod-time to fix the processing order
      val tmp = Files.createTempDirectory("graft_wm_stage")
      rows.map { case (id, minute) =>
        (id, ts(minute), 1L, "click", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString
        .endsWith(".parquet")).findFirst.get
      val dest = java.nio.file.Paths.get(dir, s"$name.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1700000000000L + modMinute * 60000L)
    }
    // drop 1: events through minute 60 -> watermark becomes 50 after
    // batch 0. (Spark filters late rows with the PREVIOUS batch's
    // watermark and evicts with the current one, so the drop that
    // carries the late row must come two batches after the one that
    // advanced the watermark past its window.)
    drop("d1", 1, Seq((1L, 2), (2L, 5), (3L, 60)))
    // drop 2: fresh event only; batch 1 runs with late-filter wm=50
    // and finalizes the [*, +10) window holding events 1-2
    drop("d2", 2, Seq((4L, 61)))
    // drop 3: a LATE event for the finalized window + a fresh one —
    // the late row must be dropped, not re-emitted
    drop("d3", 3, Seq((5L, 5), (6L, 62)))

    val stream = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val agg = EventStream.hourlyAggregates(stream,
      watermark = "10 minutes", window_ = "10 minutes")
    val q = EventStream.startMemorySink(agg, "wm_test", "append")
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT window_start, n FROM wm_test")
      .as[(java.sql.Timestamp, Long)].collect()
      .map { case (w, n) => ((w.getTime - 1700000000000L) / 60000L, n) }
    // the early window emits exactly once, with only its two on-time
    // rows — the late event 5 was dropped by the watermark
    assert(rows.toSeq == Seq((-3L, 2L)), rows.mkString(","))
    // the batch equivalent over the same files counts all three
    val batch = spark.read.parquet(dir).filter(col("ts") < ts(10)).count()
    assert(batch == 3L)
  }

  test("streaming anomaly equals the batch operator across batches and on negative half-cents") {
    import org.apache.spark.sql.types._
    // user 1: six-event baseline in file 0, the spike in file 1 — the
    // flag only exists if the ring crossed the batch boundary.
    // user 7: seven identical -0.125 events (σ = 0 ring): HALF_UP
    // cents give yc = -13 everywhere and dev = 0 → NO flag; a
    // half-toward-+inf rounding (math.round) gives a ring of -12 vs
    // a candidate of -13 → dev ≠ 0 over σ = 0 → a false flag
    val f0 = (0 until 6).map(i => (100L + i, ts(i), 1L, 10.0 + 0.01 * i)) ++
      (0 until 6).map(i => (200L + i, ts(i), 7L, -0.125))
    val f1 = Seq((110L, ts(6), 1L, 99.0), (210L, ts(6), 7L, -0.125))
    val dir = java.nio.file.Files.createTempDirectory("graft_anomspec")
    def dump(rows: Seq[(Long, java.sql.Timestamp, Long, Double)],
        name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_anp")
      rows.toDF("event_id", "ts", "user_id", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, dir.resolve(name))
    }
    dump(f0, "drop_0.parquet"); dump(f1, "drop_1.parquet")
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val q = EventStream.anomalyStream(spark, stream)
      .writeStream.format("memory").queryName("anom_parity")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("anom_parity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val batch = graft.operators.TimeSeries.rollingAnomalies(
        (f0 ++ f1).toDF("event_id", "ts", "user_id", "value"),
        "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSet
    assert(got === batch, s"stream $got vs batch $batch")
    assert(got.contains((1L, 110L, 6L)), "cross-batch spike missing")
    assert(!got.exists(_._1 == 7L), "σ=0 negative ring false-flagged")
  }

  private def ts(minute: Int) =
    new java.sql.Timestamp(1700000000000L + minute * 60000L)
}
