package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinkCompactionSpec extends SparkSpec {
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

  private def drain(src: String, out: String, ckpt: String): Unit = {
    val q = EventStream.fileStream(spark, src, maxFilesPerTrigger = 1)
      .select(col("event_id"), col("event_type"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
  }

  private def dataFiles(out: String): Seq[String] = {
    val st = Files.list(Paths.get(out))
    try st.iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
      .toSeq
    finally st.close()
  }

  test("compaction preserves committed rows exactly and excludes strays") {
    val src = Files.createTempDirectory("cmp_src").toString
    val out = Files.createTempDirectory("cmp_out").toString
    val ckpt = Files.createTempDirectory("cmp_ck").toString
    (0 until 4).foreach(i => writeEventChunk(src, i * 10, 10))
    drain(src, out, ckpt)
    val before = spark.read.parquet(out).as[(Long, String)].collect().sorted
    assert(before.length == 40)
    assert(dataFiles(out).size >= 4, s"want >=4 files, got ${dataFiles(out)}")

    // a stray file (failed-batch leftover): invisible via the metadata
    // log before AND after the swap — a compactor that globbed the
    // directory instead of reading the log would double these rows
    val committed = SinkCompaction.committedFiles(out)._1.head
    Files.copy(Paths.get(new java.net.URI(committed)),
      Paths.get(out, "stray-uncommitted.parquet"))
    assert(spark.read.parquet(out).count() == 40)

    val (nb, na) = SinkCompaction.compact(spark, out, 1L << 30)
    assert(nb >= 4 && na == 1, s"($nb, $na)")
    val after = spark.read.parquet(out).as[(Long, String)].collect().sorted
    assert(after.toSeq == before.toSeq, "hash identity broken by compaction")
    // disk holds exactly the compacted file + the stray
    val disk = dataFiles(out)
    assert(disk.count(_.startsWith("compact-")) == 1 &&
      disk.contains("stray-uncommitted.parquet") && disk.size == 2, disk)

    // RESTART SAFETY: same checkpoint, one more drop — the kept batch
    // ids mean nothing re-commits; rows appear exactly once
    writeEventChunk(src, 40, 10)
    drain(src, out, ckpt)
    val ids = spark.read.parquet(out).select("event_id")
      .as[Long].collect().sorted
    assert(ids.length == 50 && ids.toSet.size == 50 && ids.last == 49L)
  }

  test("partitionBy sinks compact per partition directory") {
    val src = Files.createTempDirectory("cmpp_src").toString
    val out = Files.createTempDirectory("cmpp_out").toString
    val ckpt = Files.createTempDirectory("cmpp_ck").toString
    (0 until 3).foreach(i => writeEventChunk(src, i * 10, 10))
    val q = EventStream.fileStream(spark, src, maxFilesPerTrigger = 1)
      .select(col("event_id"), col("event_type"))
      .writeStream.format("parquet").partitionBy("event_type")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val before = spark.read.parquet(out)
      .as[(Long, String)].collect().sorted
    assert(before.length == 30)
    val (nb, na) = SinkCompaction.compact(spark, out, 1L << 30)
    assert(nb == 6 && na == 2, s"($nb, $na)") // 3 batches x 2 types -> 1/dir
    val after = spark.read.parquet(out).as[(Long, String)].collect().sorted
    assert(after.toSeq == before.toSeq,
      "partition values must survive compaction")
    // files really live under their partition directories
    Seq("click", "view").foreach { t =>
      val dir = Paths.get(out, s"event_type=$t")
      val st = Files.list(dir)
      val files = try st.iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq
        finally st.close()
      assert(files.size == 1 && files.head.startsWith("compact-"), files)
    }
    // partition pruning still works over the compacted layout
    assert(spark.read.parquet(out)
      .filter(col("event_type") === "click").count() == 15)
  }

  test("compaction is a no-op when already at the target") {
    val src = Files.createTempDirectory("cmp1_src").toString
    val out = Files.createTempDirectory("cmp1_out").toString
    val ckpt = Files.createTempDirectory("cmp1_ck").toString
    writeEventChunk(src, 0, 10)
    drain(src, out, ckpt)
    val (nb, na) = SinkCompaction.compact(spark, out, 1L << 30)
    assert(nb == na)
    assert(spark.read.parquet(out).count() == 10)
  }

  test("recover finishes an interrupted swap") {
    val src = Files.createTempDirectory("cmp2_src").toString
    val out = Files.createTempDirectory("cmp2_out").toString
    val ckpt = Files.createTempDirectory("cmp2_ck").toString
    (0 until 2).foreach(i => writeEventChunk(src, i * 10, 10))
    drain(src, out, ckpt)
    // simulate a crash between the two renames: live log retired, the
    // prepared replacement not yet promoted
    val live = Paths.get(out, "_spark_metadata")
    val prep = Paths.get(out, "_spark_metadata.compacting")
    Files.move(live, prep)
    SinkCompaction.recover(out)
    assert(Files.isDirectory(live) && !Files.exists(prep))
    assert(spark.read.parquet(out).count() == 20)
    // and recover with a healthy log is a harmless no-op
    SinkCompaction.recover(out)
    assert(spark.read.parquet(out).count() == 20)
  }

  test("recover garbage-collects unpublished compaction orphans") {
    val src = Files.createTempDirectory("cmp3_src").toString
    val out = Files.createTempDirectory("cmp3_out").toString
    val ckpt = Files.createTempDirectory("cmp3_ck").toString
    (0 until 2).foreach(i => writeEventChunk(src, i * 10, 10))
    drain(src, out, ckpt)
    // a crashed run's moved-but-never-published compact file: visible
    // on disk, referenced by nothing
    val committed = SinkCompaction.committedFiles(out)._1.head
    val orphan = Paths.get(out, "compact-deadbeef-part-00000.parquet")
    Files.copy(Paths.get(new java.net.URI(committed)), orphan)
    SinkCompaction.recover(out)
    assert(!Files.exists(orphan), "orphan survived recover")
    assert(spark.read.parquet(out).count() == 20)
    // a LIVE compaction's files survive the sweep (they are committed)
    val (nb, na) = SinkCompaction.compact(spark, out, 1L << 30)
    assert(nb == 2 && na == 1)
    SinkCompaction.recover(out)
    assert(spark.read.parquet(out).count() == 20)
  }

  test("the compaction lock serializes compactors; stale locks break") {
    val src = Files.createTempDirectory("cmp4_src").toString
    val out = Files.createTempDirectory("cmp4_out").toString
    val ckpt = Files.createTempDirectory("cmp4_ck").toString
    (0 until 2).foreach(i => writeEventChunk(src, i * 10, 10))
    drain(src, out, ckpt)
    val lock = Paths.get(out, "_spark_metadata.compaction.lock")
    // a fresh lock (live run) blocks
    Files.write(lock,
      System.currentTimeMillis().toString.getBytes("UTF-8"))
    val e = intercept[IllegalStateException](
      SinkCompaction.compact(spark, out, 1L << 30))
    assert(e.getMessage.contains("in flight"))
    // a stale lock (crashed run past the TTL) is replaced and the
    // compaction proceeds
    Files.write(lock, (System.currentTimeMillis() - 10L * 3600 * 1000)
      .toString.getBytes("UTF-8"))
    val (nb, na) = SinkCompaction.compact(spark, out, 1L << 30)
    assert(nb == 2 && na == 1)
    assert(!Files.exists(lock), "lock not released")
    assert(spark.read.parquet(out).count() == 20)
  }

  test("recover replays an interrupted retire list, sparing committed files") {
    val src = Files.createTempDirectory("cmp5_src").toString
    val out = Files.createTempDirectory("cmp5_out").toString
    val ckpt = Files.createTempDirectory("cmp5_ck").toString
    (0 until 2).foreach(i => writeEventChunk(src, i * 10, 10))
    drain(src, out, ckpt)
    val committed = SinkCompaction.committedFiles(out)._1
      .map(p => Paths.get(new java.net.URI(p)))
    // crash-after-publish shape: a retire list naming a replaced file
    // (simulated by an uncommitted copy) AND a still-committed file —
    // recover must delete the former and spare the latter
    val replaced = Paths.get(out, "old-replaced.parquet")
    Files.copy(committed.head, replaced)
    val retireList = Paths.get(out, "_spark_metadata.retirelist")
    Files.write(retireList,
      s"$replaced\n${committed.head}".getBytes("UTF-8"))
    SinkCompaction.recover(out)
    assert(!Files.exists(replaced), "replaced file survived GC replay")
    assert(Files.exists(committed.head), "committed file deleted!")
    assert(!Files.exists(retireList))
    assert(spark.read.parquet(out).count() == 20)
  }

  test("restarted sink's own interval compaction carries the rewritten history") {
    // the CompactibleFileStreamLog interaction the name-set-preserving
    // rewrite exists for (VERDICT r11 #4): the sink log compacts
    // itself every compactInterval batches at ARITHMETICALLY derived
    // ids — after our rewrite, a restarted query run past the next
    // boundary must produce a `.compact` whose listing still contains
    // the compaction's file set (and the reader must see every row
    // exactly once).
    val interval = "spark.sql.streaming.fileSink.log.compactInterval"
    val prev = spark.conf.get(interval, "10")
    spark.conf.set(interval, "5") // boundaries at batch ids 4, 9, 14
    try {
      val src = Files.createTempDirectory("cmp6_src").toString
      val out = Files.createTempDirectory("cmp6_out").toString
      val ckpt = Files.createTempDirectory("cmp6_ck").toString
      // 7 drops -> batches 0..6: the live log already holds 4.compact
      (0 until 7).foreach(i => writeEventChunk(src, i * 10, 10))
      drain(src, out, ckpt)
      val logNames = {
        val st = Files.list(Paths.get(out, "_spark_metadata"))
        try st.iterator().asScala.map(_.getFileName.toString).toSeq
        finally st.close()
      }
      assert(logNames.contains("4.compact"),
        s"precondition: sink log should have self-compacted at 4: $logNames")

      val (nb, na) = SinkCompaction.compact(spark, out, 1L << 30)
      assert(nb == 7 && na == 1, s"($nb, $na)")
      assert(spark.read.parquet(out).count() == 70)

      // restart past the NEXT boundary: batches 7..11 cross id 9
      (7 until 12).foreach(i => writeEventChunk(src, i * 10, 10))
      drain(src, out, ckpt)
      val ids = spark.read.parquet(out).select("event_id")
        .as[Long].collect().sorted
      assert(ids.length == 120 && ids.toSet.size == 120 &&
        ids.last == 119L, "rows lost or duplicated across the boundary")
      // the sink wrote 9.compact itself, and its full listing still
      // references the compacted file — the rewritten history kept
      // the shape the log's arithmetic expects
      val nine = Paths.get(out, "_spark_metadata", "9.compact")
      assert(Files.exists(nine), "sink log did not compact at id 9")
      val listing = Files.readAllLines(nine).asScala.mkString("\n")
      assert(listing.contains("compact-"),
        "the sink's own .compact lost the compaction's file set")
    } finally spark.conf.set(interval, prev)
  }
}
