package graft
import org.apache.spark.sql.SparkSession

/** Per-task-end accumulation of the metrics that adjudicate a slow
  * query: real spill vs GC pressure vs plain compute. Registered once;
  * `snapshot` drains the running totals between queries. */
private final class BenchDiagListener
    extends org.apache.spark.scheduler.SparkListener {
  private var gcMs = 0L
  private var spillMem = 0L
  private var spillDisk = 0L
  private var runMs = 0L
  override def onTaskEnd(
      t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
    synchronized {
      val m = t.taskMetrics
      if (m != null) {
        gcMs += m.jvmGCTime
        spillMem += m.memoryBytesSpilled
        spillDisk += m.diskBytesSpilled
        runMs += m.executorRunTime
      }
    }
  /** (gc ms, spilled mem bytes, spilled disk bytes, run ms) since last call. */
  def snapshot(): (Long, Long, Long, Long) = synchronized {
    val s = (gcMs, spillMem, spillDisk, runMs)
    gcMs = 0; spillMem = 0; spillDisk = 0; runMs = 0
    s
  }
}

object Bench {
  /** The per-cell regression gate: within 2x the committed floor, OR
    * within the sub-second variance band — capped at 2x the floor so
    * tiny-floor cells keep a meaningful gate (an unconditional 0.5 s
    * band would pass a 0.05 s floor at 0.55 s, an 11x regression;
    * ADVICE r15). Object-level so BenchGateSpec pins the policy. */
  def withinGate(dt: Double, fl: Double): Boolean =
    dt / fl <= 2.0 || dt - fl <= math.min(0.5, 2.0 * fl)

  /** Stream-class cells commit micro-batch checkpoints (state stores +
    * offset/commit logs) through fsync, so disk-sync ambience — which a
    * warm parquet-scan gauge cannot feel (r16: four such cells sat
    * formally `over` while sql_q6's own file reads came from page
    * cache) — is their dominant contention class. */
  def isStreamCell(name: String): Boolean =
    // the token "stream", underscore-delimited — every checkpoint-
    // committing cell is named that way (events_stream_*, *_stream,
    // corpus_stream_ingest). A bare substring match would hand cells
    // like "upstream_join" the looser io_ambient gate (ADVICE r17);
    // BenchIoGateSpec pins the counter-examples.
    name.split("_").contains("stream")

  /** Median latency of a 4 KiB write+force cycle on the checkpoint
    * filesystem, in ms — the direct gauge for the fsync contention
    * class (the r16 diagnosis used an equivalent dd oflag=dsync probe:
    * ~0.5 ms quiet, ~2.6 ms degraded). Median of n cycles resists one
    * stray scheduler stall. */
  def fsyncProbeMs(n: Int = 7): Double = {
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"))
    val buf = java.nio.ByteBuffer.allocate(4096)
    var b = 0
    while (b < 4096) { buf.put((b % 251).toByte); b += 1 }
    val times = new Array[Double](n)
    var i = 0
    while (i < n) {
      val f = java.nio.file.Files.createTempFile(dir, "graft_fsync", ".bin")
      val ch = java.nio.channels.FileChannel.open(f,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      try {
        buf.rewind()
        val t0 = System.nanoTime()
        ch.write(buf)
        ch.force(true)
        times(i) = (System.nanoTime() - t0) / 1e6
      } finally {
        ch.close()
        java.nio.file.Files.deleteIfExists(f)
      }
      i += 1
    }
    java.util.Arrays.sort(times)
    times(n / 2)
  }

  /** The io_ambient verdict's guard (object-level so BenchIoGateSpec
    * pins the policy): a stream-class cell whose solo replay still
    * misses the gate may be excused ONLY when a streaming-ambience
    * gauge taken at replay time is itself degraded (>1.5x its
    * committed floor) — either the raw fsync probe or the micro-batch
    * round-trip probe, whichever is worse, since the two measure the
    * two halves of the contention class (sync-write latency vs
    * batch scheduling + commit overhead) — and the cell's own
    * diagnostics are IO-wait shaped (zero gc pressure, zero spill).
    * Anything else is a real `over`. */
  def ioAmbientExcuse(isStream: Boolean, ioRatio: Option[Double],
      gcMs: Long, spillMem: Long, spillDisk: Long): Boolean =
    isStream && ioRatio.exists(_ > 1.5) && gcMs < 200 &&
      spillMem == 0L && spillDisk == 0L

  /** Wall seconds for a MINIATURE streaming cell: two one-file
    * micro-batches (maxFilesPerTrigger=1) from a prepared 2-file drop
    * directory through a fresh temp checkpoint into a memory sink.
    * This is the direct gauge for micro-batch ROUND-TRIP ambience —
    * driver scheduling, offset/commit log writes, state-free batch
    * planning — which the fsync probe alone cannot feel (r17: four
    * session cells replayed 2-2.8x over sub-second floors while the
    * fsync probe read quiet; their inflation was batch-overhead
    * shaped, not sync-write shaped). Quiet reading ~0.3-0.6 s; the
    * committed floor rides the ledger as `stream_probe_s`. */
  def streamProbeSec(spark: SparkSession, fixtureDir: String): Double = {
    val qn = s"__gauge_stream_${probeSeq.incrementAndGet()}"
    val t0 = System.nanoTime()
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(fixtureDir)
      .groupBy().count()
      .writeStream.format("memory").queryName(qn)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.catalog.dropTempView(qn)
    (System.nanoTime() - t0) / 1e9
  }
  private val probeSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Prepare [[streamProbeSec]]'s 2-file drop directory once. */
  def streamProbeFixture(spark: SparkSession): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sprobe")
    dir.toFile.deleteOnExit()
    (1 to 2).foreach { i =>
      spark.range(4).selectExpr("id as v").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/f$i")
    }
    // readStream over the parent matches only the part files
    val files = java.nio.file.Files.walk(dir).iterator()
    val flat = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    while (files.hasNext) {
      val p = files.next()
      if (p.toString.endsWith(".parquet") &&
          p.getFileName.toString.startsWith("part-")) flat += p
    }
    val out = java.nio.file.Files.createTempDirectory("graft_sprobe_flat")
    out.toFile.deleteOnExit()
    flat.zipWithIndex.foreach { case (p, i) =>
      java.nio.file.Files.copy(p, out.resolve(s"drop_$i.parquet"))
    }
    out.toString
  }

  /** Per-cell catalog hygiene: drop every temp view left behind by the
    * finished cell. Stream cells register their memory SINK as a temp
    * view (`.queryName(...)` + `s.table(...)`), and that view pins the
    * sink's whole in-memory table for the session's lifetime — at the
    * 100x replica a single session-log table is millions of rows, so
    * by mid-sweep tens of such tables were live and later cells read
    * 3-4x their quiet time in pure GC (measured: session_window 44 s
    * in one sweep, 146 s with 418 s of task GC in another — the delta
    * was accumulated sink tables, not the cell). Runs AFTER the timed
    * window, alongside clearCache/unpersist; each cell re-registers
    * its own view, so dropping between cells never changes results. */
  def dropTempViews(spark: SparkSession): Unit =
    try spark.catalog.listTables("default").collect()
      .filter(_.isTemporary)
      .foreach(t => try spark.catalog.dropTempView(t.name) catch {
        case _: Throwable => ()
      })
    catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (codegen, parquet footer reads, page cache)
    // so the first timed query per table isn't charged the one-off JVM
    // and IO setup — measured ~4-5s on the first documents touch
    Seq("lineitem", "orders", "documents", "embeddings", "events")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    // optional subset for local profiling: SPARK_GRAFT_QUERIES=a,b,c
    val wanted = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').toSet)
    val selected = wanted match {
      case Some(ws) => SparkEntry.queries.filter(q => ws(q._1))
      case None => SparkEntry.queries
    }
    // JIT/codegen warm-up: run every selected query once against the
    // smallest scale factor before timing. Spark caches compiled
    // generated classes by source text, and the generated code depends
    // on the plan/schema, not the data volume — so a sub-second pass at
    // sf0.001 compiles exactly the classes the timed sf run needs.
    // Without this, each query's first execution is charged 1-10s of
    // Janino compilation (measured: dedup_minhash 12.2s cold vs 1.7s
    // warm floor). Disable with SPARK_GRAFT_WARM=none, or point at a
    // different directory.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM", {
      val p = java.nio.file.Paths.get(sfDir)
      val sib = Option(p.getParent).map(_.resolve("sf0.001")).orNull
      if (sib != null && java.nio.file.Files.isDirectory(sib) &&
          sib.toString != sfDir) sib.toString
      else "none"
    })
    if (warmDir != "none") {
      var warnedWarm = false
      selected.foreach { case (name, fn) =>
        // warm with the same noop action as the timed run: a count()
        // warm-up never compiles the projected columns' codegen
        try {
          fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable =>
          // a streaming query that died mid-warm (after .start(), before
          // drain) keeps its fixed memory-sink name registered; the timed
          // run of the same query would then fail with a confusing
          // "query name already active" far from the root cause — stop
          // leftovers and surface the first swallowed error once
          spark.streams.active.foreach(q => try q.stop() catch {
            case _: Throwable => () })
          if (!warnedWarm) {
            System.err.println(s"[bench] warm-up of $name failed " +
              s"(first such; later ones silent): ${e.getMessage}")
            warnedWarm = true
          }
        }
        spark.catalog.clearCache()
        Bench.dropTempViews(spark)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }
    // build per-query fixtures at the TARGET sf outside the timed
    // window (e.g. join_dpp's partitioned lineitem copy)
    SparkEntry.fixturePrep.foreach { case (name, prep) =>
      if (selected.contains(name))
        try prep(spark, sfDir) catch { case e: Throwable =>
          System.err.println(s"[bench] fixture prep for $name failed: " +
            e.getMessage)
        }
    }
    // committed warm floors (WARM_FLOORS.json, recorded at sf0.1 /
    // 32 threads): when present and the sf matches, every cell is
    // self-adjudicated against its floor so the artifact carries the
    // verdict instead of leaving over-floor cells to be re-litigated
    // by hand (6 cells were, in round 12). SPARK_GRAFT_FLOORS points
    // the same machinery at a different ledger — the 100x-replica
    // sweep (tools/bench_100x.sh) adjudicates against
    // WARM_FLOORS_100X.json this way.
    val floorsFile =
      sys.env.getOrElse("SPARK_GRAFT_FLOORS", "WARM_FLOORS.json")
    val floorsRaw: Map[String, Double] = {
      val p = java.nio.file.Paths.get(floorsFile)
      if (!java.nio.file.Files.exists(p)) Map.empty
      else try {
        val txt = java.nio.file.Files.readString(p)
        val sfOk = """"sf"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt)
          .forall(_.group(1) == sfDir)
        if (!sfOk) Map.empty
        else """"([a-z0-9_]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble)
          .filterNot { case (k, _) => k == "cpus" || k == "sf" }
          .toMap
      } catch { case _: Throwable => Map.empty }
    }
    // the streaming-ambience gauges' committed floors ride the same
    // ledger under reserved keys (update_floors.py min-merges them
    // from the artifact's io_fsync_ms / stream_probe_s); they are NOT
    // query floors
    val ioFsyncFloor = floorsRaw.get("io_fsync_ms").filter(_ > 0)
    val streamProbeFloor = floorsRaw.get("stream_probe_s").filter(_ > 0)
    val floors = floorsRaw - "io_fsync_ms" - "stream_probe_s"
    val streamFixture = Bench.streamProbeFixture(spark)
    val diag = new BenchDiagListener
    spark.sparkContext.addSparkListener(diag)
    val diags = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val cells = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Long, Long, Long, Long)]
    val failedQ = scala.collection.mutable.LinkedHashMap
      .empty[String, String]
    // INTERLEAVED contention gauges: the two anchors (CPU-bound
    // apply_moving_avg, IO-bound sql_q6) re-run as untimed samples
    // every GaugeEvery cells, because burst contention that arrives
    // between two point-in-time anchor readings escapes both (one
    // sweep showed 8 cells at 2-5x with both end-state anchors at
    // <=1.12). A cell's contention is the max of the gauge samples
    // bracketing it in sweep order.
    val anchorName = "apply_moving_avg"
    val ioAnchorName = "sql_q6"
    val gaugeQs = Seq(anchorName, ioAnchorName).flatMap(n =>
      SparkEntry.queries.get(n).flatMap(fn =>
        floors.get(n).filter(_ > 0).map(fl => (fn, fl))))
    val gauges = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    // raw fsync samples (ms) interleaved on the same cadence: the
    // DIRECT gauge for the checkpoint-fsync contention class that the
    // warm parquet-scan gauges cannot feel (VERDICT r16 #1). Stream
    // cells draw their ambient allowance from max(query gauges, fsync
    // gauge / committed io_fsync_ms floor).
    val ioSamples = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val streamSamples =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    def gaugeSample(pos: Int): Unit = if (gaugeQs.nonEmpty) {
      ioSamples += ((pos, Bench.fsyncProbeMs()))
      try streamSamples += ((pos, Bench.streamProbeSec(spark, streamFixture)))
      catch { case _: Throwable => () } // a failed probe is no reading
      // a THROWN gauge is not a contention reading: timing the failure
      // would either fabricate contention (slow failure) or record a
      // near-zero ratio that silently disables ambient normalization
      // (fast failure, e.g. missing fixture) — skip the sample instead
      val samples = gaugeQs.flatMap { case (fn, fl) =>
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case _: Throwable => false }
        if (ok) Some(((System.nanoTime() - t0) / 1e9) / fl) else None
      }
      if (samples.nonEmpty) gauges += ((pos, samples.max))
    }
    val GaugeEvery = 25
    val posOf = scala.collection.mutable.HashMap.empty[String, Int]
    var cellPos = 0
    val results = selected.flatMap { case (name, fn) =>
      if (cellPos % GaugeEvery == 0) gaugeSample(cellPos)
      posOf(name) = cellPos
      cellPos += 1
      diag.snapshot() // drop metrics from setup/the previous cleanup
      val t0 = System.nanoTime()
      // a thrown query must surface as FAILED, never as a plausible
      // near-zero cell (a missing fixture table once read as a set of
      // impossibly fast 5 ms TPC-H cells)
      //
      // materialize through the NOOP SINK, not count(): count() lets
      // Catalyst prune every projected column, so a row-local query
      // (fingerprint, gopher filter, repetition signals) measured a
      // bare scan-count — 0.15 s "compute" that was actually none.
      // The noop sink evaluates every output column and discards it,
      // the standard Spark benchmarking action.
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        true
      } catch {
        case e: Throwable =>
          failedQ(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(160)
          System.err.println(s"[bench] $name FAILED: ${failedQ(name)}")
          false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val (gc, sm, sd, run) = diag.snapshot()
      if (ok) cells(name) = (dt, gc, sm, sd, run)
      // queries that persist intermediates (dedup signatures) must not
      // bleed cached blocks / GC pressure into later measurements;
      // clearCache only drops catalog-cached relations, so release
      // RDD-level blocks (localCheckpoint / persist) explicitly too —
      // and drop the cell's temp views (memory-sink tables) so their
      // row payloads do not pile up across the sweep
      spark.catalog.clearCache()
      Bench.dropTempViews(spark)
      // BLOCKING unpersist: async release lets stale blocks from prior
      // queries linger into the next measurement window — measured as a
      // 3-4x inflation of the banded-join queries late in the sweep
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      if (ok) Some(name -> dt) else None
    }
    gaugeSample(cellPos) // closing sample so every cell is bracketed
    def fmt(v: Double): String = f"$v%.3f"
    // anchor-ratio summary (the gauges above drive per-cell verdicts;
    // these whole-sweep ratios from the anchors' own timed cells stay
    // in the artifact as the headline contention signal)
    def ratioOf(n: String): Double = (for {
      (dt, _, _, _, _) <- cells.get(n)
      fl <- floors.get(n) if fl > 0
    } yield dt / fl).getOrElse(1.0)
    val anchorRatio = ratioOf(anchorName)
    val ioAnchorRatio = ratioOf(ioAnchorName)
    // a cell's contention: worst gauge sample bracketing its slot
    def bracketMax(buf: scala.collection.Seq[(Int, Double)],
        pos: Int): Option[Double] =
      if (buf.isEmpty) None
      else {
        val before = buf.takeWhile(_._1 <= pos).lastOption.map(_._2)
        val after = buf.find(_._1 > pos).map(_._2)
        Some((before.toSeq ++ after.toSeq).max)
      }
    def contentionAt(pos: Int): Double =
      bracketMax(gauges, pos)
        .getOrElse(math.max(anchorRatio, ioAnchorRatio))
    // streaming-ambience contention bracketing a slot: the WORSE of
    // the fsync probe and the micro-batch round-trip probe, each as a
    // ratio over its committed floor (None until a floor is minted)
    def ioContentionAt(pos: Int): Option[Double] = {
      val fs = ioFsyncFloor.flatMap(fl =>
        bracketMax(ioSamples, pos).map(_ / fl))
      val sp = streamProbeFloor.flatMap(fl =>
        bracketMax(streamSamples, pos).map(_ / fl))
      (fs.toSeq ++ sp.toSeq).maxOption
    }
    // per-cell verdict against the committed floor:
    //   ok        within the gate: 2x floor, OR within the sub-second
    //             variance band (dt - floor <= min(0.5 s, 2x floor)) —
    //             round-scheduling noise at local[32] is additive
    //             ~hundreds of ms regardless of query size, so a
    //             0.232 s min-merged floor read at 0.5 s is the same
    //             wall-noise that 2x absorbs for bigger cells
    //             (reduce2_outer re-litigated this exact shape in
    //             r12-r14; the band is the pinned policy fix). The band
    //             is CAPPED at 2x the floor so tiny-floor cells keep a
    //             real gate: an unconditional 0.5 s band would pass a
    //             0.05 s floor at 0.55 s — an 11x regression rendered
    //             invisible, including in solo replays and the 100x
    //             ledger which reuse this gate (ADVICE r15)
    //   ambient   over the gate raw, within it after normalization by
    //             the cell's BRACKETING gauge samples — ONLY when those
    //             gauges show contention (>1.5) and never for the
    //             anchor queries themselves (they cannot
    //             self-normalize: a regressed anchor would mark
    //             itself and every other cell ambient)
    //   idle_wall over the gate but the executors were idle most of the
    //             wall with zero gc/spill — scheduler/IO ambience, not
    //             the query's compute (the shape re-adjudicated by hand
    //             in r12; now recorded in the artifact)
    //   over      genuinely above the gate — a real regression
    //   new       no committed floor yet
    def withinGate(dt: Double, fl: Double): Boolean =
      Bench.withinGate(dt, fl)
    def verdict(name: String): (String, Double) = {
      val (dt, gc, sm, sd, run) = cells(name)
      floors.get(name) match {
        case None => ("new", -1.0)
        case Some(fl) if fl <= 0 => ("new", -1.0)
        case Some(fl) =>
          val ratio = dt / fl
          val pos = posOf.getOrElse(name, 0)
          // stream cells additionally draw on the fsync gauge — their
          // contention class is checkpoint-commit sync latency, which
          // the query gauges (warm page-cache scans) cannot feel
          val amb =
            if (Bench.isStreamCell(name))
              math.max(contentionAt(pos),
                ioContentionAt(pos).getOrElse(1.0))
            else contentionAt(pos)
          val v =
            if (withinGate(dt, fl)) "ok"
            else if (amb > 1.5 && name != anchorName &&
              name != ioAnchorName && ratio / amb <= 2.0) "ambient"
            else if (run / 1000.0 < 0.5 * dt && gc < 200 &&
              sm == 0L && sd == 0L) "idle_wall"
            else "over"
          (v, ratio)
      }
    }
    // SOLO REPLAY of every non-ok cell (over, ambient, idle_wall):
    // burst contention that slips between two gauge samples can mark a
    // healthy cell `over` (the round-13 artifact committed 9 such
    // cells; every one re-ran at floor by hand), and an `ambient` or
    // `idle_wall` excuse is exactly the cell a skeptical reader
    // questions (6 such in r14, all re-run at floor by hand). Re-probe
    // each at sweep end on the now-quiet session — up to two attempts,
    // best wins — and record the replay in the artifact so EVERY
    // non-ok verdict is adjudicated in-file instead of re-litigated.
    val replays = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // quietest fsync ratio observed across a stream cell's replay
    // attempts: if even THAT is degraded (>1.5x the committed floor),
    // a still-over replay is io-ambience, not a regression — recorded
    // in the artifact so the excuse is self-adjudicating (VERDICT r16
    // #1: the four fsync-bound cells could not self-clear)
    val replayIo = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    cells.keys.filter(n => verdict(n)._1 match {
      case "over" | "ambient" | "idle_wall" => true
      case _ => false
    }).foreach { n =>
      val fl = floors(n)
      var best = Double.MaxValue
      var attempt = 0
      while (attempt < 2 && !withinGate(best, fl)) {
        if (Bench.isStreamCell(n)) {
          // worse-of-both at THIS attempt; min across attempts below
          val fs = ioFsyncFloor.map(Bench.fsyncProbeMs() / _)
          val sp = streamProbeFloor.flatMap { sfl =>
            try Some(Bench.streamProbeSec(spark, streamFixture) / sfl)
            catch { case _: Throwable => None }
          }
          (fs.toSeq ++ sp.toSeq).maxOption.foreach { r =>
            replayIo(n) =
              math.min(replayIo.getOrElse(n, Double.MaxValue), r)
          }
        }
        val t0 = System.nanoTime()
        try {
          selected(n)(spark, sfDir).write.format("noop")
            .mode("overwrite").save()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => attempt = 2 }
        spark.catalog.clearCache()
        Bench.dropTempViews(spark)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        attempt += 1
      }
      if (best < Double.MaxValue) replays(n) = best / fl
    }
    // final verdict: `replay_ok` when the solo re-probe lands within
    // the gate (the in-sweep reading was ambient noise); `io_ambient`
    // when a stream cell's replay still misses the gate but every
    // replay attempt ran under degraded fsync latency with IO-wait-
    // shaped diagnostics (zero gc pressure, zero spill); `over` only
    // when the regression reproduces solo on healthy IO
    def finalVerdict(name: String): String = replays.get(name) match {
      case Some(r) if withinGate(r * floors(name), floors(name)) =>
        "replay_ok"
      case Some(_) =>
        val (_, gc, sm, sd, _) = cells(name)
        if (Bench.ioAmbientExcuse(Bench.isStreamCell(name),
            replayIo.get(name), gc, sm, sd)) "io_ambient"
        else "over"
      case None => verdict(name)._1
    }
    cells.foreach { case (name, (_, gc, sm, sd, run)) =>
      val (_, ratio) = verdict(name)
      val v = finalVerdict(name)
      val fr = if (ratio < 0) "" else
        s""","floor":${fmt(floors(name))},"ratio":${fmt(ratio)}"""
      val rp = replays.get(name)
        .map(r => s""","replay_ratio":${fmt(r)}""").getOrElse("")
      val rio = replayIo.get(name)
        .map(r => s""","replay_io_ratio":${fmt(r)}""").getOrElse("")
      diags(name) = s"""{"gc_ms":$gc,"spill_mem":$sm,"spill_disk":$sd,""" +
        s""""run_ms":$run$fr$rp$rio,"verdict":"$v"}"""
    }
    val overCells = cells.keys.filter(n => finalVerdict(n) == "over").toSeq
    // whole-sweep ledger-ambient ratio: measured wall over the summed
    // min-merged floors of every cell that HAS a floor. Two committed
    // rounds (r14 1.35x, r15 1.86x with quiet-host replays at floor)
    // showed entire sweeps ride above the ledger when the host is
    // busy — this ratio, printed next to the anchors, is the expected
    // host-ambient band (BASELINE.md "Host-ambient band") so a future
    // sweep at 1.5-2x with clean per-cell verdicts reads as ambience,
    // not regression; per-cell adjudication stays authoritative
    val flooredCells = cells.keys.filter(floors.contains).toSeq
    val ledgerJson = if (flooredCells.isEmpty) "" else {
      val floorTotal = flooredCells.map(floors(_)).sum
      val measTotal = flooredCells.map(cells(_)._1).sum
      s""","ledger_ambient":{"floor_total":${fmt(floorTotal)}""" +
        s""","measured_total":${fmt(measTotal)}""" +
        s""","ratio":${fmt(measTotal / floorTotal)}}"""
    }
    val anchorJson = ledgerJson +
      cells.get(anchorName).map { case (dt, _, _, _, _) =>
      s""","anchor":{"query":"$anchorName","sec":${fmt(dt)}""" +
        floors.get(anchorName).map(fl =>
          s""","floor":${fmt(fl)},"ratio":${fmt(anchorRatio)}""")
          .getOrElse("") + "}"
    }.getOrElse("") +
      cells.get(ioAnchorName).map { case (dt, _, _, _, _) =>
        s""","anchor_io":{"query":"$ioAnchorName","sec":${fmt(dt)}""" +
          floors.get(ioAnchorName).map(fl =>
            s""","floor":${fmt(fl)},"ratio":${fmt(ioAnchorRatio)}""")
            .getOrElse("") + "}"
      }.getOrElse("")
    val overJson = s""","over_cells":${overCells
      .map("\"" + _ + "\"").mkString("[", ",", "]")}""" +
      (if (failedQ.isEmpty) "" else s""","failed":${failedQ
        .map { case (k, m) =>
          // the project's single JSON escaper — control chars in
          // exception messages must not break the artifact's json.load
          graft.render.ResponseWriter.jsonQuote(k) + ":" +
            graft.render.ResponseWriter.jsonQuote(m) }
        .mkString("{", ",", "}")}""")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // the full per-query map goes to a FILE: the driver keeps only the
    // last ~2KB of stdout, and 110+ queries in one line overflow that
    // window (round 6's artifact had parsed:null for exactly this
    // reason). The stdout line stays under the window by carrying only
    // the slowest queries plus a pointer to the committed full map.
    val dg = diags.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val gaugeJson = (if (gauges.isEmpty) "" else
      s""","gauges":${gauges.map { case (p, r) => s"[$p,${fmt(r)}]" }
        .mkString("[", ",", "]")}""") +
      // the raw fsync samples (ms), this sweep's quietest reading (what
      // update_floors.py min-merges into the ledger's io_fsync_ms key),
      // and the committed floor they were judged against — so every
      // io_ambient verdict adjudicates entirely in-file
      (if (ioSamples.isEmpty) "" else
        s""","io_gauges":${ioSamples.map { case (p, ms) =>
          s"[$p,${fmt(ms)}]" }.mkString("[", ",", "]")}""" +
          s""","io_fsync_ms":${fmt(ioSamples.map(_._2).min)}""") +
      ioFsyncFloor.map(f => s""","io_fsync_floor":${fmt(f)}""")
        .getOrElse("") +
      (if (streamSamples.isEmpty) "" else
        s""","stream_gauges":${streamSamples.map { case (p, sec) =>
          s"[$p,${fmt(sec)}]" }.mkString("[", ",", "]")}""" +
          s""","stream_probe_s":${fmt(streamSamples.map(_._2).min)}""") +
      streamProbeFloor.map(f => s""","stream_probe_floor":${fmt(f)}""")
        .getOrElse("")
    val outFull =
      sys.env.getOrElse("SPARK_GRAFT_OUT_FULL", "BENCH_FULL.json")
    val outSummary =
      sys.env.getOrElse("SPARK_GRAFT_OUT_SUMMARY", "BENCH_SUMMARY.json")
    val fullJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"diag":$dg$anchorJson$overJson$gaugeJson,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFull), fullJson + "\n")
    // The stdout contract line carries the FULL per-query map (all
    // cells, not a top-12 slice): the driver parses this single line
    // for per-query regression detection, and a truncated map left
    // PERF per_query/scaling empty in every round through r18
    // (VERDICT r18 #1). It is printed ONCE, to stdout only, raw
    // (build.sbt routes the forked JVM's streams unprefixed).
    val summary =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"nq":${results.size}$anchorJson$overJson,"queries_file":"$outFull","sf":"$sfDir"}"""
    // the summary ALSO goes to a fixed artifact file: the driver's
    // tail-parse of stdout can miss the line behind sbt's [success]
    // footer (r10's BENCH artifact had parsed:null for exactly this),
    // while a file read cannot
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outSummary), summary + "\n")
    // stop the session BEFORE printing, then emit the contract line as
    // the very last output: sbt's [success] footer and Spark's
    // shutdown chatter otherwise land after the JSON line and can
    // push it out of the driver's stdout tail window (the recurring
    // parsed:null in BENCH_r*.json). stdout ONLY — the old stderr
    // echo made the line appear twice in merged captures, which was
    // one of the three reasons the driver never parsed it.
    spark.stop()
    println(summary)
  }
}
