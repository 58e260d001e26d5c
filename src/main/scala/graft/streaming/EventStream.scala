package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface. The reference has no streaming engine —
 * its closest constructs are `oph_wait type=file` (file-arrival
 * triggers, `/root/reference/src/oph_flow_control_operators.c:144-360`)
 * and `oph_for` ingestion loops over `src_path` expansions
 * (`src/oph_workflow_engine.c:964-1000`). Those map directly onto a
 * file-source stream: new files under a directory become new rows, and
 * windowed aggregations replace per-file DAG re-entry.
 *
 * Scale notes: watermark + windowed agg is a streaming shuffle with
 * state store; `maxFilesPerTrigger` bounds batch size so a 100 TB
 * backfill drains incrementally instead of as one giant batch.
 */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of parquet drops — the
    * `oph_wait type=file` analog: processing continues as files land. */
  def fileStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 8): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Tumbling-window counts+sums per event type with a watermark —
    * the streaming equivalent of the batch events_hourly query. */
  def hourlyAggregates(events: DataFrame, watermark: String = "2 hours",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sv"))

  /** Per-user session state for mapGroupsWithState: gap-based session
    * assembly (the stateful analog of the batch events_sessions query). */
  final case class SessionState(sessionCount: Long, lastTsMillis: Long)
  final case class SessionUpdate(userId: Long, sessions: Long)

  /** Custom state machine: count gap-separated sessions per user via
    * `mapGroupsWithState` — arbitrary stateful processing on
    * KeyValueGroupedDataset, the Spark-native replacement for the
    * reference's server-side wait/notify bookkeeping. */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMillis: Long = 30 * 60 * 1000L): DataFrame = {
    import spark.implicits._
    val typed = events.select(col("user_id").as[Long](org.apache.spark.sql.Encoders.scalaLong),
      unix_millis(col("ts")).as[Long](org.apache.spark.sql.Encoders.scalaLong))
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[SessionState]) =>
          val sortedTs = rows.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          sortedTs.foreach { t =>
            if (st.lastTsMillis == Long.MinValue || t - st.lastTsMillis > gapMillis)
              st = SessionState(st.sessionCount + 1, t)
            // max: a cross-batch late event inside the gap must not
            // rewind the session clock (in-batch rows are sorted)
            else st = st.copy(lastTsMillis = math.max(st.lastTsMillis, t))
          }
          state.update(st)
          SessionUpdate(user, st.sessionCount)
      }.toDF("userId", "sessions")
  }

  final case class SessionFinal(userId: Long, sessions: Long,
      closed: Boolean)

  /** [[sessionize]] with EVENT-TIME STATE EVICTION — the continuous-
    * deployment form. The input must carry a watermark; each user's
    * state registers a timeout at (last event + gap), and when the
    * watermark passes it the state machine emits a terminal
    * `closed = true` row and REMOVES its state. Open-session updates
    * emit with `closed = false` as before. State is therefore bounded
    * by the set of users active within one gap of the watermark —
    * unlike [[sessionize]]'s grow-forever NoTimeout map, which keeps
    * its documented backfill-only contract. After eviction a late
    * event restarts the counter at 1 (by the gap definition it IS a
    * new session); downstream consumers sum the closed counts per
    * user across epochs. One Spark nuance: a group with new data in
    * the very batch its timeout would fire takes the DATA path
    * instead (no timeout invocation), so the event folds into the
    * still-live state and the count simply continues — strictly more
    * continuity, never double-counting. Both shapes are spec-pinned. */
  def sessionizeEvicting(spark: SparkSession, events: DataFrame,
      gapMillis: Long = 30 * 60 * 1000L,
      watermark: String = "10 seconds"): DataFrame = {
    import spark.implicits._
    // the raw `ts` ATTRIBUTE must reach the stateful operator — any
    // expression over it (unix_millis, cast) drops the watermark
    // metadata and EventTimeTimeout then fails analysis
    val typed = events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionFinal](
        GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            SessionFinal(user, st.sessionCount, closed = true)
          } else {
            val sortedTs = rows.map(_._2.getTime).toSeq.sorted
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
            sortedTs.foreach { t =>
              if (st.lastTsMillis == Long.MinValue ||
                  t - st.lastTsMillis > gapMillis)
                st = SessionState(st.sessionCount + 1, t)
              else st = st.copy(lastTsMillis = math.max(st.lastTsMillis, t))
            }
            state.update(st)
            // the timeout must sit past the current watermark or Spark
            // rejects it; a user already older than watermark - gap
            // then evicts on the next micro-batch
            state.setTimeoutTimestamp(math.max(st.lastTsMillis + gapMillis,
              state.getCurrentWatermarkMs() + 1))
            SessionFinal(user, st.sessionCount, closed = false)
          }
      }.toDF("userId", "sessions", "closed")
  }

  /** Open-session state for flatMapGroupsWithState. */
  final case class AnomalyRing(cents: Seq[Long])
  final case class AnomalyRingAt(cents: Seq[Long], lastMs: Long)
  final case class AnomalyHit(userId: Long, eventId: Long,
      value: Double, nWindow: Long)

  final case class SessLogState(start: Long, last: Long, n: Long, idx: Long)
  final case class ClosedSession(userId: Long, sessionIdx: Long,
      nEvents: Long, durationMs: Long)
  final case class ClosedSessionAt(userId: Long, startMs: Long,
      nEvents: Long, durationMs: Long)

  /** flatMapGroupsWithState sessionization that EMITS one row per
    * CLOSED session (index, event count, duration) and keeps the open
    * session in state — the multi-row-per-group stateful shape
    * mapGroupsWithState cannot express (it must return exactly one row
    * per group per batch). Append output: a session row is emitted
    * exactly once, in the batch whose events closed it; the trailing
    * open session stays in state and never emits, which is what the
    * oracle checks (each user's last session is absent).
    *
    * Cross-batch contract: sessions close on the arrival order of
    * batches (the file-drop replay shape). A late event landing INSIDE
    * the open session's gap folds in without rewinding the session
    * clock (last = max); one landing after a session already closed
    * starts a new session — re-opening emitted rows is impossible in
    * append mode, which is the standard log-structured-assembler
    * trade-off.
    *
    * Per-group memory bound: each invocation materializes and sorts
    * ONE user's events of ONE micro-batch (`rows.toArray.sorted`), so
    * memory is bounded by the hottest key's per-batch row count —
    * bound batch size (`maxFilesPerTrigger`) accordingly. A
    * continuous deployment should prefer [[sessionLogEvicting]],
    * which also bounds the state store via event-time eviction. */
  def sessionLog(spark: SparkSession, events: DataFrame,
      gapMillis: Long = 30 * 60 * 1000L): DataFrame = {
    import spark.implicits._
    val typed = events
      .select(col("user_id").as[Long](org.apache.spark.sql.Encoders.scalaLong),
        unix_millis(col("ts")).as[Long](org.apache.spark.sql.Encoders.scalaLong))
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessLogState, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[SessLogState]) =>
          val ts = rows.map(_._2).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          var st = state.getOption.orNull
          ts.foreach { t =>
            if (st == null) st = SessLogState(t, t, 1, 0)
            else if (t - st.last > gapMillis) {
              out += ClosedSession(user, st.idx, st.n, st.last - st.start)
              st = SessLogState(t, t, 1, st.idx + 1)
            } else st = SessLogState(st.start, math.max(st.last, t),
              st.n + 1, st.idx)
          }
          if (st != null) state.update(st)
          out.iterator
      }.toDF("user_id", "session_idx", "n_events", "duration_ms")
  }

  /** [[sessionLog]] with EVENT-TIME STATE EVICTION: a trailing open
    * session EMITS (with its start timestamp instead of a per-user
    * index — indexes would reset across evictions, timestamps are
    * stable) and its state is removed once the watermark passes
    * (last event + gap). The input must carry a watermark. With a
    * late flush record advancing the watermark past every open
    * session, the emitted log equals the COMPLETE batch session log
    * — trailing sessions included, which is exactly what the NoTimeout
    * form can never emit; that equality is the oracle-checked eviction
    * proof. State is bounded by users active within one gap of the
    * watermark. */
  def sessionLogEvicting(spark: SparkSession, events: DataFrame,
      gapMillis: Long = 30 * 60 * 1000L,
      watermark: String = "10 seconds"): DataFrame = {
    import spark.implicits._
    // raw `ts` attribute for the watermark metadata, as in
    // [[sessionizeEvicting]]
    val typed = events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessLogState, ClosedSessionAt](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[SessLogState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(
              ClosedSessionAt(user, st.start, st.n, st.last - st.start))
          } else {
            val ts = rows.map(_._2.getTime).toArray.sorted
            val out =
              scala.collection.mutable.ArrayBuffer.empty[ClosedSessionAt]
            var st = state.getOption.orNull
            ts.foreach { t =>
              if (st == null) st = SessLogState(t, t, 1, 0)
              else if (t - st.last > gapMillis) {
                out += ClosedSessionAt(user, st.start, st.n,
                  st.last - st.start)
                st = SessLogState(t, t, 1, st.idx + 1)
              } else st = SessLogState(st.start, math.max(st.last, t),
                st.n + 1, st.idx)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(math.max(st.last + gapMillis,
                state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }.toDF("user_id", "start_ms", "n_events", "duration_ms")
  }

  /** Streaming face of
    * [[graft.operators.TimeSeries.rollingAnomalies]]: the per-key
    * ring of the last `window` cent values lives in
    * flatMapGroupsWithState; each event is judged against the ring
    * BEFORE entering it (history only, like the batch form) with the
    * identical integer-algebra test
    * (n·yc − sy)² > z²·(n·syy − sy²) — so when micro-batches arrive
    * in event-time order (each batch sorted internally here), the
    * emitted flags equal the batch operator's rows EXACTLY, which is
    * what the oracle checks. State per key is `window` longs,
    * constant in stream length. */
  /** HALF_UP cents, matching Spark's `round(value*100, 0)` in the
    * batch operator: away from zero for negatives (a plain
    * math.round is half-toward-+inf and flips -x.xx5 values). */
  private def halfUpCents(v: Double): Long = {
    val m = math.round(math.abs(v) * 100)
    if (v < 0) -m else m
  }

  /** The per-key ring fold SHARED by both streaming anomaly faces
    * (one copy of the algebra that must stay in lockstep with
    * [[graft.operators.TimeSeries.rollingAnomalies]]). Events must
    * arrive sorted; `horizonMs` None = never reset. Returns the hits
    * plus the carried (ring, lastMs). */
  private def anomalyFold(user: Long,
      evs: Array[(Long, Long, java.sql.Timestamp, Double)],
      ring0: Vector[Long], last0: Long, window: Int, z: Int,
      minObs: Int, horizonMs: Option[Long])
      : (Seq[AnomalyHit], Vector[Long], Long) = {
    var ring = ring0
    var last = last0
    val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyHit]
    evs.foreach { case (_, eventId, ts, value) =>
      val tsMs = ts.getTime
      horizonMs.foreach { h =>
        if (last != Long.MinValue && tsMs - last > h)
          ring = Vector.empty
      }
      val yc = halfUpCents(value)
      val n = ring.size.toLong
      if (n >= minObs) {
        var sy = 0L; var syy = 0L
        ring.foreach { y => sy += y; syy += y * y }
        val dev = n * yc - sy
        if (dev * dev > z.toLong * z * (n * syy - sy * sy))
          out += AnomalyHit(user, eventId, value, n)
      }
      ring = (ring :+ yc).takeRight(window)
      last = tsMs
    }
    (out.toSeq, ring, last)
  }

  /** Sort key replaying the batch operator's (ts, event_id) frame
    * order at FULL timestamp precision — getTime alone truncates to
    * milliseconds and sub-millisecond ties would order differently
    * than the batch window sort. */
  private def tsOrder(r: (Long, Long, java.sql.Timestamp, Double)) =
    (r._3.getTime, r._3.getNanos, r._2)

  def anomalyStream(spark: SparkSession, events: DataFrame,
      window: Int = 20, z: Int = 3, minObs: Int = 5): DataFrame = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[AnomalyRing, AnomalyHit](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[AnomalyRing]) =>
          // batch iterators are unordered: sort so in-order drops
          // replay the batch operator's frame exactly
          val evs = rows.toArray.sortBy(tsOrder)
          val ring0 = state.getOption.map(_.cents.toVector)
            .getOrElse(Vector.empty[Long])
          val (out, ring, _) = anomalyFold(user, evs, ring0,
            Long.MinValue, window, z, minObs, None)
          state.update(AnomalyRing(ring))
          out.iterator
      }.toDF("user_id", "event_id", "value", "n_window")
  }

  /** [[anomalyStream]] with EVENT-TIME STATE EVICTION for continuous
    * deployments: the baseline ring RESETS whenever a key goes idle
    * longer than `horizonMs` — a months-old baseline should not judge
    * today's traffic — and the reset lives IN THE FOLD (gap test
    * against the previous event), so it fires identically whether the
    * gap falls inside one micro-batch or across many. The
    * EventTimeTimeout then removes idle keys' state WITHOUT changing
    * any flag: a key returning after the horizon would have reset its
    * ring anyway, so eviction is pure state-size hygiene (bounded by
    * keys active within one horizon of the watermark) — which is
    * exactly why the flags stay batch-replayable: the oracle
    * segments each key's timeline at >horizon gaps and re-runs the
    * same integer-algebra test per segment. The input must carry a
    * watermark-able `ts`. */
  def anomalyStreamEvicting(spark: SparkSession, events: DataFrame,
      window: Int = 20, z: Int = 3, minObs: Int = 5,
      horizonMs: Long = 12 * 3600 * 1000L,
      watermark: String = "10 seconds"): DataFrame = {
    import spark.implicits._
    val typed = events.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[AnomalyRingAt, AnomalyHit](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[AnomalyRingAt]) =>
          if (state.hasTimedOut) {
            // pure hygiene: the fold below would reset this ring on
            // the key's next arrival anyway (gap > horizon)
            state.remove()
            Iterator.empty
          } else {
            val evs = rows.toArray.sortBy(tsOrder)
            val (ring0, last0) = state.getOption
              .map(st => (st.cents.toVector, st.lastMs))
              .getOrElse((Vector.empty[Long], Long.MinValue))
            val (out, ring, last) = anomalyFold(user, evs, ring0,
              last0, window, z, minObs, Some(horizonMs))
            state.update(AnomalyRingAt(ring, last))
            state.setTimeoutTimestamp(math.max(last + horizonMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }.toDF("user_id", "event_id", "value", "n_window")
  }

  /** Streaming exact dedup: emit each key's FIRST arrival, drop every
    * later duplicate — the streaming half of the corpus-dedup story
    * (an ingest pipeline replaying overlapping drops must not double
    * rows). The DEFAULT is the bounded-state production shape:
    * watermark on `ts` + `dropDuplicatesWithinWatermark`, which evicts
    * each key once the watermark passes its event time + delay.
    * `watermarkDelay = None` opts into unbounded `dropDuplicates` —
    * one state entry per key FOREVER, so re-delivery is caught no
    * matter how late; that form's contract is the AvailableNow
    * backfill replay, never a continuous deployment. A BATCH frame
    * always takes plain `dropDuplicates` (watermarks and
    * within-watermark dedup are streaming-only; a batch job holds no
    * state to bound). */
  def dedupEvents(events: DataFrame,
      keys: Seq[String] = Seq("event_id"),
      watermarkDelay: Option[String] = Some("48 hours")): DataFrame =
    watermarkDelay match {
      case Some(delay) if events.isStreaming =>
        events.withWatermark("ts", delay)
          .dropDuplicatesWithinWatermark(keys)
      case _ => events.dropDuplicates(keys)
    }

  /** Stream-stream event-time interval join: each left event joins
    * right events of the same user whose timestamp falls within
    * `windowMillis` BEFORE it. Both sides carry watermarks and the
    * join condition carries the time bound, so the state store evicts
    * rows once they age past watermark + window — the bounded-state
    * 100 TB shape. Inner-join output is deterministic regardless of
    * micro-batch boundaries (each match emits exactly once when both
    * sides have arrived), so an AvailableNow run must equal the batch
    * join — which is what the oracle checks. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      windowMillis: Long, watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r,
      col("l.user_id") === col("r.user_id") &&
        col("r.ts") >= col("l.ts") - expr(s"INTERVAL $windowMillis MILLISECONDS") &&
        col("r.ts") <= col("l.ts"))
  }

  /** Start a console-less memory-sink query for tests/inspection. */
  def startMemorySink(df: DataFrame, name: String,
      outputMode: String = "update"): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
}
