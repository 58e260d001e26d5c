package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the fsync-gauge policy (VERDICT r16 #1): which cells may draw
  * on the IO gauge, and exactly when a still-over replay is excused as
  * io_ambient instead of over. */
class BenchIoGateSpec extends AnyFunSuite {

  test("stream-class detection covers the checkpoint-committing family") {
    for (n <- Seq("events_stream_join", "events_stream_anomaly_evict",
        "corpus_stream_ingest", "dedup_incremental_near_stream"))
      assert(Bench.isStreamCell(n), n)
    for (n <- Seq("sql_q6", "dedup_minhash", "apply_moving_avg",
        "workflow_flow", "simsearch_ivfpq",
        // token-match, not substring (ADVICE r17): names merely
        // CONTAINING "stream" must not inherit the io_ambient gate
        "upstream_join", "streamline_x", "downstream_agg"))
      assert(!Bench.isStreamCell(n), n)
  }

  test("io_ambient excuse requires ALL of: stream cell, degraded fsync " +
      "at replay time, io-wait-shaped diagnostics") {
    // the excusable shape: stream cell, fsync 2.8x floor, clean diag
    assert(Bench.ioAmbientExcuse(isStream = true, Some(2.8), 0L, 0L, 0L))
    // non-stream cells never draw the excuse (simsearch_ivfpq's r17
    // over must not hide behind the io gauge)
    assert(!Bench.ioAmbientExcuse(isStream = false, Some(2.8), 0L, 0L, 0L))
    // quiet fsync at replay time -> the regression is real
    assert(!Bench.ioAmbientExcuse(isStream = true, Some(1.2), 0L, 0L, 0L))
    // no committed io floor yet -> no excuse (None, not a default)
    assert(!Bench.ioAmbientExcuse(isStream = true, None, 0L, 0L, 0L))
    // gc pressure or spill means the cell itself is implicated
    assert(!Bench.ioAmbientExcuse(isStream = true, Some(2.8), 500L, 0L, 0L))
    assert(!Bench.ioAmbientExcuse(isStream = true, Some(2.8), 0L, 1L, 0L))
    assert(!Bench.ioAmbientExcuse(isStream = true, Some(2.8), 0L, 0L, 1L))
    // the threshold is strictly >1.5, matching the ambient gauge gate
    assert(!Bench.ioAmbientExcuse(isStream = true, Some(1.5), 0L, 0L, 0L))
  }

  test("fsyncProbeMs returns a sane positive latency") {
    val ms = Bench.fsyncProbeMs()
    assert(ms > 0.0 && ms < 10000.0, s"fsync probe read $ms ms")
    // probe files must not accumulate
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"))
    val leftovers = java.nio.file.Files.list(tmp).iterator()
    var count = 0
    while (leftovers.hasNext) {
      if (leftovers.next().getFileName.toString.startsWith("graft_fsync"))
        count += 1
    }
    assert(count == 0, s"$count probe files leaked")
  }
}
