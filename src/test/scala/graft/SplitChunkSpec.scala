package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the split-staging micro-batch count rule (r18): chunks derive
 * from INPUT SIZE, never from core count. The first cut keyed on
 * defaultParallelism/4, which quadrupled the anomaly cells' per-batch
 * checkpoint overhead at sf0.1 on local[32] while changing nothing
 * the 100x replica cared about — a constant tuned for one scale is
 * the exact failure mode the optimization guide's scale-adaptive rule
 * exists to prevent.
 */
class SplitChunkSpec extends AnyFunSuite {

  test("~16 MB of source parquet per ts-contiguous chunk, clamped [2,8]") {
    // sf0.1 events (~2 MB): the floors' 2-batch shape
    assert(SparkEntry.splitChunkCount(2L << 20) === 2)
    // just under/over one chunk boundary
    assert(SparkEntry.splitChunkCount((16L << 20) - 1) === 2)
    assert(SparkEntry.splitChunkCount(48L << 20) === 3)
    // the 100x replica (112,584,468 bytes): 6 parallel-staged batches
    assert(SparkEntry.splitChunkCount(112584468L) === 6)
    // unbounded inputs: fsync bill capped at 8 batches
    assert(SparkEntry.splitChunkCount(10L << 30) === 8)
    assert(SparkEntry.splitChunkCount(0L) === 2)
  }

  test("session_window state partitions: ~2 MB each, clamped [8,32]") {
    // sf0.1 events (~2 MB): the committed floor's commit-bound shape
    assert(SparkEntry.sessionWindowParts(2L << 20) === 8)
    // the 100x replica (112,584,468 bytes): the A/B's winning grid arm
    assert(SparkEntry.sessionWindowParts(112584468L) === 32)
    assert(SparkEntry.sessionWindowParts(40L << 20) === 20)
    // checkpoint-commit bill stays bounded at any scale
    assert(SparkEntry.sessionWindowParts(10L << 30) === 32)
  }
}
