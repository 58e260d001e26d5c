package graft

/** The micro-batch round-trip gauge must be a faithful miniature
  * streaming cell: two one-file micro-batches, fresh checkpoint,
  * memory sink — and repeatable within one session (no temp-view or
  * query-name leakage across samples). */
class BenchStreamProbeSpec extends SparkSpec {

  test("streamProbeSec runs a 2-batch micro-stream and cleans up") {
    val dir = Bench.streamProbeFixture(spark)
    // the fixture is exactly two single-file drops
    val drops = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(drops.length == 2, drops.mkString(","))
    val s1 = Bench.streamProbeSec(spark, dir)
    val s2 = Bench.streamProbeSec(spark, dir)
    assert(s1 > 0.0 && s1 < 600.0, s1.toString)
    assert(s2 > 0.0 && s2 < 600.0, s2.toString)
    // no gauge temp views may survive a sample
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("__gauge_stream_")))
    assert(spark.streams.active.isEmpty)
  }
}
