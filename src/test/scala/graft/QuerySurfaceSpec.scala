package graft

/**
 * The driver's correctness gate runs once per round; this spec keeps
 * the same surface honest INSIDE `sbt test`: every `SparkEntry.queries`
 * entry must build and materialize at sf0.001, and every oracle key
 * must point at a real query. Values are the oracle's job — this pins
 * "it runs at all", which otherwise only breaks at round end.
 */
class QuerySurfaceSpec extends SparkSpec {

  test("every oracle key names an implemented query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query materializes at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, dir).count()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      } catch {
        case e: Throwable =>
          failures += name -> e.toString.linesIterator.next()
      }
    }
    assert(failures.isEmpty,
      failures.map { case (n, e) => s"$n: $e" }.mkString("\n"))
  }

  test("the driver's flagship entry answers with rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
