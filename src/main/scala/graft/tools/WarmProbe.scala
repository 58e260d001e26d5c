package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling aid: cold vs warm cost of one `SparkEntry` query in
  * a single session — separates one-time codegen/JIT compilation from
  * the steady-state cost that matters at scale. Uses the same
  * NOOP-SINK materialization and SPARK_GRAFT_CPUS sizing as Bench so
  * its numbers are directly comparable to the recorded floors —
  * count() would let Catalyst prune every projected column and a
  * future `--all` would silently write pruned-scan floors back into
  * WARM_FLOORS.json, turning every projection-heavy bench cell into a
  * phantom regression.
  * Usage: runMain graft.tools.WarmProbe <query> <sfDir>
  *    or: runMain graft.tools.WarmProbe --all <sfDir>
  * `--all` sweeps the ENTIRE suite twice in one session and prints a
  * JSON warm-floor map (min of the two in-session runs per query) —
  * the full-suite ledger the round-6 verdict asked for. */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same setup Bench pays outside the timed window: per-query
    // fixtures (e.g. join_dpp's partitioned copy) must not be priced
    // into a floor the bench cell is later held to
    graft.SparkEntry.fixturePrep.foreach { case (q, prep) =>
      if (name == "--all" || name == q)
        try prep(spark, dir) catch { case e: Throwable =>
          System.err.println(s"[warmprobe] fixture prep $q failed: " +
            e.getMessage)
        }
    }
    def run(q: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // BLOCKING, like Bench: async release lets stale blocks from a
      // prior query linger into the next measurement window
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      dt
    }
    if (name == "--all") {
      val qs = graft.SparkEntry.queries.keys.toSeq.sorted
      def sweep(): Map[String, Double] = qs.map(q => q -> run(q)).toMap
      val s1 = sweep(); val s2 = sweep()
      val floors = qs.map(q => s"\"" + q + "\":" +
        f"${math.min(s1(q), s2(q))}%.3f").mkString("{", ",", "}")
      val out = s"""{"warm_floors":$floors,"sf":"$dir","cpus":$cpus}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("WARM_FLOORS.json"), out + "\n")
      println(out)
    } else
      println(f"[warmprobe] cold=${run(name)}%.2f " +
        f"warm=${run(name)}%.2f warm2=${run(name)}%.2f")
    spark.stop()
  }
}
