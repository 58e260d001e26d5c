package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling aid: cold vs warm cost of one `SparkEntry` query in
  * a single session — separates one-time codegen/JIT compilation from
  * the steady-state cost that matters at scale. Uses the same
  * count()-materialization and SPARK_GRAFT_CPUS sizing as Bench so
  * its numbers are directly comparable to the recorded floors.
  * Usage: runMain graft.tools.WarmProbe <query> <sfDir> */
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
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      dt
    }
    println(f"[warmprobe] cold=${run()}%.2f warm=${run()}%.2f warm2=${run()}%.2f")
    spark.stop()
  }
}
