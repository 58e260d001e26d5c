package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling aid: cold vs warm cost of one `SparkEntry` query in
  * a single session — separates one-time codegen/JIT compilation from
  * the steady-state cost that matters at scale.
  * Usage: runMain graft.tools.WarmProbe <query> <sfDir> */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[warmprobe] cold=${run()}%.2f warm=${run()}%.2f warm2=${run()}%.2f")
    spark.stop()
  }
}
