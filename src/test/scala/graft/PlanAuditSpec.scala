package graft

import org.apache.spark.sql.functions._

/**
 * Scale-shape plan audits for the round-4 paths: these assert the
 * PHYSICAL PLAN properties that make the operators viable at 100 TB,
 * so a regression that re-introduces a shuffle or un-prunes a scan
 * fails CI, not a production run.
 */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("multimodal imageStats is shuffle-free partition-local decode") {
    val media = graft.pipeline.Multimodal.syntheticPngMedia(spark, 32)
    val p = plan(graft.pipeline.Multimodal.imageStats(media))
    assert(!p.contains("Exchange"),
      s"decode must stay partition-local, got:\n$p")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      s"expected the typed mapPartitions pipeline, got:\n$p")
  }

  test("exportnc's encodable projection prunes the parquet scan") {
    val cube = graft.cube.CubeOps.importParquet(spark,
      sf("lineitem"), "l_quantity", Seq("l_orderkey", "l_linenumber"))
    val dfEnc = cube.flatten.select(
      col("l_orderkey").cast("double"), col("l_quantity").cast("double"))
    val p = plan(dfEnc)
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_quantity"),
      s"scan must read the projected columns, got: $readSchema")
    assert(!readSchema.contains("l_extendedprice") &&
      !readSchema.contains("l_comment"),
      s"scan must NOT read unprojected columns, got: $readSchema")
    assert(!p.contains("Exchange"),
      "a straight projection export must not shuffle")
  }

  test("explorenc show_stats is one distributed aggregation") {
    val raw = spark.read.parquet(sf("lineitem"))
    val m = col("l_quantity").cast("double")
    val agg = raw.agg(avg(m).as("mean"), stddev_samp(m).as("std"),
      max(m).as("max"))
    val p = plan(agg)
    // partial + final hash aggregate around ONE exchange — the
    // map-side-combine shape
    assert("Exchange".r.findAllIn(p).size == 1,
      s"stats must be one partial-agg exchange, got:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
  }

  test("the netcdf3 scan lists only projected variables") {
    val path = {
      val f = java.io.File.createTempFile("plan_nc", ".nc")
      f.delete()
      graft.sources.NetCDF3.write(f.getPath,
        dims = Seq(graft.sources.NetCDF3.Dim("t", 4)),
        vars = Seq(
          ("t", Seq(0), Array(1.0, 2.0, 3.0, 4.0)),
          ("a", Seq(0), Array(1.0, 2.0, 3.0, 4.0)),
          ("b", Seq(0), Array(9.0, 9.0, 9.0, 9.0))))
      f.getPath
    }
    val df = spark.read.format("netcdf3").load(path).select("a")
    val p = plan(df)
    // the scan's column list must carry the projected variable (as a
    // column reference `a#<id>`) and NOT the unprojected one
    val scanLine = p.linesIterator
      .find(l => l.contains("BatchScan") || l.contains("Scan")).getOrElse("")
    assert(scanLine.matches(".*\\ba#\\d+.*"),
      s"projected variable must survive in the scan: $scanLine")
    assert(!scanLine.matches(".*\\bb#\\d+.*"),
      s"unprojected variable must be pruned from the scan: $scanLine")
  }
}
