package graft.sources

import graft.SparkSpec
import graft.core.{Catalog, JobStatus}
import graft.workflow.{Engine, Workflow}
import org.apache.spark.sql.functions._

/**
 * NetCDF-3 classic reader/writer + the `netcdf3` DataSource V2:
 * header/slab round-trips, relational grid view with coordinate
 * variables, column pruning down to slab reads, and the engine's
 * importnc/exportnc paths over REAL .nc files.
 */
class NetCDFSpec extends SparkSpec {

  private def tmpNc(prefix: String): String = {
    val f = java.io.File.createTempFile(prefix, ".nc")
    f.delete(); f.getPath
  }

  /** 2x3 grid: time(2) x level(3), coordinate vars for both axes,
    * measures tas (t*10+l) and pr (t+l/10). */
  private def writeGrid(path: String): Unit = {
    import NetCDF3._
    write(path,
      dims = Seq(Dim("time", 2), Dim("level", 3)),
      vars = Seq(
        ("time", Seq(0), Array(100.0, 200.0)),
        ("level", Seq(1), Array(1000.0, 850.0, 500.0)),
        ("tas", Seq(0, 1), Array(11.0, 12.0, 13.0, 21.0, 22.0, 23.0)),
        ("pr", Seq(0, 1), Array(1.1, 1.2, 1.3, 2.1, 2.2, 2.3))),
      gatts = Seq("title" -> "graft test grid"))
  }

  test("header round-trip: dims, vars, offsets, attributes") {
    val path = tmpNc("grid")
    writeGrid(path)
    val h = NetCDF3.readHeader(path)
    assert(h.version == 1)
    assert(h.dims == Seq(NetCDF3.Dim("time", 2), NetCDF3.Dim("level", 3)))
    assert(h.vars.map(_.name) == Seq("time", "level", "tas", "pr"))
    assert(h.gatts.exists(a => a.name == "title" &&
      a.text == "graft test grid"))
    val tas = h.varByName("tas")
    assert(h.shapeOf(tas) == Seq(2, 3))
    // slab read: middle cells only
    assert(NetCDF3.readSlab(path, h, tas, 2, 3).toSeq ==
      Seq(13.0, 21.0, 22.0))
  }

  test("DSv2 reads the relational grid with coordinate values") {
    val path = tmpNc("grid")
    writeGrid(path)
    val df = spark.read.format("netcdf3").load(path)
    assert(df.columns.toSeq == Seq("time", "level", "tas", "pr"))
    val rows = df.orderBy("time", "level").collect()
    assert(rows.length == 6)
    // coordinate values come from the coordinate variables
    assert(rows.map(_.getDouble(0)).toSet == Set(100.0, 200.0))
    assert(rows.map(_.getDouble(1)).toSet == Set(1000.0, 850.0, 500.0))
    // cell alignment: tas(time=200, level=850) = 22
    val cell = rows.find(r => r.getDouble(0) == 200.0 &&
      r.getDouble(1) == 850.0).get
    assert(cell.getDouble(2) == 22.0 && cell.getDouble(3) == 2.2)
  }

  test("column pruning reaches the scan (unprojected slabs unread)") {
    val path = tmpNc("grid")
    writeGrid(path)
    val df = spark.read.format("netcdf3").load(path).select("tas")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("netcdf3") && scan.contains("[tas]"),
      s"pruned scan description missing:\n$scan")
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(11.0, 12.0, 13.0, 21.0, 22.0, 23.0))
    // count(*) still answers from a single cheap column
    assert(spark.read.format("netcdf3").load(path).count() == 6)
  }

  test("a file without coordinate vars yields 1-based indices") {
    val path = tmpNc("noidx")
    NetCDF3.write(path,
      dims = Seq(NetCDF3.Dim("x", 2), NetCDF3.Dim("y", 2)),
      vars = Seq(("m", Seq(0, 1), Array(1.0, 2.0, 3.0, 4.0))))
    val rows = spark.read.format("netcdf3").load(path)
      .orderBy("x", "y").collect()
    assert(rows.map(r => (r.getDouble(0), r.getDouble(1))).toSeq ==
      Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0)))
  }

  test("engine importnc reads a real .nc into a cube end-to-end") {
    val path = tmpNc("grid")
    writeGrid(path)
    val e = new Engine(spark, new Catalog("sess"))
    val res = e.run(Workflow.parse(s"""{
      "name": "wf", "tasks": [
        {"name": "imp", "operator": "oph_importnc",
         "arguments": ["src_path=$path", "measure=tas",
           "exp_dim=time", "imp_dim=level", "container=nc"]},
        {"name": "red", "operator": "oph_reduce",
         "arguments": ["operation=avg"],
         "dependencies": [{"task": "imp", "type": "single"}]}
      ]}"""))
    assert(res("red").status == JobStatus.Completed)
    val out = e.cube(res("red").cubePid.get).get
    val avgs = out.df.orderBy("time").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(avgs == Seq((100.0, 12.0), (200.0, 22.0)))
  }

  test("engine exportnc writes a readable .nc the source can re-read") {
    val e = new Engine(spark, new Catalog("sess"))
    val mk = e.runDataOperator("oph_randcube",
      Map("nrows" -> "10", "array_length" -> "4", "container" -> "c"))
    val out = tmpNc("export")
    val r = e.runDataOperator("oph_exportnc",
      Map("cube" -> mk.cubePid.get, "output_path" -> out))
    assert(r.status == JobStatus.Completed)
    val back = spark.read.format("netcdf3").load(out)
    assert(back.count() == 40) // 10 rows x 4 cells flattened
    assert(back.columns.contains("measure"))
    // round-trip values: the export equals the flattened cube
    val orig = e.cube(mk.cubePid.get).get.flatten
      .agg(sum(col("measure"))).head.getDouble(0)
    val readBack = back.agg(sum(col("measure"))).head.getDouble(0)
    assert(math.abs(orig - readBack) < 1e-9)
  }
}
