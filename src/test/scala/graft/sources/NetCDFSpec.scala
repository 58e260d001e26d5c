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
    assert(scan.contains("netcdf") && scan.contains("[tas]"),
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

  /** Record-dim file: time is UNLIMITED (length 0 in the header,
    * extent in numrecs) with a record coordinate var, a fixed level
    * axis, and a record measure — so the record section interleaves
    * TWO record vars per record, exercising the recSize stride. */
  private def writeRecordGrid(path: String, recs: Int,
      base: Double = 0.0): Unit = {
    import NetCDF3._
    write(path,
      dims = Seq(Dim("time", 0), Dim("level", 3)),
      vars = Seq(
        ("time", Seq(0), Array.tabulate(recs)(r => base + 100.0 * (r + 1))),
        ("level", Seq(1), Array(1000.0, 850.0, 500.0)),
        ("tas", Seq(0, 1),
          Array.tabulate(recs * 3)(i => base + (i / 3 + 1) * 10.0 + i % 3 + 1))),
      gatts = Seq("title" -> "record grid"))
  }

  test("record (UNLIMITED) dimension: header, numrecs, interleaved slabs") {
    val path = tmpNc("rec")
    writeRecordGrid(path, recs = 4)
    val h = NetCDF3.readHeader(path)
    assert(h.dims == Seq(NetCDF3.Dim("time", 0), NetCDF3.Dim("level", 3)))
    assert(h.numrecs == 4)
    assert(h.recordDimId.contains(0))
    val tas = h.varByName("tas")
    val time = h.varByName("time")
    assert(h.isRecord(tas) && h.isRecord(time))
    assert(!h.isRecord(h.varByName("level")))
    // resolved shape substitutes numrecs for the record dim
    assert(h.shapeOf(tas) == Seq(4, 3))
    // recSize = one time cell + one 3-cell tas row, both doubles
    assert(h.recSize == 8 + 24)
    // whole-variable read crosses record boundaries (stride recSize)
    assert(NetCDF3.readSlab(path, h, tas, 0, 12).toSeq ==
      (0 until 12).map(i => (i / 3 + 1) * 10.0 + i % 3 + 1))
    // mid-file slab: last cell of record 1 through first of record 3
    assert(NetCDF3.readSlab(path, h, tas, 5, 5).toSeq ==
      Seq(23.0, 31.0, 32.0, 33.0, 41.0))
    // the record coordinate variable reads at the same stride
    assert(NetCDF3.readSlab(path, h, time, 0, 4).toSeq ==
      Seq(100.0, 200.0, 300.0, 400.0))
  }

  test("DSv2 reads a record-dim file; pruning still skips slabs") {
    val path = tmpNc("rec")
    writeRecordGrid(path, recs = 4)
    val df = spark.read.format("netcdf3").load(path)
    assert(df.columns.toSeq == Seq("time", "level", "tas"))
    assert(df.count() == 12)
    val cell = df.filter(col("time") === 300.0 && col("level") === 850.0)
      .select("tas").head.getDouble(0)
    assert(cell == 32.0)
    val pruned = spark.read.format("netcdf3").load(path).select("tas")
    assert(pruned.queryExecution.executedPlan.toString.contains("[tas]"))
    assert(pruned.agg(sum(col("tas"))).head.getDouble(0) ==
      (0 until 12).map(i => (i / 3 + 1) * 10.0 + i % 3 + 1).sum)
  }

  test("engine imports a record-dim .nc and concatnc appends along time") {
    val p1 = tmpNc("rec1"); val p2 = tmpNc("rec2")
    writeRecordGrid(p1, recs = 2)
    // the appended file continues the time axis past the first file
    writeRecordGrid(p2, recs = 2, base = 200.0)
    // time is the IMPLICIT (array) dim — concatnc appends along it,
    // making every level's time series longer (the climate use case)
    val e = new Engine(spark, new Catalog("sess"))
    val res = e.run(Workflow.parse(s"""{
      "name": "wf", "tasks": [
        {"name": "imp", "operator": "oph_importnc",
         "arguments": ["src_path=$p1", "measure=tas",
           "exp_dim=level", "imp_dim=time", "container=nc"]},
        {"name": "cat", "operator": "oph_concatnc",
         "arguments": ["src_path=$p2"],
         "dependencies": [{"task": "imp", "type": "single"}]},
        {"name": "red", "operator": "oph_reduce",
         "arguments": ["operation=avg"],
         "dependencies": [{"task": "cat", "type": "single"}]}
      ]}"""))
    assert(res("red").status == JobStatus.Completed,
      res("red").message)
    val out = e.cube(res("red").cubePid.get).get
    val avgs = out.df.orderBy("level").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    // per level: avg over the 4-record concatenated time series
    // level 1000: (11+21+211+221)/4 etc.
    assert(avgs == Seq((500.0, 118.0), (850.0, 117.0), (1000.0, 116.0)))
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

  test("distributed exportnc is byte-identical to the driver-side writer") {
    import graft.cube.CubeOps
    // a multi-partition cube: the export's slab writers must land each
    // partition at its exact row offset for the bytes to line up
    val raw = spark.read.parquet(sf("lineitem"))
      .repartition(4, col("l_orderkey"))
    val cube = CubeOps.build(raw, "l_quantity",
      Seq("l_orderkey", "l_linenumber"), None, "c", "mem")
    val e = new Engine(spark, new Catalog("sess"))
    val pid = e.register(cube, "c")
    val out = tmpNc("dist")
    val r = e.runDataOperator("oph_exportnc",
      Map("cube" -> pid, "output_path" -> out))
    assert(r.status == JobStatus.Completed)
    assert(!r.message.contains("truncated"), "the row cap must be gone")

    // reference: the same flattened frame collected and written on the
    // driver through the single-threaded writer
    val flat = cube.flatten
    val names = flat.columns.toSeq
    val rows = flat.select(names.map(n => col(n).cast("double")): _*).collect()
    val vars = names.zipWithIndex.map { case (n, i) =>
      (n, Seq(0), rows.map(r =>
        if (r.isNullAt(i)) Double.NaN else r.getDouble(i)))
    }
    val ref = tmpNc("ref")
    NetCDF3.write(ref, Seq(NetCDF3.Dim("row", rows.length)), vars,
      gatts = Seq("source" -> "graft", "measure" -> "l_quantity"))
    val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out))
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(ref))
    assert(a.length == b.length, s"sizes differ: ${a.length} vs ${b.length}")
    assert(java.util.Arrays.equals(a, b))
  }

  test("exporting an empty cube writes a valid zero-row file") {
    import graft.cube.CubeOps
    val raw = spark.read.parquet(sf("lineitem")).where(lit(false))
    val cube = CubeOps.build(raw, "l_quantity",
      Seq("l_orderkey", "l_linenumber"), None, "c", "mem")
    val e = new Engine(spark, new Catalog("sess"))
    val pid = e.register(cube, "c")
    val out = tmpNc("empty")
    val r = e.runDataOperator("oph_exportnc",
      Map("cube" -> pid, "output_path" -> out))
    assert(r.status == JobStatus.Completed)
    val h = NetCDF3.readHeader(out)
    assert(h.numrecs == 0)
  }
}
