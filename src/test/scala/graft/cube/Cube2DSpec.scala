package graft.cube

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.{DimensionSpec, CubeDescriptor}

/** 2-implicit-dim cubes: flattened row-major (n1 x n2) arrays. */
class Cube2DSpec extends SparkSpec {
  import spark.implicits._

  /** one key; shape (2,3): [[1,2,3],[4,5,6]] flattened */
  private def cube2(): Cube = {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))).toDF("key", "measure")
    Cube(df, CubeDescriptor(0, 0, "c", "/", "measure", "double", 0,
      Seq(DimensionSpec("key", "long", explicit = true)),
      Seq(DimensionSpec("d1", "int", explicit = false, size = Some(2L)),
        DimensionSpec("d2", "int", explicit = false, size = Some(3L)))))
  }

  test("reduce2 along the inner dim collapses rows of the matrix") {
    val r = CubeOps.reduce2(cube2(), "d2", "sum")
    assert(r.df.select("measure").as[Seq[Double]].head() == Seq(6.0, 15.0))
    assert(r.desc.implicitDims.map(_.name) == Seq("d1"))
  }

  test("reduce2 along the outer dim collapses columns of the matrix") {
    val r = CubeOps.reduce2(cube2(), "d1", "sum")
    assert(r.df.select("measure").as[Seq[Double]].head() == Seq(5.0, 7.0, 9.0))
    assert(r.desc.implicitDims.map(_.name) == Seq("d2"))
  }

  test("reduce2 avg/max along dims") {
    assert(CubeOps.reduce2(cube2(), "d2", "avg")
      .df.select("measure").as[Seq[Double]].head() == Seq(2.0, 5.0))
    assert(CubeOps.reduce2(cube2(), "d1", "max")
      .df.select("measure").as[Seq[Double]].head() == Seq(4.0, 5.0, 6.0))
  }

  test("permute2 transposes and swaps the dim specs") {
    val p = CubeOps.permute2(cube2())
    assert(p.df.select("measure").as[Seq[Double]].head() ==
      Seq(1.0, 4.0, 2.0, 5.0, 3.0, 6.0))
    assert(p.desc.implicitDims.map(_.name) == Seq("d2", "d1"))
    // double transpose is identity
    val pp = CubeOps.permute2(p)
    assert(pp.df.select("measure").as[Seq[Double]].head() ==
      Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("reduce2 rejects unknown dims; rank-1 named dim = plain reduce") {
    intercept[IllegalArgumentException](CubeOps.reduce2(cube2(), "nope", "sum"))
    // naming the ONLY implicit dim is valid reference semantics (the
    // pre-n-D reject was this repo's 2-dim limitation): it degenerates
    // to the whole-array reduce
    val c1 = CubeOps.randcube(spark, 3, 4, 1)
    val viaN = CubeOps.reduce2(c1, "idx", "sum")
    val plain = CubeOps.reduce(c1, "sum", None)
    assert(viaN.df.select("key", "measure").as[(Long, Double)].collect().toSet
      == plain.df.select("key", "measure").as[(Long, Double)].collect().toSet)
    assert(viaN.desc.implicitDims.isEmpty ||
      viaN.desc.implicitDims.forall(_.size.contains(1L)))
  }

  test("randcube2 + engine reduce2 dispatch end-to-end") {
    val c = CubeOps.randcube2(spark, 10, 3, 4, seed = 5)
    assert(c.df.select(size(col("measure"))).as[Int].head() == 12)
    val e = new graft.workflow.Engine(spark, new graft.core.Catalog("s"))
    val pid = e.register(c, "c2")
    val r = e.runDataOperator("oph_reduce2",
      Map("cube" -> pid, "dim" -> "d2", "operation" -> "sum"))
    val out = e.cube(r.cubePid.get).get
    assert(out.df.select(size(col("measure"))).as[Int].head() == 3)
    assert(out.desc.implicitDims.map(_.name) == Seq("d1"))
  }
}
