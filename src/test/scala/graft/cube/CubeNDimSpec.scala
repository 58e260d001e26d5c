package graft.cube

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.{CubeDescriptor, DimensionSpec}

/** n-implicit-dim layer (arbitrary-rank permute / per-axis reduce /
  * per-axis subset) verified against a plain-Scala brute-force model of
  * the row-major layout. Mirrors the reference's n-D in-blob data model
  * (`/root/reference/src/oph_ophidiadb_query.h:48`, per-dim subset args
  * `src/oph_parser.h:68-70`). */
class CubeNDimSpec extends SparkSpec {
  import spark.implicits._

  // ---- plain-Scala reference model over a row-major flattened array ----

  private def strides(shape: Seq[Int]): Seq[Int] =
    shape.scanRight(1)(_ * _).tail

  private def refPermute(a: Seq[Double], shape: Seq[Int], perm: Seq[Int]): Seq[Double] = {
    val sIn = strides(shape)
    val outShape = perm.map(shape)
    val sOut = strides(outShape)
    (0 until shape.product).map { k =>
      val src = perm.indices.map(j => (k / sOut(j)) % outShape(j) * sIn(perm(j))).sum
      a(src)
    }
  }

  private def refReduce(a: Seq[Double], shape: Seq[Int], axis: Int): Seq[Double] = {
    val sIn = strides(shape)
    val outAxes = shape.indices.filterNot(_ == axis)
    val outShape = outAxes.map(shape)
    val sOut = strides(outShape)
    (0 until outShape.product).map { k =>
      val base = outAxes.indices.map(j => (k / sOut(j)) % outShape(j) * sIn(outAxes(j))).sum
      (0 until shape(axis)).map(t => a(base + t * sIn(axis))).sum
    }
  }

  private def ndCube(shape: Seq[Int], names: Seq[String]): (Cube, Seq[Double]) = {
    // values encode their own flattened position -> any misrouted index
    // changes the result
    val vals = (0 until shape.product).map(k => (k * 7 + 3).toDouble)
    val df = Seq(Tuple1(vals)).toDF("m")
    val cube = Cube(df, CubeDescriptor(0, 0, "nd", "/", "m", "double", 0,
      Seq.empty,
      names.zip(shape).map { case (n, s) =>
        DimensionSpec(n, "int", explicit = false, size = Some(s.toLong)) }))
    (cube, vals)
  }

  private def cell(c: Cube): Seq[Double] =
    c.df.select(col(c.desc.measure).cast("array<double>"))
      .as[Seq[Double]].head()

  test("permuteN matches brute force for every order of a 3-D cube") {
    val shape = Seq(2, 3, 4)
    val names = Seq("a", "b", "c")
    val (cube, vals) = ndCube(shape, names)
    for (perm <- names.indices.permutations) {
      val got = cell(CubeOps.permuteN(cube, perm.map(names)))
      assert(got == refPermute(vals, shape, perm),
        s"order ${perm.map(names).mkString(",")}")
    }
  }

  test("permuteN updates dim order and survives a second permutation") {
    val (cube, vals) = ndCube(Seq(2, 3, 4), Seq("a", "b", "c"))
    val p1 = CubeOps.permuteN(cube, Seq("c", "a", "b"))
    assert(p1.desc.implicitDims.map(_.name) == Seq("c", "a", "b"))
    assert(CubeOps.implicitShape(p1) == Seq(4L, 2L, 3L))
    // permuting back restores the original layout
    val back = CubeOps.permuteN(p1, Seq("a", "b", "c"))
    assert(cell(back) == vals)
  }

  test("reduceN matches brute force along each axis of a 3-D cube") {
    val shape = Seq(2, 3, 4)
    val names = Seq("a", "b", "c")
    val (cube, vals) = ndCube(shape, names)
    for (axis <- shape.indices) {
      val red = CubeOps.reduceN(cube, names(axis), "sum")
      assert(cell(red) == refReduce(vals, shape, axis), s"axis ${names(axis)}")
      assert(red.desc.implicitDims.map(_.name) ==
        names.patch(axis, Nil, 1), s"dims after ${names(axis)}")
    }
  }

  test("reduceN middle axis then reduceN again collapses to rank 1") {
    val shape = Seq(2, 3, 4)
    val (cube, vals) = ndCube(shape, Seq("a", "b", "c"))
    val r1 = CubeOps.reduceN(cube, "b", "sum")           // shape (2,4)
    val r2 = CubeOps.reduceN(r1, "a", "sum")             // shape (4)
    val expect = refReduce(refReduce(vals, shape, 1), Seq(2, 4), 0)
    assert(cell(r2) == expect)
    assert(r2.desc.implicitDims.map(_.name) == Seq("c"))
  }

  test("4-D permute + middle-axis reduce match brute force") {
    val shape = Seq(2, 3, 2, 2)
    val names = Seq("a", "b", "c", "d")
    val (cube, vals) = ndCube(shape, names)
    val perm = Seq(3, 0, 2, 1)
    val p = CubeOps.permuteN(cube, perm.map(names))
    assert(cell(p) == refPermute(vals, shape, perm))
    val red = CubeOps.reduceN(cube, "c", "avg")
    val sums = refReduce(vals, shape, 2).map(_ / shape(2))
    assert(cell(red) == sums)
  }

  test("subsetImplicitN keeps matching indices along any axis") {
    val shape = Seq(2, 3, 4)
    val names = Seq("a", "b", "c")
    val (cube, vals) = ndCube(shape, names)
    val sub = CubeOps.subsetImplicitN(cube, "b", "1:2:3") // keep b in {1,3}
    val sIn = strides(shape)
    val expect = vals.zipWithIndex.collect {
      case (v, i) if Set(0, 2)((i / sIn(1)) % shape(1)) => v
    }
    assert(cell(sub) == expect)
    assert(CubeOps.implicitShape(sub) == Seq(2L, 2L, 4L))
    // the shrunken shape stays consistent: reduceN over the subset axis
    val red = CubeOps.reduceN(sub, "b", "sum")
    assert(red.desc.implicitDims.map(_.name) == Seq("a", "c"))
    assert(cell(red).size == 2 * 4)
  }

  test("buildN serializes a dense 2-D grid row-major with axis arrays") {
    val raw = (for { a <- Seq(10, 20); b <- Seq(1, 2, 3) }
      yield (1L, a, b, (a * 10 + b).toDouble)).toDF("k", "a", "b", "v")
    val c = CubeOps.buildN(raw, "v", Seq("k"), Seq("a", "b"), "t", "mem")
    assert(CubeOps.implicitShape(c) == Seq(2L, 3L))
    assert(cell(c) == Seq(101.0, 102.0, 103.0, 201.0, 202.0, 203.0))
    assert(c.df.select("__dim_a").as[Seq[Int]].head() == Seq(10, 20))
    assert(c.df.select("__dim_b").as[Seq[Int]].head() == Seq(1, 2, 3))
    // flatten reconstructs the long form exactly
    val flat = c.flatten.select("k", "a", "b", "v")
      .as[(Long, Int, Int, Double)].collect().sortBy(r => (r._2, r._3))
    assert(flat.toSeq == raw.as[(Long, Int, Int, Double)]
      .collect().sortBy(r => (r._2, r._3)).toSeq)
  }

  test("buildN fails loudly on a ragged (non-dense) grid") {
    val raw = Seq((1L, 10, 1, 1.0), (1L, 10, 2, 2.0), (1L, 20, 1, 3.0))
      .toDF("k", "a", "b", "v") // missing (20, 2) cell
    val c = CubeOps.buildN(raw, "v", Seq("k"), Seq("a", "b"), "t", "mem")
    val e = intercept[Exception](c.df.collect())
    assert(e.getMessage.contains("dense") ||
      Option(e.getCause).exists(_.getMessage.contains("dense")))
  }

  test("buildN 3-D: subset + reduce along named axes keep coordinates") {
    val raw = (for { t <- 1 to 4; a <- Seq(-30, 0, 30); b <- Seq(100, 110) }
      yield (t, a, b, (t * 100 + (a + 30) + b / 10).toDouble))
      .toDF("t", "lat", "lon", "v")
    val c = CubeOps.buildN(raw, "v", Seq.empty, Seq("t", "lat", "lon"), "t", "mem")
    assert(CubeOps.implicitShape(c) == Seq(4L, 3L, 2L))
    // subset lat to the last two values by index
    val sub = CubeOps.subsetImplicitN(c, "lat", "2:3")
    assert(sub.df.select("__dim_lat").as[Seq[Int]].head() == Seq(0, 30))
    assert(CubeOps.implicitShape(sub) == Seq(4L, 2L, 2L))
    // reduce over t: output (lat 2 x lon 2), avg over the 4 times
    val red = CubeOps.reduceN(sub, "t", "avg")
    assert(red.desc.implicitDims.map(_.name) == Seq("lat", "lon"))
    assert(!red.df.columns.contains("__dim_t"))
    val got = cell(red)
    // avg over t of t*100 + (lat+30) + lon/10 = 250 + (lat+30) + lon/10
    val expect = for { a <- Seq(0, 30); b <- Seq(100, 110) }
      yield 250.0 + (a + 30) + b / 10
    assert(got == expect)
    // flatten exposes real coordinate values, not indices
    val flat = red.flatten.select("lat", "lon", "v")
      .as[(Int, Int, Double)].collect().toSeq.sorted
    assert(flat == (for { a <- Seq(0, 30); b <- Seq(100, 110) }
      yield (a, b, 250.0 + (a + 30) + b / 10)).sorted)
  }

  test("reduce2/permute2 delegate to the n-D path unchanged") {
    val (cube, vals) = ndCube(Seq(3, 5), Seq("x", "y"))
    val t = CubeOps.permute2(cube)
    assert(cell(t) == refPermute(vals, Seq(3, 5), Seq(1, 0)))
    val ri = CubeOps.reduce2(cube, "y", "sum")
    assert(cell(ri) == refReduce(vals, Seq(3, 5), 1))
    val ro = CubeOps.reduce2(cube, "x", "sum")
    assert(cell(ro) == refReduce(vals, Seq(3, 5), 0))
  }
}
