package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/**
 * Property tests for the n-bit and scale+offset codecs: randomized
 * round-trips across the whole parameter space complement the
 * hand-computed fixtures in Hdf5PackedSpec (which pin the exact bit
 * layout; these pin the algebra for arbitrary inputs).
 */
class Hdf5PackedPropSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def leInt(b: Array[Byte], off: Int, size: Int): Long = {
    var v = 0L
    (0 until size).foreach(i => v |= (b(off + i) & 0xFFL) << (8 * i))
    v
  }

  test("nbit: encode/decode round-trips any fields at any precision") {
    val gen = for {
      size <- Gen.oneOf(1, 2, 4, 8)
      precision <- Gen.choose(1, size * 8 - 1)
      signed <- Gen.oneOf(true, false)
      n <- Gen.choose(1, 120)
      fields <- Gen.listOfN(n, Gen.choose(0L, (1L << precision) - 1))
    } yield (size, precision, signed, fields.toArray)
    check(Prop.forAll(gen) { case (size, precision, signed, fields) =>
      val enc = Nbit.encode(fields, precision)
      val dt = Hdf5.Dtype(Hdf5.ClassFixed, size, littleEndian = true,
        signed = signed)
      val cd = Nbit.cdValues(fields.length, size, littleEndian = true,
        precision, offset = 0)
      val out = Nbit.decode(enc, cd, dt, "prop")
      fields.zipWithIndex.forall { case (f, i) =>
        val got = leInt(out, i * size, size)
        val want =
          if (signed && ((f >> (precision - 1)) & 1) == 1)
            (f | (-1L << precision)) &
              (if (size == 8) -1L else (1L << (size * 8)) - 1)
          else f
        got == want
      }
    })
  }

  test("nbit: stream length is exactly ceil(n*precision/8) bytes") {
    val gen = for {
      precision <- Gen.choose(1, 63)
      n <- Gen.choose(0, 200)
      fields <- Gen.listOfN(n, Gen.choose(0L, (1L << precision) - 1))
    } yield (precision, fields.toArray)
    check(Prop.forAll(gen) { case (precision, fields) =>
      Nbit.encode(fields, precision).length ==
        (fields.length.toLong * precision + 7) / 8
    })
  }

  test("scaleoffset int: round-trips any values within the type range") {
    val gen = for {
      size <- Gen.oneOf(2, 4, 8)
      half = if (size == 8) Long.MaxValue / 4
        else (1L << (size * 8 - 2)) - 1
      n <- Gen.choose(1, 120)
      values <- Gen.listOfN(n, Gen.choose(-half, half))
    } yield (size, values.toArray)
    check(Prop.forAll(gen) { case (size, values) =>
      val enc = ScaleOffset.encodeInt(values, size, None)
      val cd = ScaleOffset.cdValues(ScaleOffset.SoInt, 0, values.length,
        isFloat = false, size = size, signed = true, littleEndian = true,
        fillBytes = None)
      val dt = Hdf5.Dtype(Hdf5.ClassFixed, size, littleEndian = true,
        signed = true)
      val out = ScaleOffset.decode(enc, cd, dt, "prop")
      values.zipWithIndex.forall { case (v, i) =>
        val raw = leInt(out, i * size, size)
        val got = if (size == 8) raw
          else PackedCommon.signExtend(raw, size * 8)
        got == v
      }
    })
  }

  test("scaleoffset int: fill values always survive, data never shifts") {
    val fill = 999999L
    val gen = for {
      n <- Gen.choose(2, 80)
      values <- Gen.listOfN(n,
        Gen.frequency(3 -> Gen.choose(-5000L, 5000L), 1 -> Gen.const(fill)))
      if values.exists(_ != fill)
    } yield values.toArray
    check(Prop.forAll(gen) { values =>
      val enc = ScaleOffset.encodeInt(values, 4, Some(fill))
      val fillBytes = Array.tabulate(4)(i =>
        ((fill >> (8 * i)) & 0xFF).toByte)
      val cd = ScaleOffset.cdValues(ScaleOffset.SoInt, 0, values.length,
        isFloat = false, size = 4, signed = true, littleEndian = true,
        fillBytes = Some(fillBytes))
      val dt = Hdf5.Dtype(Hdf5.ClassFixed, 4, littleEndian = true,
        signed = true)
      val out = ScaleOffset.decode(enc, cd, dt, "prop")
      values.zipWithIndex.forall { case (v, i) =>
        PackedCommon.signExtend(leInt(out, i * 4, 4), 32) == v
      }
    })
  }

  test("scaleoffset D-scale: error bounded by 1/10^d per value") {
    val gen = for {
      size <- Gen.oneOf(4, 8)
      d <- Gen.choose(1, 3)
      n <- Gen.choose(1, 80)
      values <- Gen.listOfN(n, Gen.choose(-100000, 100000)
        .map(_ / 1000.0))
    } yield (size, d, values.toArray)
    check(Prop.forAll(gen) { case (size, d, values) =>
      val enc = ScaleOffset.encodeDscale(values, size, d, None)
      val cd = ScaleOffset.cdValues(ScaleOffset.SoFloatDscale, d,
        values.length, isFloat = true, size = size, signed = true,
        littleEndian = true, fillBytes = None)
      val dt = Hdf5.Dtype(Hdf5.ClassFloat, size, littleEndian = true,
        signed = true)
      val out = ScaleOffset.decode(enc, cd, dt, "prop")
      val bb = java.nio.ByteBuffer.wrap(out)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val tol = math.pow(10.0, -d) * 1.05 +
        (if (size == 4) 0.05 else 0.0) // float32 quantization headroom
      values.zipWithIndex.forall { case (v, i) =>
        val got = if (size == 8) bb.getDouble(i * 8)
          else bb.getFloat(i * 4).toDouble
        math.abs(got - v) <= tol
      }
    })
  }
}
