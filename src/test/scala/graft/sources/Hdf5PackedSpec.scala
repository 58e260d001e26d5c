package graft.sources

import graft.SparkSpec

/**
 * N-bit and scale+offset filter coverage: hand-computed bit fixtures
 * against the public H5Znbit/H5Zscaleoffset stream layout, encoder
 * round-trips across the type matrix, named-error scope checks,
 * bit-flip fuzz, and hand-built chunked HDF5 files driving the
 * filter-pipeline hookup end-to-end (including scaleoffset chained
 * under deflate, the data-dependent inflate path).
 */
class Hdf5PackedSpec extends SparkSpec {

  private val u16le = Hdf5.Dtype(Hdf5.ClassFixed, 2, littleEndian = true,
    signed = false)
  private val s16le = Hdf5.Dtype(Hdf5.ClassFixed, 2, littleEndian = true,
    signed = true)
  private val s32le = Hdf5.Dtype(Hdf5.ClassFixed, 4, littleEndian = true,
    signed = true)
  private val f64le = Hdf5.Dtype(Hdf5.ClassFloat, 8, littleEndian = true,
    signed = true)
  private val f32le = Hdf5.Dtype(Hdf5.ClassFloat, 4, littleEndian = true,
    signed = true)

  private def leInt(b: Array[Byte], off: Int, size: Int): Long = {
    var v = 0L
    (0 until size).foreach(i => v |= (b(off + i) & 0xFFL) << (8 * i))
    v
  }

  // ------------------------------------------------------------ nbit

  test("nbit hand fixture: 6-bit field at offset 3 decodes MSB-first") {
    // field 45 = 0b101101 -> stream 10110100 = 0xB4; the decoded value
    // is the CONVERTED full-width integer (field extracted, no shift)
    val cd = Nbit.cdValues(1, 2, littleEndian = true, precision = 6,
      offset = 3)
    val out = Nbit.decode(Array(0xB4.toByte), cd, u16le, "t")
    assert(leInt(out, 0, 2) == 45L)
    // signed dtype: bit 5 set -> sign-extend to -19 (0xFFED)
    val sOut = Nbit.decode(Array(0xB4.toByte), cd, s16le, "t")
    assert(leInt(sOut, 0, 2) == 0xFFEDL)
  }

  test("nbit hand fixture: elements straddle byte boundaries") {
    // fields [45, 19] = 101101 010011 -> 10110101 0011---- = 0xB5 0x30
    val cd = Nbit.cdValues(2, 2, littleEndian = true, precision = 6,
      offset = 0)
    val out = Nbit.decode(Array(0xB5.toByte, 0x30.toByte), cd, u16le, "t")
    assert(leInt(out, 0, 2) == 45L && leInt(out, 2, 2) == 19L)
    // and the encoder produces exactly those bytes
    assert(Nbit.encode(Array(45L, 19L), 6).toSeq ==
      Seq(0xB5.toByte, 0x30.toByte))
  }

  test("nbit round-trips across size/precision/signedness") {
    val rng = new scala.util.Random(5)
    for {
      size <- Seq(1, 2, 4, 8)
      precision <- Seq(1, 3, 7, 8, 12, 23, 31).filter(_ <= size * 8 - 1)
      signed <- Seq(true, false)
    } {
      val n = 67 // odd count: stream tail padding in play
      val fields = Array.fill(n)(
        rng.nextLong().abs % (1L << precision))
      val enc = Nbit.encode(fields, precision)
      val dt = Hdf5.Dtype(Hdf5.ClassFixed, size, littleEndian = true,
        signed = signed)
      val cd = Nbit.cdValues(n, size, littleEndian = true, precision,
        offset = 0)
      val out = Nbit.decode(enc, cd, dt, "t")
      fields.zipWithIndex.foreach { case (f, i) =>
        val got = leInt(out, i * size, size)
        val want =
          if (signed && ((f >> (precision - 1)) & 1) == 1)
            (f | (-1L << precision)) & (if (size == 8) -1L
              else (1L << (size * 8)) - 1)
          else f
        assert(got == want, s"size=$size prec=$precision signed=$signed i=$i")
      }
    }
  }

  test("nbit passthrough: needn't-compress flag and no-op class") {
    val raw = Array.tabulate(8)(i => (i * 17).toByte)
    val flagged = Seq(8, 1, 2, Nbit.ClsAtomic, 4, 0, 32, 0)
    assert(Nbit.decode(raw, flagged, s32le, "t").toSeq == raw.toSeq)
    val noop = Seq(8, 0, 2, Nbit.ClsNoop, 4, 0, 32, 0)
    assert(Nbit.decode(raw, noop, s32le, "t").toSeq == raw.toSeq)
  }

  test("nbit scope errors are named: compound/array classes, reduced float") {
    val raw = new Array[Byte](8)
    intercept[Hdf5.FormatError](Nbit.decode(raw,
      Seq(8, 0, 1, Nbit.ClsCompound, 4, 0, 16, 0), s32le, "t"))
    intercept[Hdf5.FormatError](Nbit.decode(raw,
      Seq(8, 0, 1, Nbit.ClsArray, 4, 0, 16, 0), s32le, "t"))
    intercept[Hdf5.FormatError](Nbit.decode(raw,
      Seq(8, 0, 1, Nbit.ClsAtomic, 4, 0, 16, 0), f32le, "t"))
  }

  // ----------------------------------------------------- scaleoffset

  test("scaleoffset hand fixture: int residuals pack at minbits") {
    // [100,101,103,107]: min=100 span=8 -> minbits=3; residuals
    // 000 001 011 111 -> 0x05 0xF0; header = minbits LE32, minval
    // width 8, minval 100 LE64, zero-padded to the fixed offset 21
    val enc = ScaleOffset.encodeInt(Array(100L, 101L, 103L, 107L), 4, None)
    val expectHeader = Array[Byte](3, 0, 0, 0, 8, 100, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0)
    assert(enc.take(21).toSeq == expectHeader.toSeq)
    assert(enc.drop(21).toSeq == Seq(0x05.toByte, 0xF0.toByte))
    val cd = ScaleOffset.cdValues(ScaleOffset.SoInt, 0, 4, isFloat = false,
      size = 4, signed = true, littleEndian = true, fillBytes = None)
    val out = ScaleOffset.decode(enc, cd, s32le, "t")
    assert((0 until 4).map(i => leInt(out, i * 4, 4)) ==
      Seq(100L, 101L, 103L, 107L))
  }

  test("scaleoffset: negative minimum sign-extends through minval") {
    val vals = Array(-5L, -2L, 0L, 3L)
    val enc = ScaleOffset.encodeInt(vals, 4, None)
    val cd = ScaleOffset.cdValues(ScaleOffset.SoInt, 0, 4, isFloat = false,
      size = 4, signed = true, littleEndian = true, fillBytes = None)
    val out = ScaleOffset.decode(enc, cd, s32le, "t")
    val got = (0 until 4).map(i => leInt(out, i * 4, 4).toInt)
    assert(got == Seq(-5, -2, 0, 3))
  }

  test("scaleoffset: defined fill value rides the all-ones code") {
    val fill = 999L
    val vals = Array(10L, fill, 12L, 10L)
    val enc = ScaleOffset.encodeInt(vals, 4, Some(fill))
    // span 3 + fill slot -> minbits 2, fill code 0b11
    assert(leInt(enc, 0, 4) == 2L)
    val fillBytes = Array[Byte](
      (999 & 0xFF).toByte, ((999 >> 8) & 0xFF).toByte, 0, 0)
    val cd = ScaleOffset.cdValues(ScaleOffset.SoInt, 0, 4, isFloat = false,
      size = 4, signed = true, littleEndian = true,
      fillBytes = Some(fillBytes))
    val out = ScaleOffset.decode(enc, cd, s32le, "t")
    assert((0 until 4).map(i => leInt(out, i * 4, 4)) ==
      Seq(10L, 999L, 12L, 10L))
  }

  test("scaleoffset: all-equal chunk packs to minbits=0") {
    val enc = ScaleOffset.encodeInt(Array.fill(16)(42L), 4, None)
    assert(leInt(enc, 0, 4) == 0L)
    assert(enc.length == 21) // header only, no payload bits
    val cd = ScaleOffset.cdValues(ScaleOffset.SoInt, 0, 16, isFloat = false,
      size = 4, signed = true, littleEndian = true, fillBytes = None)
    val out = ScaleOffset.decode(enc, cd, s32le, "t")
    assert((0 until 16).forall(i => leInt(out, i * 4, 4) == 42L))
  }

  test("scaleoffset float D-scale round-trips to the declared decimals") {
    val rng = new scala.util.Random(9)
    for (size <- Seq(4, 8); d <- Seq(1, 2, 3)) {
      val vals = Array.fill(50)(
        math.round((rng.nextDouble() * 40 - 20) * 1000) / 1000.0)
      val enc = ScaleOffset.encodeDscale(vals, size, d, None)
      val cd = ScaleOffset.cdValues(ScaleOffset.SoFloatDscale, d, 50,
        isFloat = true, size = size, signed = true, littleEndian = true,
        fillBytes = None)
      val dt = if (size == 8) f64le else f32le
      val out = ScaleOffset.decode(enc, cd, dt, "t")
      val bb = java.nio.ByteBuffer.wrap(out)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vals.zipWithIndex.foreach { case (v, i) =>
        val got = if (size == 8) bb.getDouble(i * 8)
          else bb.getFloat(i * 4).toDouble
        // round(v*f) and round(min*f) each contribute up to 0.5/f
        val tol = math.pow(10.0, -d) * 1.05
        assert(math.abs(got - v) <= tol,
          s"size=$size d=$d i=$i: $got vs $v")
      }
    }
  }

  test("scaleoffset full-precision chunks pass the payload verbatim") {
    // span covering the whole type: minbits == size*8 -> raw bytes
    // after the 21-byte header
    val vals = Array(0L, 255L, 17L)
    val enc = ScaleOffset.encodeInt(vals, 1, None)
    assert(leInt(enc, 0, 4) == 8L)
    val cd = ScaleOffset.cdValues(ScaleOffset.SoInt, 0, 3, isFloat = false,
      size = 1, signed = false, littleEndian = true, fillBytes = None)
    val dt = Hdf5.Dtype(Hdf5.ClassFixed, 1, littleEndian = true,
      signed = false)
    val out = ScaleOffset.decode(enc, cd, dt, "t")
    assert((0 until 3).map(i => leInt(out, i, 1)) == vals.toSeq)
  }

  test("scaleoffset E-scale raises the libhdf5-parity named error") {
    val enc = ScaleOffset.encodeInt(Array(1L, 2L), 4, None)
    val cd = ScaleOffset.cdValues(ScaleOffset.SoFloatEscale, 2, 2,
      isFloat = true, size = 4, signed = true, littleEndian = true,
      fillBytes = None)
    val e = intercept[Hdf5.FormatError](
      ScaleOffset.decode(enc, cd, f32le, "t"))
    assert(e.getMessage.contains("E-scale"))
  }

  test("fuzz: corrupted packed streams fail catchably, never hang") {
    val rng = new scala.util.Random(3)
    val nEnc = Nbit.encode(Array.tabulate(40)(_.toLong % 31), 5)
    val nCd = Nbit.cdValues(40, 4, littleEndian = true, 5, 0)
    val sEnc = ScaleOffset.encodeInt(
      Array.tabulate(40)(i => 50L + i % 13), 4, None)
    val sCd = ScaleOffset.cdValues(ScaleOffset.SoInt, 0, 40,
      isFloat = false, size = 4, signed = true, littleEndian = true,
      fillBytes = None)
    (0 until 200).foreach { _ =>
      def mut(b: Array[Byte]): Array[Byte] = {
        val m = b.clone()
        val i = rng.nextInt(m.length)
        m(i) = (m(i) ^ (1 << rng.nextInt(8))).toByte
        m
      }
      try { Nbit.decode(mut(nEnc), nCd, s32le, "t"); () }
      catch { case _: Exception => () }
      try { ScaleOffset.decode(mut(sEnc), sCd, s32le, "t"); () }
      catch { case _: Exception => () }
    }
    // truncations must throw, not read out of bounds
    (0 until nEnc.length).foreach { n =>
      try { Nbit.decode(java.util.Arrays.copyOf(nEnc, n), nCd, s32le, "t"); () }
      catch { case _: Exception => () }
    }
    (0 until sEnc.length).foreach { n =>
      try { ScaleOffset.decode(java.util.Arrays.copyOf(sEnc, n), sCd,
        s32le, "t"); () }
      catch { case _: Exception => () }
    }
  }

  // ------------------------------------------- end-to-end HDF5 files

  /** Minimal v0-superblock file with one chunked 1-D int32 dataset
    * behind the given filter pipeline (the SzipSpec harness shape). */
  private def buildFile(values: Array[Int],
      filters: Seq[(Int, Seq[Int])], chunkBytes: Array[Byte]): String = {
    val Undef = -1L
    final class B {
      val o = new java.io.ByteArrayOutputStream
      def u8(v: Int): B = { o.write(v & 0xFF); this }
      def u16(v: Int): B = { u8(v); u8(v >> 8) }
      def u32(v: Long): B = { u16(v.toInt); u16((v >> 16).toInt) }
      def u64(v: Long): B = { u32(v); u32(v >> 32) }
      def raw(b: Array[Byte]): B = { o.write(b); this }
      def pad(to: Int): B = { while (o.size < to) u8(0); this }
      def bytes: Array[Byte] = o.toByteArray
    }
    def ohV1(msgs: Seq[(Int, Array[Byte])]): Array[Byte] = {
      def pad8(n: Int) = (n + 7) & ~7
      val body = new B
      msgs.foreach { case (t, d) =>
        val sz = pad8(d.length)
        body.u16(t).u16(sz).u8(0).u8(0).u8(0).u8(0)
        body.raw(d).raw(new Array[Byte](sz - d.length))
      }
      val bb = body.bytes
      new B().u8(1).u8(0).u16(msgs.size).u32(1).u32(bb.length).u32(0)
        .raw(bb).bytes
    }
    val n = values.length
    val filterMsg = {
      val b = new B().u8(1).u8(filters.size).u16(0).u32(0)
      filters.foreach { case (id, cvals) =>
        b.u16(id).u16(0).u16(0).u16(cvals.size)
        cvals.foreach(v => b.u32(v.toLong & 0xFFFFFFFFL))
        if (cvals.size % 2 == 1) b.u32(0) // v1 pads odd client counts
      }
      b.bytes
    }
    def msgs(btreeAt: Long): Seq[(Int, Array[Byte])] = Seq(
      0x0001 -> new B().u8(1).u8(1).u8(0).u8(0).u32(0).u64(n.toLong).bytes,
      0x0003 -> new B().u8(0x10).u8(0x08).u8(0).u8(0).u32(4)
        .u16(0).u16(32).bytes,
      0x000B -> filterMsg,
      0x0008 -> new B().u8(3).u8(2).u8(2).u64(btreeAt)
        .u32(n.toLong).u32(4L).bytes)
    val rootAt = 48L
    def rootOh(dsAt: Long): Array[Byte] = ohV1(Seq(
      0x0006 -> new B().u8(1).u8(0).u8(1).u8('d').u64(dsAt).bytes))
    val dsOhAt = rootAt + rootOh(0L).length
    val ohSize = ohV1(msgs(0L)).length
    val chunkAt = dsOhAt + ohSize
    val btreeAt = chunkAt + chunkBytes.length
    val img = new B
    img.raw(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    img.u8(2).u8(8).u8(8).u8(0).u64(0).u64(Undef).u64(3000L).u64(rootAt)
    img.u32(0)
    img.pad(rootAt.toInt)
    img.raw(rootOh(dsOhAt))
    img.raw(ohV1(msgs(btreeAt)))
    img.raw(chunkBytes)
    img.u8('T').u8('R').u8('E').u8('E').u8(1).u8(0).u16(1)
      .u64(Undef).u64(Undef)
    img.u32(chunkBytes.length.toLong).u32(0).u64(0L).u64(0L).u64(chunkAt)
    img.u32(0).u32(0).u64(n.toLong).u64(0L)
    val path = java.io.File.createTempFile("packed_fixture", ".h5").getPath
    java.nio.file.Files.write(java.nio.file.Paths.get(path), img.bytes)
    path
  }

  test("hand-built HDF5 file with an nbit'd int32 chunk reads back") {
    // 12-bit signed values in a 32-bit type — the classic nbit case
    val values = Array(-2048, -1, 0, 1, 2047, 123, -77, 500)
    val fields = values.map(v => (v.toLong & 0xFFF))
    val enc = Nbit.encode(fields, 12)
    val cd = Nbit.cdValues(values.length, 4, littleEndian = true,
      precision = 12, offset = 0)
    val path = buildFile(values, Seq(5 -> cd), enc)
    val f = Hdf5.open(path)
    val ds = f.datasets.head
    assert(ds.filters.map(_.id) == Seq(5))
    val got = Hdf5.readSlab(path, ds, 0L, values.length)
    assert(got.toSeq == values.map(_.toDouble).toSeq)
  }

  test("hand-built HDF5 file with a scaleoffset'd int32 chunk reads back") {
    val values = Array(100, 101, 103, 100, 99, 98, 102, 500)
    val enc = ScaleOffset.encodeInt(values.map(_.toLong), 4, None)
    val cd = ScaleOffset.cdValues(ScaleOffset.SoInt, 0, values.length,
      isFloat = false, size = 4, signed = true, littleEndian = true,
      fillBytes = None)
    val path = buildFile(values, Seq(6 -> cd), enc)
    val f = Hdf5.open(path)
    val ds = f.datasets.head
    val got = Hdf5.readSlab(path, ds, 0L, values.length)
    assert(got.toSeq == values.map(_.toDouble).toSeq)
  }

  test("scaleoffset chained under deflate inflates to the packed size") {
    val values = Array.tabulate(64)(i => 1000 + (i * 7) % 40)
    val packed = ScaleOffset.encodeInt(values.map(_.toLong), 4, None)
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput(packed); d.finish()
      val buf = new Array[Byte](packed.length * 2 + 64)
      val m = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, m)
    }
    val soCd = ScaleOffset.cdValues(ScaleOffset.SoInt, 0, values.length,
      isFloat = false, size = 4, signed = true, littleEndian = true,
      fillBytes = None)
    // pipeline order = write order: scaleoffset then deflate
    val path = buildFile(values, Seq(6 -> soCd, 1 -> Seq(6)), defl)
    val f = Hdf5.open(path)
    val ds = f.datasets.head
    assert(ds.filters.map(_.id) == Seq(6, 1))
    val got = Hdf5.readSlab(path, ds, 0L, values.length)
    assert(got.toSeq == values.map(_.toDouble).toSeq)
  }
}
