package graft.sources

import graft.SparkSpec

/**
 * szip / CCSDS 121 Rice codec: hand-computed bit fixtures for the
 * coding primitives, saturation coverage for the NN mapper, encoder
 * round-trips across the option matrix, and a hand-built chunked HDF5
 * file that drives the filter-pipeline hookup end-to-end.
 */
class SzipSpec extends SparkSpec {

  private def cli(mask: Int, n: Int, j: Int, pps: Int) = Seq(mask, n, j, pps)

  test("hand fixture: split k=0 (FS) block decodes bit-exactly") {
    // n=8, J=4, pps=4, plain EC (no NN): samples [3,0,1,2]
    // stream: id=001 (k=0), FS: 3 -> 0001, 0 -> 1, 1 -> 01, 2 -> 001
    // bits: 001 0001 1 01 001  = 0010 0011 0100 1000 (padded)
    val bytes = Array(0x23, 0x48).map(_.toByte)
    val got = Szip.decode(bytes, cli(Szip.EC, 8, 4, 4), 4, "t")
    assert(got.toSeq == Seq[Byte](3, 0, 1, 2))
  }

  test("hand fixture: uncompressed block (id=7 for 8-bit)") {
    // id=111 then 4 raw bytes-as-bits
    val w = Seq(200, 255, 0, 17)
    var bits = "111" + w.map(v =>
      String.format("%8s", Integer.toBinaryString(v)).replace(' ', '0'))
      .mkString
    while (bits.length % 8 != 0) bits += "0"
    val bytes = bits.grouped(8).map(Integer.parseInt(_, 2).toByte).toArray
    val got = Szip.decode(bytes, cli(Szip.EC, 8, 4, 4), 4, "t")
    assert(got.map(_ & 0xFF).toSeq == w)
  }

  test("hand fixture: zero-block run spans blocks") {
    // n=8 J=4 pps=12, 3 blocks: [7,0,0,0] then 2 zero blocks
    // block0: id=001, FS 7,0,0,0 -> 00000001 1 1 1
    // block1: id=000, bit 0 (zero run), FS z=1 -> 01 => 2 blocks
    val bits = "001" + "00000001" + "111" + "000" + "0" + "01"
    val padded = bits + "0" * (8 - bits.length % 8)
    val bytes = padded.grouped(8).map(Integer.parseInt(_, 2).toByte).toArray
    val got = Szip.decode(bytes, cli(Szip.EC, 8, 4, 12), 12, "t")
    assert(got.toSeq == Seq[Byte](7, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
  }

  test("NN mapper saturates correctly at the range edges") {
    // values hugging 0 and 255 exercise the one-sided fold; an
    // incorrect sign choice in unmap breaks the round-trip exactly here
    val edgy = Array[Byte](0, -1 /*255*/, 3, -10 /*246*/, 0, 127, -128, 1)
    val c = cli(Szip.EC | Szip.NN, 8, 4, 8)
    val enc = Szip.encode(edgy, c, "t")
    assert(Szip.decode(enc, c, 8, "t").toSeq == edgy.toSeq)
  }

  test("round-trips across bpp / endianness / NN / scanline shapes") {
    val rng = new scala.util.Random(7)
    for {
      n <- Seq(8, 16, 32)
      lsb <- Seq(true, false)
      nn <- Seq(true, false)
      pixels <- Seq(5, 16, 37, 128) // partial blocks + scanlines
    } {
      val mask = Szip.EC | (if (lsb) Szip.LSB else Szip.MSB) |
        (if (nn) Szip.NN else 0)
      val c = cli(mask, n, 8, 16)
      val bps = if (n <= 8) 1 else if (n <= 16) 2 else 4
      val raw = new Array[Byte](pixels * bps)
      rng.nextBytes(raw)
      // smooth data too (the path real data takes: small deltas)
      val smooth = Array.tabulate(pixels * bps)(i => (i / bps).toByte)
      for (data <- Seq(raw, smooth)) {
        val enc = Szip.encode(data, c, "t")
        val dec = Szip.decode(enc, c, pixels, "t")
        assert(dec.toSeq == data.toSeq,
          s"n=$n lsb=$lsb nn=$nn pixels=$pixels")
      }
    }
  }

  test("smooth data actually compresses (the point of the codec)") {
    val c = cli(Szip.EC | Szip.NN | Szip.LSB, 16, 16, 64)
    val data = new Array[Byte](2 * 512)
    (0 until 512).foreach { i =>
      val v = 1000 + (i % 7) // small residuals after the unit delay
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val enc = Szip.encode(data, c, "t")
    assert(enc.length < data.length / 2,
      s"${enc.length} vs ${data.length}: no compression on smooth data")
    assert(Szip.decode(enc, c, 512, "t").toSeq == data.toSeq)
  }

  test("fuzz: corrupted szip streams fail catchably, never hang") {
    // decode must stay bounded on garbage: the FS reader caps runaway
    // unary codes and the bit reader throws at exhaustion — flip every
    // byte position of a real stream and require catchable failures
    val c = cli(Szip.EC | Szip.NN | Szip.LSB, 16, 8, 32)
    val data = Array.tabulate(2 * 64)(i => ((i * 31) & 0xFF).toByte)
    val enc = Szip.encode(data, c, "t")
    val rng = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val m = enc.clone()
      val i = rng.nextInt(m.length)
      m(i) = (m(i) ^ (1 << rng.nextInt(8))).toByte
      try { Szip.decode(m, c, 64, "t"); () }
      catch { case _: Exception => () } // catchable is the contract
    }
    // truncation at every length
    (0 until enc.length).foreach { n =>
      try { Szip.decode(java.util.Arrays.copyOf(enc, n), c, 64, "t"); () }
      catch { case _: Exception => () }
    }
  }

  test("hand-built HDF5 file with a szip'd int32 chunk reads back") {
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
    val values = Array(100, 101, 103, 100, 99, 98, 102, 500)
    val rawData = {
      val b = new B; values.foreach(v => b.u32(v.toLong)); b.bytes
    }
    // LSB to match the little-endian dtype, like H5Zszip does
    val client = Seq(Szip.EC | Szip.NN | Szip.LSB, 32, 4, 8)
    val chunkBytes = {
      val enc = Szip.encode(rawData, client, "t")
      new B().u32(rawData.length.toLong).raw(enc).bytes
    }
    def msgs(btreeAt: Long): Seq[(Int, Array[Byte])] = Seq(
      0x0001 -> new B().u8(1).u8(1).u8(0).u8(0).u32(0).u64(8L).bytes,
      0x0003 -> new B().u8(0x10).u8(0x08).u8(0).u8(0).u32(4)
        .u16(0).u16(32).bytes,
      0x000B -> new B().u8(1).u8(1).u16(0).u32(0)
        .u16(4).u16(0).u16(0).u16(4)
        .u32(client(0).toLong).u32(client(1).toLong)
        .u32(client(2).toLong).u32(client(3).toLong).bytes,
      0x0008 -> new B().u8(3).u8(2).u8(2).u64(btreeAt)
        .u32(8L).u32(4L).bytes)
    val rootAt = 48L
    // root group: ONE compact Link message "d" -> dataset OH
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
    // chunk B-tree: one leaf, one chunk at origin 0
    img.u8('T').u8('R').u8('E').u8('E').u8(1).u8(0).u16(1)
      .u64(Undef).u64(Undef)
    img.u32(chunkBytes.length.toLong).u32(0).u64(0L).u64(0L).u64(chunkAt)
    img.u32(0).u32(0).u64(8L).u64(0L) // end key
    val path = java.io.File.createTempFile("szip_fixture", ".h5").getPath
    java.nio.file.Files.write(java.nio.file.Paths.get(path), img.bytes)

    val f = Hdf5.open(path)
    assert(f.datasets.nonEmpty, "fixture dataset not found")
    val ds = f.datasets.head
    assert(ds.shape == Seq(8L))
    val got = Hdf5.readSlab(path, ds, 0L, 8)
    assert(got.toSeq == values.map(_.toDouble).toSeq)
  }
}
