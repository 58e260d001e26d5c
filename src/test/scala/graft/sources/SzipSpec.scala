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

  test("hand fixture: second extension without reference sample") {
    // n=8, J=4, pps=4, plain EC: samples [1,0,0,1]
    // pairs (1,0),(0,1): gamma = (a+b)(a+b+1)/2 + b -> 1, 2
    // stream: id=000, ext bit 1, FS 1 -> 01, FS 2 -> 001
    val bits = "000" + "1" + "01" + "001"
    val padded = bits + "0" * (8 - bits.length % 8)
    val bytes = padded.grouped(8).map(Integer.parseInt(_, 2).toByte).toArray
    val got = Szip.decode(bytes, cli(Szip.EC, 8, 4, 4), 4, "t")
    assert(got.toSeq == Seq[Byte](1, 0, 0, 1))
  }

  test("hand fixture: second extension PAIRED WITH the reference sample") {
    // the szlib low-entropy shape the old decoder refused: NN
    // preprocessing, block 0 (odd codedLen, even block length). The
    // reference slot pairs as a phantom zero delta (libaec d[0]=0).
    // n=8 J=4 pps=4, samples [5,6,5,6]: ref=5, mapped deltas [2,1,2];
    // pairs (0,2),(1,2) -> gammas (2·3/2+2)=5, (3·4/2+2)=8
    // stream: ref 00000101, id=000, ext 1, FS 5 -> 000001, FS 8 ->
    // 000000001
    val bits = "00000101" + "000" + "1" + "000001" + "000000001"
    val padded = bits + "0" * ((8 - bits.length % 8) % 8)
    val bytes = padded.grouped(8).map(Integer.parseInt(_, 2).toByte).toArray
    val got = Szip.decode(bytes, cli(Szip.EC | Szip.NN, 8, 4, 4), 4, "t")
    assert(got.toSeq == Seq[Byte](5, 6, 5, 6))
  }

  test("hand fixture: ROS (rest-of-segment) zero run") {
    // n=8 J=4 pps=28 -> 7 blocks; block0 [7,0,0,0] then 6 zero blocks
    // coded as one ROS: id=000, run bit 0, FS z=4 -> 00001
    val bits = "001" + "00000001" + "1" + "1" + "1" + "000" + "0" + "00001"
    val padded = bits + "0" * ((8 - bits.length % 8) % 8)
    val bytes = padded.grouped(8).map(Integer.parseInt(_, 2).toByte).toArray
    val got = Szip.decode(bytes, cli(Szip.EC, 8, 4, 28), 28, "t")
    assert(got.toSeq == (Seq[Byte](7) ++ Seq.fill(27)(0.toByte)))
  }

  test("encoder emits the second extension when cheapest and round-trips") {
    // mostly-zero pairs with one isolated 1: SE cost beats every
    // split-k, so the encoder must pick it (and the decoder must undo
    // it). J=8 pps=8, no NN: mapped == samples [0,0,0,0,0,0,1,0]
    val c = cli(Szip.EC, 8, 8, 8)
    val data = Array[Byte](0, 0, 0, 0, 0, 0, 1, 0)
    val enc = Szip.encode(data, c, "t")
    // stream must start id=000 + ext bit 1 (not a split-k header)
    assert((enc(0) & 0xF0) == 0x10,
      f"expected SE header, got first byte 0x${enc(0) & 0xFF}%02x")
    assert(Szip.decode(enc, c, 8, "t").toSeq == data.toSeq)
  }

  test("encoder coalesces zero runs into ROS and round-trips") {
    // [7,0,0,...]: 10 blocks, blocks 1..9 all zero -> single ROS
    // header instead of 9 zero-block headers
    val c = cli(Szip.EC, 8, 4, 40)
    val data = (Seq[Byte](7) ++ Seq.fill(39)(0.toByte)).toArray
    val enc = Szip.encode(data, c, "t")
    // block0 (id=001, FS 7,0,0,0) = 3+8+3 = 14 bits; ROS = 3+1+5 = 9
    // bits -> 23 bits total, 3 bytes
    assert(enc.length == 3, s"${enc.length} bytes: run not coalesced")
    assert(Szip.decode(enc, c, 40, "t").toSeq == data.toSeq)
    // and a mid-scanline run that does NOT reach the segment end
    val data2 = (Seq[Byte](7) ++ Seq.fill(27)(0.toByte) ++
      Seq[Byte](9, 0, 0, 0)).toArray
    val enc2 = Szip.encode(data2, cli(Szip.EC, 8, 4, 32), "t")
    assert(Szip.decode(enc2, cli(Szip.EC, 8, 4, 32), 32, "t").toSeq
      == data2.toSeq)
  }

  test("NN round-trip on low-entropy data (SE + runs under preprocessing)") {
    // constant + rare-step data after NN mapping is exactly the
    // zero-run / second-extension regime; every option must compose
    // with the reference sample
    for (j <- Seq(4, 8, 16); pps <- Seq(j, 4 * j, 64)) {
      if (pps >= j) {
        val c = cli(Szip.EC | Szip.NN, 8, j, pps)
        val data = Array.tabulate(130)(i =>
          (40 + (if (i % 23 == 0) 1 else 0)).toByte)
        val enc = Szip.encode(data, c, "t")
        assert(Szip.decode(enc, c, 130, "t").toSeq == data.toSeq,
          s"J=$j pps=$pps")
        assert(enc.length < data.length, s"J=$j pps=$pps: no compression")
      }
    }
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
