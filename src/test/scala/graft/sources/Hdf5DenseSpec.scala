package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Dense (fractal-heap) group links — the storage libhdf5 switches to
 * past ~8 links per group, i.e. every real CMIP-style file with many
 * variables. Covers both sides: the writer's forced/auto dense root
 * group (single direct block + single-leaf v2 B-tree), and the
 * reader's general walk (root indirect block, multiple direct blocks,
 * depth-1 name index) over a hand-built spec fixture.
 */
class Hdf5DenseSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val f = java.io.File.createTempFile(prefix, ".nc4")
    f.delete(); f.getPath
  }

  private def hasSig(path: String, sig: String): Boolean = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val pat = sig.getBytes("US-ASCII")
    bytes.indices.exists(i => i + pat.length <= bytes.length &&
      pat.indices.forall(j => bytes(i + j) == pat(j)))
  }

  test("lookup3 matches Bob Jenkins's published self-test vectors") {
    assert(Hdf5.lookup3(Array.emptyByteArray, 0) == 0xdeadbeef)
    val four = "Four score and seven years ago".getBytes("US-ASCII")
    assert(Hdf5.lookup3(four, 0) == 0x17770551)
    assert(Hdf5.lookup3(four, 1) == 0xcd628161.toInt)
  }

  test("forced dense root group roundtrips (few links)") {
    import NetCDF3.Dim
    val path = tmp("dense_forced")
    NetCDF4.write(path,
      dims = Seq(Dim("time", 2), Dim("level", 3)),
      vars = Seq(
        ("time", Seq(0), Array(100.0, 200.0)),
        ("level", Seq(1), Array(1000.0, 850.0, 500.0)),
        ("tas", Seq(0, 1), Array(11.0, 12.0, 13.0, 21.0, 22.0, 23.0))),
      gatts = Seq("title" -> "dense"),
      denseGroups = true)
    assert(hasSig(path, "FRHP") && hasSig(path, "BTHD") &&
      hasSig(path, "BTLF"), "dense structures missing from the file")
    assert(!hasSig(path, "SNOD"), "old-style symbol node written too")
    val f = Hdf5.open(path)
    assert(f.datasets.map(_.name).sorted == Seq("level", "tas", "time"))
    val m = NetCDF4.open(path)
    val tas = m.varByName("tas")
    assert(NetCDF4.readSlab(path, tas, 0L, 6).toSeq ==
      Seq(11.0, 12.0, 13.0, 21.0, 22.0, 23.0))
  }

  test("many-variable file auto-switches to dense (netcdf-c threshold)") {
    import NetCDF3.Dim
    val path = tmp("dense_auto")
    // 12 variables + 1 dim = 13 root links > 8 -> dense without asking
    val vars = (0 until 12).map { v =>
      (f"v$v%02d", Seq(0), Array.tabulate(5)(i => v * 100.0 + i))
    }
    NetCDF4.write(path, dims = Seq(Dim("x", 5)), vars = vars)
    assert(hasSig(path, "FRHP"), "auto-dense did not engage above 8 links")
    val m = NetCDF4.open(path)
    assert(m.vars.map(_.name).sorted == (0 until 12).map(v => f"v$v%02d"))
    (0 until 12).foreach { v =>
      assert(NetCDF4.readSlab(path, m.varByName(f"v$v%02d"), 0L, 5).toSeq ==
        Array.tabulate(5)(i => v * 100.0 + i).toSeq, s"var v$v")
    }
  }

  test("dense distributed export reads back through the DSv2 path") {
    val df = spark.range(0, 1000)
      .select((0 until 10).map(j =>
        (col("id") * (j + 1)).cast("double").as(f"c$j%02d")): _*)
    val path = tmp("dense_dist")
    NetCDF4.writeTableDistributed(df, path, chunkRows = 256)
    assert(hasSig(path, "FRHP"), "11 root links should auto-dense")
    val back = spark.read.format("netcdf4").load(path)
    assert(back.count() == 1000)
    val s = back.agg(sum(col("c09")).cast("long")).head.getLong(0)
    assert(s == (0L until 1000L).map(_ * 10).sum)
  }

  /**
   * Hand-built spec fixture for the reader paths our writer never
   * emits but libhdf5 does: a fractal heap whose ROOT is an INDIRECT
   * block (2 rows x width 4, two allocated direct blocks,
   * unchecksummed), and a DEPTH-1 v2 B-tree (internal node + two
   * leaves, records living at both levels). Three links ("alpha",
   * "beta", "gamma") all point at one contiguous dataset OH.
   */
  test("reader walks root-indirect heaps and depth-1 v2 B-trees") {
    val Undef = -1L
    final class B {
      val o = new java.io.ByteArrayOutputStream
      def u8(v: Int): B = { o.write(v & 0xFF); this }
      def u16(v: Int): B = { u8(v); u8(v >> 8) }
      def u32(v: Long): B = { u16(v.toInt); u16((v >> 16).toInt) }
      def u64(v: Long): B = { u32(v); u32(v >> 32) }
      def raw(b: Array[Byte]): B = { o.write(b); this }
      def str(s: String): B = raw(s.getBytes("US-ASCII"))
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
    // --- addresses (computed bottom-up, asserted during assembly)
    val sbAt = 0L; val rootOhAt = 48L; val dsOhAt = 96L
    val frhpAt = 200L; val fhibAt = 346L
    val blockAAt = 432L; val blockBAt = 944L
    val bthdAt = 1456L; val btinAt = 1494L
    val leaf1At = 1533L; val leaf2At = 1554L

    // dataset OH: 1-D [1] f8, contiguous never-allocated (fill only)
    val dsOh = ohV1(Seq(
      0x0001 -> new B().u8(1).u8(1).u8(0).u8(0).u32(0).u64(1L).bytes,
      0x0003 -> new B().u8(0x11).u8(0x20).u8(0x3F).u8(0x00).u32(8)
        .u16(0).u16(64).u8(52).u8(11).u8(0).u8(52).u32(1023).bytes,
      0x0008 -> new B().u8(3).u8(1).u64(Undef).u64(8L).bytes))
    assert(dsOh.length <= 104, s"dataset OH grew to ${dsOh.length}")

    def linkBody(name: String, oh: Long): Array[Byte] =
      new B().u8(1).u8(0).u8(name.length).str(name).u64(oh).bytes
    val names = Seq("alpha", "beta", "gamma")
    val bodies = names.map(n => linkBody(n, dsOhAt))
    // alpha+beta in block A (heap offsets 17, 17+16); gamma in block B
    // (block offset 512 -> first object at heap offset 529)
    val heapOff = Map("alpha" -> 17L, "beta" -> 33L, "gamma" -> 529L)
    def heapId(n: String): Array[Byte] = {
      val len = bodies(names.indexOf(n)).length
      new B().u8(0).u32(heapOff(n)).u16(len).bytes
    }
    val hashes = names.map(n =>
      n -> (Hdf5.lookup3(n.getBytes("US-ASCII")).toLong & 0xFFFFFFFFL)).toMap
    val byHash = names.sortBy(hashes)

    val img = new B
    // superblock v2: ver, offSz, lenSz, flags, base, ext, eof, root OH
    img.raw(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    img.u8(2).u8(8).u8(8).u8(0).u64(0).u64(Undef).u64(2000L).u64(rootOhAt)
    img.u32(0) // checksum (reader does not verify)
    img.pad(rootOhAt.toInt)
    // root OH: one Link Info message
    img.raw(ohV1(Seq(
      0x0002 -> new B().u8(0).u8(0).u64(frhpAt).u64(bthdAt).bytes)))
    img.pad(dsOhAt.toInt)
    img.raw(dsOh)
    img.pad(frhpAt.toInt)
    // FRHP: width 4, start 512, max direct 64K, 32-bit heap, flags 0
    // (UNchecksummed direct blocks -> 17-byte FHDB headers), root is
    // the indirect block with 2 current rows
    img.u8('F').u8('R').u8('H').u8('P').u8(0)
      .u16(7).u16(0).u8(0).u32(4096)
      .u64(0).u64(Undef).u64(0).u64(Undef)
      .u64(1024).u64(1024).u64(1024).u64(3)
      .u64(0).u64(0).u64(0).u64(0)
      .u16(4).u64(512).u64(65536).u16(32).u16(2)
      .u64(fhibAt).u16(2).u32(0)
    assert(img.o.size == frhpAt + 146, s"FRHP size drift: ${img.o.size}")
    img.pad(fhibAt.toInt)
    // FHIB: 2 rows x 4 entries; only (0,0) and (0,1) allocated
    img.u8('F').u8('H').u8('I').u8('B').u8(0).u64(frhpAt).u32(0)
    img.u64(blockAAt).u64(blockBAt).u64(Undef).u64(Undef)
    img.u64(Undef).u64(Undef).u64(Undef).u64(Undef)
    img.u32(0) // checksum
    img.pad(blockAAt.toInt)
    // direct block A: heap space [0, 512), objects at 17 and 33
    img.u8('F').u8('H').u8('D').u8('B').u8(0).u64(frhpAt).u32(0)
    assert(img.o.size == blockAAt + 17)
    img.raw(bodies(0)).raw(bodies(1))
    img.pad((blockAAt + 512).toInt)
    // direct block B: heap space [512, 1024), object at 529
    img.u8('F').u8('H').u8('D').u8('B').u8(0).u64(frhpAt).u32(512)
    assert(img.o.size == blockBAt + 17)
    img.raw(bodies(2))
    img.pad(bthdAt.toInt)
    // BTHD: type 5, node 512, record 11, DEPTH 1, 1 record in root
    img.u8('B').u8('T').u8('H').u8('D').u8(0).u8(5)
      .u32(512).u16(11).u16(1).u8(100).u8(40)
      .u64(btinAt).u16(1).u64(3).u32(0)
    assert(img.o.size == bthdAt + 38)
    img.pad(btinAt.toInt)
    // BTIN: middle record + two child pointers (1-byte nrec each)
    img.u8('B').u8('T').u8('I').u8('N').u8(0).u8(5)
    img.u32(hashes(byHash(1))).raw(heapId(byHash(1)))
    img.u64(leaf1At).u8(1)
    img.u64(leaf2At).u8(1)
    img.u32(0) // checksum
    assert(img.o.size == btinAt + 39)
    img.pad(leaf1At.toInt)
    img.u8('B').u8('T').u8('L').u8('F').u8(0).u8(5)
    img.u32(hashes(byHash(0))).raw(heapId(byHash(0))).u32(0)
    assert(img.o.size == leaf1At + 21)
    img.pad(leaf2At.toInt)
    img.u8('B').u8('T').u8('L').u8('F').u8(0).u8(5)
    img.u32(hashes(byHash(2))).raw(heapId(byHash(2))).u32(0)
    img.pad(2000)

    val path = tmp("dense_fixture")
    java.nio.file.Files.write(java.nio.file.Paths.get(path), img.bytes)
    val f = Hdf5.open(path)
    assert(f.datasets.map(_.name) == Seq("alpha", "beta", "gamma"),
      s"got ${f.datasets.map(_.name)}")
    assert(f.datasets.forall(_.shape == Seq(1L)))
  }

  test("fuzz: flipped bytes in dense metadata never crash undiagnosed") {
    import NetCDF3.Dim
    val path = tmp("dense_fuzz")
    NetCDF4.write(path, dims = Seq(Dim("x", 4)),
      vars = (0 until 10).map(v => (s"f$v", Seq(0),
        Array.tabulate(4)(_.toDouble + v))),
      denseGroups = true)
    val orig = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val rng = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val mutated = orig.clone()
      val i = rng.nextInt(mutated.length)
      mutated(i) = (mutated(i) ^ (1 << rng.nextInt(8))).toByte
      val p2 = tmp("dense_fuzz_mut")
      java.nio.file.Files.write(java.nio.file.Paths.get(p2), mutated)
      try { Hdf5.open(p2); () }
      catch {
        case _: Exception => () // catchable failure is the contract
      }
      new java.io.File(p2).delete()
    }
  }
}
