package graft.sources

import graft.SparkSpec
import java.io.{ByteArrayOutputStream, FileOutputStream}

/**
 * Reader coverage for the HDF5 1.8+ structures the in-repo writer
 * does not emit: superblock v3, version-2 object headers ("OHDR"),
 * and new-style compact groups (Link messages). Real libraries write
 * these when created with "latest" compatibility, so the reader must
 * walk them; the fixture below is hand-assembled from the public
 * spec, byte by byte, and carries one contiguous dataset reachable
 * only through an OHDR root with a hard Link message.
 */
class Hdf5V2Spec extends SparkSpec {

  /** Little-endian byte builder (mirror of the writer's internal B). */
  private final class B {
    val o = new ByteArrayOutputStream
    def u8(v: Int): B = { o.write(v & 0xFF); this }
    def u16(v: Int): B = { u8(v); u8(v >> 8) }
    def u32(v: Long): B = { u16(v.toInt); u16((v >> 16).toInt) }
    def u64(v: Long): B = { u32(v); u32(v >> 32) }
    def raw(b: Array[Byte]): B = { o.write(b); this }
    def str(s: String): B = raw(s.getBytes("UTF-8"))
    def size: Int = o.size
    def bytes: Array[Byte] = o.toByteArray
  }

  private val Undef = -1L

  /** v1 object header for the dataset (the mixed case: v2 root, v1
    * child — exactly what partially-upgraded files contain). */
  private def datasetOh(dataAddr: Long, n: Int): Array[Byte] = {
    def msg(b: B, t: Int, d: Array[Byte]): Unit = {
      val sz = (d.length + 7) & ~7
      b.u16(t).u16(sz).u8(0).u8(0).u8(0).u8(0)
      b.raw(d).raw(new Array[Byte](sz - d.length))
    }
    val ds = new B().u8(1).u8(1).u8(0).u8(0).u32(0).u64(n.toLong).bytes
    val dt = new B().u8(0x11).u8(0x20).u8(0x3F).u8(0x00).u32(8)
      .u16(0).u16(64).u8(52).u8(11).u8(0).u8(52).u32(1023).bytes
    val layout = new B().u8(3).u8(1).u64(dataAddr).u64(n.toLong * 8).bytes
    val body = new B()
    msg(body, 0x0001, ds); msg(body, 0x0003, dt); msg(body, 0x0008, layout)
    val bb = body.bytes
    new B().u8(1).u8(0).u16(3).u32(1).u32(bb.length).u32(0).raw(bb).bytes
  }

  /** v2 "OHDR" root group whose only content is a hard Link message
    * to the dataset. Checksum is a trailing 4 bytes the reader skips
    * (zeros here — the reader must not validate what it can't). */
  private def rootOhdr(linkName: String, target: Long): Array[Byte] = {
    val nb = linkName.getBytes("UTF-8")
    val link = new B().u8(1).u8(0x08 | 0x0) // version, flags: type present
      .u8(0) // link type: hard
      .u8(nb.length) // name length (flags&3 == 0 -> 1 byte)
      .raw(nb).u64(target).bytes
    val msgs = new B()
    msgs.u8(0x06).u16(link.length).u8(0).raw(link)
    val chunk0 = msgs.bytes
    new B().str("OHDR").u8(2).u8(0) // version 2, flags: 1-byte chunk0 size
      .u8(chunk0.length) // size of chunk 0 EXCLUDES the trailing checksum
      .raw(chunk0).u32(0).bytes // messages + (unvalidated) checksum
  }

  test("superblock v3 + OHDR root + Link message + contiguous dataset") {
    val n = 5
    // layout plan: superblock v3 (48 bytes) | dataset data | dataset OH | root OHDR
    val sbSize = 48L
    val dataAddr = sbSize
    val dsOhAddr = dataAddr + n * 8
    val dsOh = datasetOh(dataAddr, n)
    val rootAddr = dsOhAddr + dsOh.length
    val root = rootOhdr("temps", dsOhAddr)
    val eof = rootAddr + root.length

    val f = new B()
    f.raw(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    f.u8(3).u8(8).u8(8).u8(0) // version 3, offsets 8, lengths 8, flags
    f.u64(0).u64(Undef).u64(eof).u64(rootAddr)
    f.u32(0) // superblock checksum (not validated)
    assert(f.size == sbSize)
    val vals = Seq(1.5, -2.0, 3.25, 0.0, 99.75)
    vals.foreach(v => f.u64(java.lang.Double.doubleToLongBits(v)))
    f.raw(dsOh)
    f.raw(root)
    assert(f.size == eof)

    val path = java.io.File.createTempFile("hdf5v2", ".h5").getPath
    val os = new FileOutputStream(path)
    try os.write(f.bytes) finally os.close()

    assert(Hdf5.isHdf5(path))
    val file = Hdf5.open(path)
    assert(file.datasets.map(_.name) == Seq("temps"))
    val ds = file.datasets.head
    assert(ds.shape == Seq(5L))
    assert(ds.dtype.clazz == Hdf5.ClassFloat && ds.dtype.size == 8)
    assert(Hdf5.readSlab(path, ds, 0, 5).toSeq == vals)
    assert(Hdf5.readSlab(path, ds, 2, 2).toSeq == vals.slice(2, 4))
  }

  test("HDF5 parser survives byte-flip fuzzing: no hangs, loops, or Errors") {
    // the reader runs inside Spark tasks over files the engine did not
    // write — a corrupt or crafted file must fail with a catchable
    // Exception (FormatError/IO/runtime), never a JVM Error
    // (StackOverflow/OOM from unbounded recursion or allocation) and
    // never an unbounded loop (cycle guards in B-trees/continuations)
    val base = {
      val p = java.io.File.createTempFile("fuzzbase", ".nc4").getPath
      NetCDF4.write(p, Seq(NetCDF3.Dim("t", 40), NetCDF3.Dim("x", 5)),
        vars = Seq(
          ("t", Seq(0), Array.tabulate(40)(_.toDouble)),
          ("m", Seq(0, 1), Array.tabulate(200)(_ * 0.5)),
          ("p", Seq(0, 1), Array.tabulate(200)(_ * 2.0))),
        gatts = Seq("title" -> "fuzz fixture"), chunkCells = 64)
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    }
    val rnd = new scala.util.Random(42)
    var parsed = 0
    (1 to 300).foreach { _ =>
      val mutated = base.clone()
      // 1-4 byte flips anywhere, headers included
      (0 to rnd.nextInt(4)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val f = java.io.File.createTempFile("fuzz", ".nc4")
      java.nio.file.Files.write(f.toPath, mutated)
      try {
        val file = Hdf5.open(f.getPath)
        file.datasets.foreach { ds =>
          val n = math.min(ds.cells, 200L).toInt
          Hdf5.readSlab(f.getPath, ds, 0, n)
        }
        parsed += 1
      } catch {
        case _: Exception => () // catchable failure is the contract
      } finally f.delete()
    }
    // most single-byte flips land in data/padding: the file still parses
    assert(parsed > 50, s"only $parsed/300 mutants parsed — fixture broken?")
  }

  test("Link Info with unallocated heap reads as an empty group; " +
      "a bogus heap address is a NAMED error") {
    // a Link Info message (0x0002) with UNDEFINED fractal heap /
    // B-tree addresses is how libhdf5 stores a still-compact group
    // that has no links yet — a valid empty group, not an error
    def fileWith(fheap: Long, btree: Long): String = {
      val linkInfo = new B().u8(0).u8(0).u64(fheap).u64(btree).bytes
      val msgs = new B()
      msgs.u8(0x02).u16(linkInfo.length).u8(0).raw(linkInfo)
      val chunk0 = msgs.bytes
      val root = new B().str("OHDR").u8(2).u8(0)
        .u8(chunk0.length).raw(chunk0).u32(0).bytes
      val rootAddr = 48L
      val eof = rootAddr + root.length
      val f = new B()
      f.raw(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
      f.u8(3).u8(8).u8(8).u8(0)
      f.u64(0).u64(Undef).u64(eof).u64(rootAddr).u32(0)
      f.raw(root)
      val path = java.io.File.createTempFile("hdf5dense", ".h5").getPath
      val os = new FileOutputStream(path)
      try os.write(f.bytes) finally os.close()
      path
    }
    assert(Hdf5.open(fileWith(Undef, Undef)).datasets.isEmpty)
    // defined addresses pointing at garbage must diagnose, not crash
    val err = intercept[Hdf5.FormatError](Hdf5.open(fileWith(8L, 8L)))
    assert(err.getMessage.contains("fractal heap"))
  }
}
