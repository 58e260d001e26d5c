package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable.ArrayBuffer

/**
 * Pure-JVM HDF5 subset — the carrier format of NetCDF-4 — implemented
 * from the public HDF5 File Format Specification. The reference's
 * importnc consumes NetCDF-4 archives through libnetcdf/libhdf5
 * (out-of-repo framework; the server knows the operator only by objkey,
 * `/root/reference/src/oph_json/oph_json_objkeys.h:114`); this module
 * gives the Spark engine a native read/write path with zero native
 * dependencies.
 *
 * Supported on READ (what netcdf-c/h5py emit with default "earliest"
 * compatibility, plus the common 1.8+ variants):
 *  - superblock v0/v1 (symbol-table root) and v2/v3 (direct root OH);
 *  - object headers v1 (with continuations) and v2 ("OHDR"/"OCHK");
 *  - old-style groups: v1 B-tree -> SNOD -> local heap, any depth,
 *    and new-style compact groups (Link messages);
 *  - datatypes: fixed-point 1/2/4/8 signed/unsigned, IEEE float 4/8,
 *    both endiannesses; fixed strings; object references; vlen;
 *  - dataspaces v1/v2; layouts: contiguous and chunked v3 with a
 *    v1 B-tree chunk index (any depth);
 *  - filters: deflate (zlib), shuffle, fletcher32, szip
 *    (CCSDS 121 Rice — see Szip.scala), n-bit, and scale+offset
 *    (bit-packing — see Hdf5Packed.scala), in pipeline order;
 *  - attributes v1/v2/v3, including vlen-of-object-reference
 *    (DIMENSION_LIST) resolved through the global heap.
 *
 * WRITE emits a netCDF-4-shaped file: superblock v0, one root group
 * (symbol table), one dataset per dimension (a dimension scale with
 * CLASS/NAME/_Netcdf4Dimid attributes) and per variable (chunked +
 * deflate, DIMENSION_LIST wired through a global heap collection).
 *
 * Scale note: `open` touches only metadata (superblock, object
 * headers, B-tree nodes — KBs); `readSlab` reads ONLY the chunks
 * intersecting the requested cell range, so a distributed scan reads
 * each chunk exactly once across partitions and never inflates data
 * outside its own range. Unsupported structures fail with a named
 * FormatError, never a silent wrong answer.
 */
object Hdf5 {

  final class FormatError(msg: String) extends Exception(msg)

  private val Undef = -1L // 0xFFFF...FF: the spec's undefined address
  private def defined(a: Long): Boolean = a != Undef

  // datatype classes (spec section IV)
  val ClassFixed = 0; val ClassFloat = 1; val ClassString = 3
  val ClassReference = 7; val ClassVlen = 9

  final case class Dtype(clazz: Int, size: Int, littleEndian: Boolean,
      signed: Boolean, base: Option[Dtype] = None)

  sealed trait Layout
  /** addr == Undef: storage never allocated (all fill). */
  final case class Contiguous(addr: Long, size: Long) extends Layout
  /** Layout class 0: the raw element bytes live INLINE in the object
    * header message (spec caps compact storage at 64 KiB — h5py and
    * netCDF-c emit it for tiny datasets, e.g. scalar attributes
    * promoted to datasets and short coordinate vars). */
  final case class Compact(data: Array[Byte]) extends Layout
  /** `index`: how chunk (origin → address) records are stored. 0 = v1
    * B-tree (layout message v3, what netCDF-4 writers emit by default);
    * the rest are layout-message-v4 "latest" indexes: 1 = single chunk,
    * 2 = implicit (dense address arithmetic), 3 = fixed array,
    * 5 = version-2 B-tree. `chunkSize0` carries the single-chunk
    * filtered size; `noFilterPartial` mirrors the v4
    * DONT_FILTER_PARTIAL_BOUND_CHUNKS flag (rejected when filters are
    * present — edge chunks would decode wrongly). */
  final case class Chunked(btree: Long, chunkDims: Seq[Int],
      index: Int = 0, chunkSize0: Long = -1L,
      noFilterPartial: Boolean = false) extends Layout

  final case class Filter(id: Int, client: Seq[Int]) // 1=deflate 2=shuffle

  final case class Attr(name: String, text: String, numbers: Seq[Double],
      refs: Seq[Long])

  final case class Dataset(name: String, addr: Long, shape: Seq[Long],
      dtype: Dtype, layout: Layout, filters: Seq[Filter], attrs: Seq[Attr]) {
    def attr(n: String): Option[Attr] = attrs.find(_.name == n)
    def cells: Long = shape.product max 1L
  }

  final case class File(path: String, rootAttrs: Seq[Attr],
      datasets: Seq[Dataset])

  def isHdf5(path: String): Boolean = {
    val f = new RandomAccessFile(path, "r")
    try {
      if (f.length < 8) return false
      val m = new Array[Byte](8)
      f.readFully(m)
      m.sameElements(Signature)
    } finally f.close()
  }

  private val Signature =
    Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n')

  // ============================================================ READ

  /** One open file: wraps the RandomAccessFile with little-endian
    * primitive reads (HDF5 metadata is little-endian throughout). */
  private final class In(val f: RandomAccessFile) {
    def seek(p: Long): Unit = f.seek(p)
    def pos: Long = f.getFilePointer
    def bytes(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); f.readFully(b); b
    }
    def u8(): Int = f.readUnsignedByte()
    def u16(): Int = { val b = bytes(2); (b(0) & 0xFF) | ((b(1) & 0xFF) << 8) }
    def u32(): Long = {
      val b = bytes(4)
      (b(0) & 0xFFL) | ((b(1) & 0xFFL) << 8) | ((b(2) & 0xFFL) << 16) |
        ((b(3) & 0xFFL) << 24)
    }
    def u64(): Long = {
      val b = bytes(8); var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (b(i) & 0xFFL); i -= 1 }
      v
    }
  }

  def open(path: String): File = {
    val in = new In(new RandomAccessFile(path, "r"))
    try {
      val rootOh = readSuperblock(in, path)
      val sets = ArrayBuffer.empty[Dataset]
      val rootMsgs = readObjectHeader(in, rootOh)
      val rootAttrs = rootMsgs.collect { case (0x000C, d) => parseAttr(in, d) }
      // walk the root group's children; nested groups flatten with a
      // '/'-joined name (netCDF-4 group hierarchy). The visited set
      // terminates crafted link cycles (group -> itself).
      val visited = scala.collection.mutable.Set.empty[Long]
      def walkGroup(ohAddr: Long, prefix: String): Unit = {
        if (!visited.add(ohAddr))
          throw new FormatError(s"$path: group link cycle @$ohAddr")
        val msgs = if (ohAddr == rootOh) rootMsgs else readObjectHeader(in, ohAddr)
        val links = groupLinks(in, msgs, path)
        links.foreach { case (name, child) =>
          val childMsgs = readObjectHeader(in, child)
          if (childMsgs.exists(_._1 == 0x0011) ||
              childMsgs.exists(_._1 == 0x0006) ||
              childMsgs.exists(_._1 == 0x0002))
            walkGroup(child, prefix + name + "/")
          else
            sets += parseDataset(in, prefix + name, child, childMsgs, path)
        }
      }
      walkGroup(rootOh, "")
      File(path, rootAttrs, sets.toSeq)
    } finally in.f.close()
  }

  /** Returns the root group object header address. */
  private def readSuperblock(in: In, path: String): Long = {
    if (in.f.length < 8) throw new FormatError(s"$path: not an HDF5 file")
    in.seek(0)
    if (!in.bytes(8).sameElements(Signature))
      throw new FormatError(s"$path: not an HDF5 file")
    val version = in.u8()
    version match {
      case 0 | 1 =>
        in.u8(); in.u8(); in.u8() // free-space / root-group / reserved
        in.u8() // shared-header-message version
        val offSz = in.u8(); val lenSz = in.u8()
        if (offSz != 8 || lenSz != 8)
          throw new FormatError(
            s"$path: offsets/lengths of $offSz/$lenSz bytes not supported")
        in.u8() // reserved
        in.u16(); in.u16() // group leaf K, group internal K
        in.u32() // consistency flags
        if (version == 1) { in.u16(); in.u16() } // indexed-storage K + res
        val base = in.u64()
        if (base != 0) throw new FormatError(s"$path: non-zero base address")
        in.u64(); in.u64(); in.u64() // free-space, EOF, driver-info
        // root group symbol-table entry: link name offset, OH address
        in.u64()
        in.u64()
      case 2 | 3 =>
        val offSz = in.u8(); val lenSz = in.u8()
        if (offSz != 8 || lenSz != 8)
          throw new FormatError(
            s"$path: offsets/lengths of $offSz/$lenSz bytes not supported")
        in.u8() // consistency flags
        val base = in.u64()
        if (base != 0) throw new FormatError(s"$path: non-zero base address")
        in.u64(); in.u64() // extension address, EOF
        in.u64() // root OH address comes next
      case v => throw new FormatError(s"$path: superblock version $v")
    }
  }

  /** All (type, data) messages of an object header, v1 or v2,
    * following continuation blocks. */
  private def readObjectHeader(in: In, addr: Long): Seq[(Int, Array[Byte])] = {
    in.seek(addr)
    val sig = in.bytes(4)
    if (sig.sameElements("OHDR".getBytes)) readOhV2(in, addr)
    else readOhV1(in, addr)
  }

  private def readOhV1(in: In, addr: Long): Seq[(Int, Array[Byte])] = {
    in.seek(addr)
    val version = in.u8()
    if (version != 1)
      throw new FormatError(s"object header @$addr: version $version")
    in.u8()
    val nMsgs = in.u16()
    in.u32() // reference count
    val firstSize = in.u32()
    in.u32() // pad to 8-byte alignment: messages start at addr+16
    val msgs = ArrayBuffer.empty[(Int, Array[Byte])]
    // nMsgs counts EVERY message incl. NIL and continuations
    var parsed = 0
    // (start, length) message blocks; continuations append more
    val seen = scala.collection.mutable.Set.empty[Long]
    var blocks = List((addr + 16, firstSize))
    while (parsed < nMsgs && blocks.nonEmpty) {
      val (start, len) = blocks.head
      blocks = blocks.tail
      if (!seen.add(start) || seen.size > MaxBlocks)
        throw new FormatError(s"object header @$addr: continuation cycle")
      in.seek(start)
      val end = start + len
      while (parsed < nMsgs && in.pos + 8 <= end) {
        val t = in.u16(); val sz = in.u16(); in.u8(); in.bytes(3)
        val data = in.bytes(sz)
        parsed += 1
        if (t == 0x0010) { // continuation: (offset, length)
          val b = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
          blocks = blocks :+ ((b.getLong, b.getLong))
        } else if (t != 0x0000) msgs += ((t, data))
      }
    }
    msgs.toSeq
  }

  // hostile-input bounds: a crafted file must fail with a catchable
  // FormatError, never an unbounded loop, recursion, or allocation
  private val MaxBlocks = 4096        // OH continuation blocks
  private val MaxBtreeDepth = 64      // B-tree recursion
  private val MaxChunkBytes = 1L << 30 // stored or inflated chunk size
  private val MaxNameBytes = 1 << 16  // heap string length

  private def readOhV2(in: In, addr: Long): Seq[(Int, Array[Byte])] = {
    in.seek(addr + 4)
    val version = in.u8()
    if (version != 2)
      throw new FormatError(s"OHDR @$addr: version $version")
    val flags = in.u8()
    if ((flags & 0x20) != 0) { in.u32(); in.u32(); in.u32(); in.u32() }
    if ((flags & 0x10) != 0) { in.u16(); in.u16() }
    val chunk0 = (flags & 0x3) match {
      case 0 => in.u8().toLong
      case 1 => in.u16().toLong
      case 2 => in.u32()
      case _ => in.u64()
    }
    val creationOrder = (flags & 0x4) != 0
    val msgs = ArrayBuffer.empty[(Int, Array[Byte])]
    // (start, end) of message runs. Chunk-0 size EXCLUDES the trailing
    // 4-byte checksum (unlike a continuation block's length, which
    // covers its OCHK signature and checksum) — libhdf5/jHDF agree.
    // visited-set + cap: crafted continuation cycles must terminate
    val seen = scala.collection.mutable.Set.empty[Long]
    var blocks = List((in.pos, in.pos + chunk0))
    while (blocks.nonEmpty) {
      val (start, end) = blocks.head
      blocks = blocks.tail
      if (!seen.add(start) || seen.size > MaxBlocks)
        throw new FormatError(s"OHDR @$addr: continuation cycle")
      in.seek(start)
      // a message header is 4 bytes (+2 creation order)
      val hdr = if (creationOrder) 6 else 4
      while (in.pos + hdr <= end) {
        val t = in.u8(); val sz = in.u16(); in.u8()
        if (creationOrder) in.u16()
        val data = in.bytes(sz)
        if (t == 0x10) {
          val b = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
          val off = b.getLong; val len = b.getLong
          // continuation block: "OCHK" signature + messages + checksum
          blocks = blocks :+ ((off + 4, off + len - 4))
        } else if (t != 0x0000) msgs += ((t, data))
      }
    }
    msgs.toSeq
  }

  /** (name, object header address) pairs of a group's children, from
    * either a symbol-table message (old-style) or Link messages. */
  private def groupLinks(in: In, msgs: Seq[(Int, Array[Byte])],
      path: String): Seq[(String, Long)] = {
    msgs.find(_._1 == 0x0011) match {
      case Some((_, d)) =>
        val b = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
        val btree = b.getLong; val heap = b.getLong
        val out = ArrayBuffer.empty[(String, Long)]
        walkGroupBtree(in, btree, heap, out)
        out.toSeq
      case None =>
        val links = msgs.filter(_._1 == 0x0006).map { case (_, d) =>
          parseLink(d)
        }
        if (links.isEmpty)
          msgs.find(_._1 == 0x0002) match {
            case Some((_, d)) => denseLinks(in, d, path)
            case None => links
          }
        else links
    }
  }

  /** Dense ("new style") group storage: past ~8 links netcdf-c/libhdf5
    * switch from compact Link messages to a fractal heap holding the
    * link-message bodies plus a v2 B-tree (record type 5) indexing
    * them by name hash — the layout of any real CMIP-style file with
    * many variables. The Link Info message (0x0002) carries both
    * addresses. Spec: HDF5 File Format Spec III.D / III.A.2 / IV.A.2.c. */
  private def denseLinks(in: In, d: Array[Byte],
      path: String): Seq[(String, Long)] = {
    val b = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
    val ver = b.get() & 0xFF
    if (ver != 0) throw new FormatError(s"$path: link info version $ver")
    val flags = b.get() & 0xFF
    if ((flags & 1) != 0) b.getLong // max creation order index
    val fheap = b.getLong
    val nameIndex = b.getLong
    if (!defined(fheap) || !defined(nameIndex)) return Seq.empty
    val heap = readFractalHeap(in, fheap, path)
    // hash order is meaningless to callers; sort by name for the same
    // determinism the old-style (name-sorted B-tree) path gives
    walkV2Btree(in, nameIndex, path).map { rec =>
      parseLink(fetchManaged(in, heap, rec.drop(4), path))
    }.sortBy(_._1)
  }

  /** `offSize`/`lenSize`: byte widths of the offset/length halves of a
    * managed heap ID (derived from max heap size bits / max managed
    * object size, per spec). */
  private final case class FractalHeap(idLen: Int, flags: Int,
      width: Int, startSize: Long, maxDirectSize: Long, offSize: Int,
      lenSize: Int, rootAddr: Long, curRows: Int, filtered: Boolean)

  private def bytesFor(v: Long): Int = {
    var n = 1; var x = v >>> 8
    while (x != 0) { n += 1; x >>>= 8 }
    n
  }

  private def readFractalHeap(in: In, addr: Long,
      path: String): FractalHeap = {
    in.seek(addr)
    if (!in.bytes(4).sameElements("FRHP".getBytes))
      throw new FormatError(s"$path: bad fractal heap header @$addr")
    val ver = in.u8()
    if (ver != 0) throw new FormatError(s"$path: fractal heap version $ver")
    val idLen = in.u16()
    val filterLen = in.u16()
    val flags = in.u8()
    val maxManaged = in.u32()
    // next huge id, huge B-tree, free space, fs manager, managed
    // space, allocated, iterator offset, object count, huge/tiny
    // sizes+counts — 12 lengths/addresses we don't need for reading
    (0 until 12).foreach(_ => in.u64())
    val width = in.u16()
    val startSize = in.u64()
    val maxDirectSize = in.u64()
    val maxHeapBits = in.u16()
    in.u16() // starting rows in root indirect block
    val rootAddr = in.u64()
    val curRows = in.u16()
    FractalHeap(idLen, flags, width, startSize, maxDirectSize,
      (maxHeapBits + 7) / 8, bytesFor(maxManaged), rootAddr, curRows,
      filterLen > 0)
  }

  /** Bytes of one managed object given its heap ID (type byte +
    * variable-width heap offset + length). */
  private def fetchManaged(in: In, h: FractalHeap, id: Array[Byte],
      path: String): Array[Byte] = {
    if ((((id(0) & 0xFF) >> 4) & 0x3) != 0)
      throw new FormatError(
        s"$path: huge/tiny fractal heap objects not supported")
    var off = 0L
    (0 until h.offSize).foreach(i => off |= (id(1 + i) & 0xFFL) << (8 * i))
    var len = 0L
    (0 until h.lenSize).foreach(i =>
      len |= (id(1 + h.offSize + i) & 0xFFL) << (8 * i))
    in.seek(heapOffsetToAddr(in, h, off, path))
    in.bytes(len.toInt)
  }

  /** Heap-space offset -> file address, through the doubling table:
    * row 0 and 1 are `startSize` blocks, row i doubles; object offsets
    * land inside direct blocks (past their headers) by construction.
    * Root is either a single direct block (curRows == 0) or an
    * indirect block whose direct-row entries we index arithmetically.
    * Nested indirect rows would mean a multi-GB link heap — named
    * error, not silent truncation. */
  private def heapOffsetToAddr(in: In, h: FractalHeap, off: Long,
      path: String): Long = {
    if (h.filtered)
      throw new FormatError(s"$path: filtered fractal heap not supported")
    def directAddr(blockAddr: Long, blockOff: Long): Long = {
      in.seek(blockAddr)
      if (!in.bytes(4).sameElements("FHDB".getBytes))
        throw new FormatError(
          s"$path: bad fractal heap direct block @$blockAddr")
      blockAddr + (off - blockOff)
    }
    if (h.curRows == 0) return directAddr(h.rootAddr, 0L)
    def log2(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val maxDirectRows = log2(h.maxDirectSize) - log2(h.startSize) + 2
    def rowSize(r: Int): Long =
      if (r < 2) h.startSize else h.startSize << (r - 1)
    var row = 0; var rowStart = 0L
    while (off >= rowStart + h.width * rowSize(row)) {
      rowStart += h.width * rowSize(row); row += 1
      if (row > 64)
        throw new FormatError(s"$path: fractal heap offset $off out of range")
    }
    if (row >= maxDirectRows)
      throw new FormatError(
        s"$path: nested indirect fractal-heap blocks not supported")
    val col = ((off - rowStart) / rowSize(row)).toInt
    in.seek(h.rootAddr)
    if (!in.bytes(4).sameElements("FHIB".getBytes))
      throw new FormatError(
        s"$path: bad fractal heap indirect block @${h.rootAddr}")
    in.u8(); in.u64() // version, heap header address
    in.bytes(h.offSize) // block offset
    (0 until row * h.width + col).foreach(_ => in.u64())
    val blockAddr = in.u64()
    if (!defined(blockAddr))
      throw new FormatError(
        s"$path: fractal heap offset $off in an unallocated block")
    directAddr(blockAddr, rowStart + col.toLong * rowSize(row))
  }

  /** Jenkins lookup3 ("hashlittle", Bob Jenkins 2006, public domain) —
    * what HDF5 uses both as the metadata checksum of v2 structures
    * (fractal heap blocks, v2 B-tree nodes) and as the link-name hash
    * in dense-group B-tree records. */
  private[sources] def lookup3(data: Array[Byte], init: Int = 0): Int = {
    def rot(x: Int, k: Int): Int = Integer.rotateLeft(x, k)
    def word(o: Int, n: Int): Int = {
      var v = 0; var j = n - 1
      while (j >= 0) { v = (v << 8) | (data(o + j) & 0xFF); j -= 1 }
      v
    }
    var a = 0xdeadbeef + data.length + init
    var b = a; var c = a
    var i = 0; var len = data.length
    while (len > 12) {
      a += word(i, 4); b += word(i + 4, 4); c += word(i + 8, 4)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      i += 12; len -= 12
    }
    if (len > 0) {
      if (len >= 9) {
        c += word(i + 8, len - 8); b += word(i + 4, 4); a += word(i, 4)
      } else if (len >= 5) {
        b += word(i + 4, len - 4); a += word(i, 4)
      } else a += word(i, len)
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c
  }

  /** All records of a v2 B-tree (link-name index, record type 5:
    * 4-byte name hash + heap ID). Depth 0/1 cover any realistic link
    * count (a 512-byte node holds ~45 records -> depth 1 reaches
    * ~2000 links per group); deeper trees get a named error. */
  private def walkV2Btree(in: In, addr: Long,
      path: String): Seq[Array[Byte]] = {
    in.seek(addr)
    if (!in.bytes(4).sameElements("BTHD".getBytes))
      throw new FormatError(s"$path: bad v2 B-tree header @$addr")
    val ver = in.u8()
    if (ver != 0) throw new FormatError(s"$path: v2 B-tree version $ver")
    val btype = in.u8()
    if (btype != 5)
      throw new FormatError(
        s"$path: v2 B-tree record type $btype (expected link-name index)")
    val nodeSize = in.u32()
    val recSize = in.u16()
    val depth = in.u16()
    in.u8(); in.u8() // split / merge percent
    val rootAddr = in.u64()
    val rootNrec = in.u16()
    in.u64() // total record count
    val maxLeafRec = ((nodeSize - 10) / recSize).toInt
    val szNrec = bytesFor(maxLeafRec.toLong)
    val out = ArrayBuffer.empty[Array[Byte]]
    def leaf(a: Long, n: Int): Unit = {
      in.seek(a)
      if (!in.bytes(4).sameElements("BTLF".getBytes))
        throw new FormatError(s"$path: bad v2 B-tree leaf @$a")
      in.u8(); in.u8() // version, type
      (0 until n).foreach(_ => out += in.bytes(recSize))
    }
    depth match {
      case 0 => leaf(rootAddr, rootNrec)
      case 1 =>
        in.seek(rootAddr)
        if (!in.bytes(4).sameElements("BTIN".getBytes))
          throw new FormatError(
            s"$path: bad v2 B-tree internal node @$rootAddr")
        in.u8(); in.u8() // version, type
        // internal records carry real entries too; order is irrelevant
        (0 until rootNrec).foreach(_ => out += in.bytes(recSize))
        val ptrs = (0 to rootNrec).map { _ =>
          val a = in.u64()
          var n = 0L
          (0 until szNrec).foreach(i => n |= (in.u8() & 0xFFL) << (8 * i))
          (a, n.toInt)
        }
        ptrs.foreach { case (a, n) => leaf(a, n) }
      case d =>
        throw new FormatError(s"$path: v2 B-tree depth $d not supported")
    }
    out.toSeq
  }

  private def parseLink(d: Array[Byte]): (String, Long) = {
    val b = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
    val ver = b.get()
    if (ver != 1) throw new FormatError(s"link message version $ver")
    val flags = b.get() & 0xFF
    val ltype = if ((flags & 0x8) != 0) b.get() & 0xFF else 0
    if ((flags & 0x4) != 0) b.getLong // creation order
    if ((flags & 0x10) != 0) b.get() // charset
    val nameLen = (flags & 0x3) match {
      case 0 => b.get() & 0xFFL
      case 1 => b.getShort() & 0xFFFFL
      case 2 => b.getInt() & 0xFFFFFFFFL
      case _ => b.getLong
    }
    val name = new Array[Byte](nameLen.toInt); b.get(name)
    if (ltype != 0) throw new FormatError("only hard links supported")
    (new String(name, "UTF-8"), b.getLong)
  }

  private def walkGroupBtree(in: In, nodeAddr: Long, heap: Long,
      out: ArrayBuffer[(String, Long)], depth: Int = 0): Unit = {
    if (depth > MaxBtreeDepth)
      throw new FormatError(s"group B-tree @$nodeAddr: depth/cycle bound hit")
    in.seek(nodeAddr)
    if (!in.bytes(4).sameElements("TREE".getBytes))
      throw new FormatError(s"bad group B-tree node @$nodeAddr")
    val ntype = in.u8(); val level = in.u8(); val used = in.u16()
    if (ntype != 0) throw new FormatError(s"B-tree node type $ntype in group")
    in.u64(); in.u64() // siblings
    // keys (heap offsets) alternate with children: k0 c0 k1 c1 ... kN
    val children = (0 until used).map { _ => in.u64(); in.u64() }
    children.foreach { child =>
      if (level > 0) walkGroupBtree(in, child, heap, out, depth + 1)
      else readSnod(in, child, heap, out)
    }
  }

  private def readSnod(in: In, addr: Long, heap: Long,
      out: ArrayBuffer[(String, Long)]): Unit = {
    in.seek(addr)
    if (!in.bytes(4).sameElements("SNOD".getBytes))
      throw new FormatError(s"bad symbol node @$addr")
    in.u8(); in.u8()
    val n = in.u16()
    val entries = (0 until n).map { _ =>
      val nameOff = in.u64(); val oh = in.u64()
      in.u32(); in.u32(); in.bytes(16) // cache type, reserved, scratch
      (nameOff, oh)
    }
    entries.foreach { case (nameOff, oh) =>
      out += ((heapString(in, heap, nameOff), oh))
    }
  }

  /** NUL-terminated name at `offset` inside the local heap at `heap`. */
  private def heapString(in: In, heap: Long, offset: Long): String = {
    in.seek(heap)
    if (!in.bytes(4).sameElements("HEAP".getBytes))
      throw new FormatError(s"bad local heap @$heap")
    in.u8(); in.bytes(3)
    in.u64(); in.u64()
    val dataAddr = in.u64()
    in.seek(dataAddr + offset)
    val sb = new ArrayBuffer[Byte]
    var b = in.u8()
    while (b != 0) {
      sb += b.toByte
      if (sb.length > MaxNameBytes)
        throw new FormatError(s"local heap @$heap: unterminated name")
      b = in.u8()
    }
    new String(sb.toArray, "UTF-8")
  }

  // -------------------------------------------------- message parsing

  private def parseDataset(in: In, name: String, addr: Long,
      msgs: Seq[(Int, Array[Byte])], path: String): Dataset = {
    var shape: Seq[Long] = Seq.empty
    var dtype: Option[Dtype] = None
    var layout: Option[Layout] = None
    var filters: Seq[Filter] = Seq.empty
    val attrs = ArrayBuffer.empty[Attr]
    msgs.foreach {
      case (0x0001, d) => shape = parseDataspace(d)
      case (0x0003, d) =>
        dtype = Some(parseDatatype(ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)))
      case (0x0008, d) => layout = Some(parseLayout(d, path))
      case (0x000B, d) => filters = parseFilters(d)
      case (0x000C, d) => attrs += parseAttr(in, d)
      case _ => ()
    }
    Dataset(name, addr, shape,
      dtype.getOrElse(throw new FormatError(s"$name: no datatype message")),
      layout.getOrElse(throw new FormatError(s"$name: no layout message")),
      filters, attrs.toSeq)
  }

  private def parseDataspace(d: Array[Byte]): Seq[Long] = {
    val b = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
    val ver = b.get()
    val rank = b.get() & 0xFF
    ver match {
      case 1 => b.get(); b.get(); b.getInt() // flags + reserved(5)
      case 2 => b.get(); b.get() // flags, type
      case v => throw new FormatError(s"dataspace version $v")
    }
    (0 until rank).map(_ => b.getLong)
  }

  private def parseDatatype(b: ByteBuffer): Dtype = {
    val cv = b.get() & 0xFF
    val clazz = cv & 0x0F
    val bits0 = b.get() & 0xFF; b.get(); b.get()
    val size = b.getInt()
    clazz match {
      case ClassFixed =>
        Dtype(clazz, size, littleEndian = (bits0 & 1) == 0,
          signed = (bits0 & 0x08) != 0)
      case ClassFloat =>
        Dtype(clazz, size, littleEndian = (bits0 & 1) == 0, signed = true)
      case ClassString | ClassReference =>
        Dtype(clazz, size, littleEndian = true, signed = false)
      case ClassVlen =>
        // properties = the base datatype message
        val base = parseDatatype(b)
        Dtype(clazz, size, littleEndian = true, signed = false, Some(base))
      case c => throw new FormatError(s"datatype class $c not supported")
    }
  }

  private def parseLayout(d: Array[Byte], path: String): Layout = {
    val b = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
    val ver = b.get()
    if (ver != 3 && ver != 4)
      throw new FormatError(s"$path: data layout version $ver (need 3 or 4)")
    // bound the per-chunk allocation a crafted header could demand
    def checkDims(chunkDims: Seq[Int]): Seq[Int] = {
      val cells = chunkDims.foldLeft(1L)((a, d) =>
        if (d <= 0 || a > MaxChunkBytes) MaxChunkBytes + 1 else a * d)
      if (chunkDims.exists(_ <= 0) || cells * 8 > MaxChunkBytes)
        throw new FormatError(s"$path: implausible chunk dims $chunkDims")
      chunkDims
    }
    (b.get() & 0xFF) match {
      case 0 => // compact: size(2) + inline data (same v3/v4 encoding)
        val size = b.getShort() & 0xFFFF
        if (size > b.remaining())
          throw new FormatError(s"$path: compact layout claims $size " +
            s"bytes, message holds ${b.remaining()}")
        val data = new Array[Byte](size)
        b.get(data)
        Compact(data)
      case 1 => Contiguous(b.getLong, b.getLong)
      case 2 if ver == 3 =>
        val dims = b.get() & 0xFF // rank + 1
        val btree = b.getLong
        val cd = (0 until dims).map(_ => b.getInt)
        Chunked(btree, checkDims(cd.dropRight(1))) // last = element size
      case 2 =>
        // layout v4 ("latest" compat): per-index-type chunk storage
        val flags = b.get() & 0xFF
        val ndims = b.get() & 0xFF // rank + 1, element size last (as v3)
        val encLen = b.get() & 0xFF
        if (encLen < 1 || encLen > 8)
          throw new FormatError(s"$path: layout v4 dim encoding $encLen")
        def dimVal(): Long = {
          var v = 0L; var i = 0
          while (i < encLen) { v |= (b.get() & 0xFFL) << (8 * i); i += 1 }
          v
        }
        val dims = Seq.fill(ndims)(dimVal())
        val chunkDims = checkDims(dims.dropRight(1).map(_.toInt))
        val noFilterPartial = (flags & 0x1) != 0
        (b.get() & 0xFF) match {
          case 1 => // single chunk; filtered variant carries size + mask
            val sz = if ((flags & 0x2) != 0) {
              val s = b.getLong; b.getInt; s
            } else -1L
            Chunked(b.getLong, chunkDims, index = 1, chunkSize0 = sz,
              noFilterPartial = noFilterPartial)
          case 2 => // implicit: dense unfiltered chunks, pure arithmetic
            Chunked(b.getLong, chunkDims, index = 2,
              noFilterPartial = noFilterPartial)
          case 3 => // fixed array
            b.get() // page bits (paged data blocks rejected at read)
            Chunked(b.getLong, chunkDims, index = 3,
              noFilterPartial = noFilterPartial)
          case 5 => // version-2 B-tree
            b.getInt; b.get(); b.get() // node size/split/merge (in BTHD too)
            Chunked(b.getLong, chunkDims, index = 5,
              noFilterPartial = noFilterPartial)
          case t => throw new FormatError(
            s"$path: chunk index type $t not supported")
        }
      case c => throw new FormatError(s"$path: layout class $c")
    }
  }

  private def parseFilters(d: Array[Byte]): Seq[Filter] = {
    val b = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
    val ver = b.get()
    val n = b.get() & 0xFF
    if (ver == 1) { b.getShort(); b.getInt() } // reserved(6)
    (0 until n).map { _ =>
      val id = b.getShort() & 0xFFFF
      val nameLen =
        if (ver == 1 || id >= 256) b.getShort() & 0xFFFF else 0
      b.getShort() // flags
      val nVals = b.getShort() & 0xFFFF
      if (nameLen > 0) {
        val padded = if (ver == 1) (nameLen + 7) & ~7 else nameLen
        b.position(b.position() + padded)
      }
      val vals = (0 until nVals).map(_ => b.getInt)
      if (ver == 1 && nVals % 2 == 1) b.getInt // pad to 8
      Filter(id, vals)
    }
  }

  private def parseAttr(in: In, d: Array[Byte]): Attr = {
    val b = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
    val ver = b.get() & 0xFF
    def pad8(n: Int) = (n + 7) & ~7
    val (nameSize, dtSize, dsSize, padded) = ver match {
      case 1 => // ver, reserved, name/dt/ds sizes; parts padded to 8
        b.get()
        (b.getShort() & 0xFFFF, b.getShort() & 0xFFFF, b.getShort() & 0xFFFF,
          true)
      case 2 => // ver, flags, sizes; parts NOT padded
        b.get()
        (b.getShort() & 0xFFFF, b.getShort() & 0xFFFF, b.getShort() & 0xFFFF,
          false)
      case 3 => // v2 + a name-encoding byte
        b.get()
        val ns = b.getShort() & 0xFFFF; val dt = b.getShort() & 0xFFFF
        val ds = b.getShort() & 0xFFFF
        b.get() // name character-set encoding
        (ns, dt, ds, false)
      case v => throw new FormatError(s"attribute version $v")
    }
    val nameB = new Array[Byte](nameSize); b.get(nameB)
    if (padded) b.position(b.position() + (pad8(nameSize) - nameSize))
    val name = new String(nameB, "UTF-8").takeWhile(_ != 0)
    val dtB = new Array[Byte](dtSize); b.get(dtB)
    if (padded) b.position(b.position() + (pad8(dtSize) - dtSize))
    val dtype = parseDatatype(ByteBuffer.wrap(dtB).order(ByteOrder.LITTLE_ENDIAN))
    val dsB = new Array[Byte](dsSize); b.get(dsB)
    if (padded) b.position(b.position() + (pad8(dsSize) - dsSize))
    val n = parseDataspace(dsB).product max 1L
    // bound attr payload allocation against crafted size/count fields
    if (dtype.size < 0 || n < 0 || dtype.size.toLong * n > (1L << 26))
      throw new FormatError(s"attribute $name: implausible size")
    dtype.clazz match {
      case ClassString =>
        val t = new Array[Byte](dtype.size * n.toInt); b.get(t)
        Attr(name, new String(t, "UTF-8").takeWhile(_ != 0), Seq.empty, Seq.empty)
      case ClassFixed | ClassFloat =>
        val raw = new Array[Byte](dtype.size * n.toInt); b.get(raw)
        Attr(name, "", decode(raw, dtype, n.toInt), Seq.empty)
      case ClassReference =>
        val refs = (0L until n).map(_ => b.getLong)
        Attr(name, "", Seq.empty, refs)
      case ClassVlen if dtype.base.exists(_.clazz == ClassReference) =>
        // each element: count(4), global-heap collection(8), index(4)
        val refs = (0L until n).flatMap { _ =>
          val cnt = b.getInt; val gcol = b.getLong; val idx = b.getInt
          readGlobalHeapRefs(in, gcol, idx, cnt)
        }
        Attr(name, "", Seq.empty, refs)
      case _ => Attr(name, "", Seq.empty, Seq.empty)
    }
  }

  /** The object at `index` in the global-heap collection at `addr`,
    * interpreted as `count` 8-byte object references. */
  private def readGlobalHeapRefs(in: In, addr: Long, index: Int,
      count: Int): Seq[Long] = {
    val save = in.pos
    try {
      in.seek(addr)
      if (!in.bytes(4).sameElements("GCOL".getBytes))
        throw new FormatError(s"bad global heap @$addr")
      in.u8(); in.bytes(3)
      val size = in.u64()
      val end = addr + size
      while (in.pos + 16 <= end) {
        val idx = in.u16(); in.u16(); in.u32()
        val objSize = in.u64()
        if (idx == index) {
          val b = ByteBuffer.wrap(in.bytes(8 * count))
            .order(ByteOrder.LITTLE_ENDIAN)
          return (0 until count).map(_ => b.getLong)
        }
        if (idx == 0) return Seq.empty // free space: end of objects
        in.seek(in.pos + ((objSize + 7) & ~7L))
      }
      Seq.empty
    } finally in.seek(save)
  }

  private def decode(raw: Array[Byte], t: Dtype, n: Int): Seq[Double] = {
    val b = ByteBuffer.wrap(raw)
      .order(if (t.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    (0 until n).map { _ =>
      t.clazz match {
        case ClassFloat if t.size == 4 => b.getFloat.toDouble
        case ClassFloat if t.size == 8 => b.getDouble
        case ClassFixed => t.size match {
          case 1 => val v = b.get(); if (t.signed) v.toDouble else (v & 0xFF).toDouble
          case 2 => val v = b.getShort(); if (t.signed) v.toDouble else (v & 0xFFFF).toDouble
          case 4 => val v = b.getInt(); if (t.signed) v.toDouble else (v & 0xFFFFFFFFL).toDouble
          case 8 => b.getLong.toDouble
          case s => throw new FormatError(s"fixed-point size $s")
        }
        case c => throw new FormatError(s"cannot decode class $c to double")
      }
    }
  }

  // ----------------------------------------------------- data reading

  /** All chunks of a chunked dataset: (origin coords, file addr,
    * stored byte size). Metadata-only walk of the chunk index — the v1
    * B-tree for classic files, or the layout-v4 "latest" structures
    * (single chunk / implicit / fixed array / v2 B-tree). */
  def chunkIndex(path: String, ds: Dataset): Seq[(Seq[Long], Long, Int)] = {
    val ch = ds.layout match {
      case c: Chunked => c
      case _ => return Seq.empty
    }
    val unfilteredBytes = ch.chunkDims.map(_.toLong).product * ds.dtype.size
    if (unfilteredBytes > MaxChunkBytes)
      throw new FormatError(s"${ds.name}: chunk bytes $unfilteredBytes")
    if (ch.noFilterPartial && ds.filters.nonEmpty)
      throw new FormatError(s"${ds.name}: unfiltered partial edge chunks " +
        "(DONT_FILTER_PARTIAL_BOUND_CHUNKS) not supported with filters")
    val in = new In(new RandomAccessFile(path, "r"))
    try {
      val out = ArrayBuffer.empty[(Seq[Long], Long, Int)]
      if (defined(ch.btree)) ch.index match {
        case 0 => walkChunkBtree(in, ch.btree, ds.shape.size, out)
        case 1 => // single chunk at the recorded address
          val sz = if (ch.chunkSize0 >= 0) ch.chunkSize0 else unfilteredBytes
          if (sz > MaxChunkBytes)
            throw new FormatError(s"${ds.name}: single chunk size $sz")
          out += ((Seq.fill(ds.shape.size)(0L), ch.btree, sz.toInt))
        case 2 => // implicit: dense row-major, address arithmetic only
          val grid = chunkGrid(ds, ch)
          val n = grid.product
          var i = 0L
          while (i < n) {
            out += ((originOf(i, grid, ch.chunkDims),
              ch.btree + i * unfilteredBytes, unfilteredBytes.toInt))
            i += 1
          }
        case 3 => walkFixedArray(in, ch, ds, unfilteredBytes, out)
        case 5 => walkChunkBtree2(in, ch, ds, unfilteredBytes, out)
        case t => throw new FormatError(s"${ds.name}: chunk index type $t")
      }
      out.toSeq
    } finally in.f.close()
  }

  /** Per-dimension chunk counts (row-major grid over the dataset). */
  private def chunkGrid(ds: Dataset, ch: Chunked): Seq[Long] =
    ds.shape.zip(ch.chunkDims).map { case (s, c) => (s + c - 1) / c }

  /** Element-space origin of the `i`-th chunk in the row-major grid. */
  private def originOf(i: Long, grid: Seq[Long],
      chunkDims: Seq[Int]): Seq[Long] = {
    val idx = new Array[Long](grid.size)
    var rem = i
    var d = grid.size - 1
    while (d >= 0) { idx(d) = rem % grid(d); rem /= grid(d); d -= 1 }
    idx.toSeq.zip(chunkDims).map { case (k, c) => k * c }
  }

  /** Fixed-array chunk index ("latest" fixed-shape datasets): FAHD
    * header + one FADB data block of direct elements. Paged data
    * blocks (element count past the page size) are declared
    * unsupported rather than misread. */
  private def walkFixedArray(in: In, ch: Chunked, ds: Dataset,
      unfilteredBytes: Long, out: ArrayBuffer[(Seq[Long], Long, Int)]): Unit = {
    in.seek(ch.btree)
    if (!in.bytes(4).sameElements("FAHD".getBytes))
      throw new FormatError(s"bad fixed-array header @${ch.btree}")
    in.u8() // version
    val clientId = in.u8() // 0 = unfiltered chunks, 1 = filtered
    if (clientId != 0 && clientId != 1)
      throw new FormatError(s"fixed array client $clientId not supported")
    val entrySize = in.u8()
    val pageBits = in.u8()
    val nElmts = in.u64()
    val dbAddr = in.u64()
    if (nElmts > (1L << 24))
      throw new FormatError(s"implausible fixed-array entry count $nElmts")
    if (!defined(dbAddr)) return
    in.seek(dbAddr)
    if (!in.bytes(4).sameElements("FADB".getBytes))
      throw new FormatError(s"bad fixed-array data block @$dbAddr")
    in.u8(); in.u8(); in.u64() // version, client id, header address
    val grid = chunkGrid(ds, ch)
    val szLen = entrySize - 8 - 4
    if (clientId == 1 && (szLen < 1 || szLen > 8))
      throw new FormatError(s"fixed array entry size $entrySize")
    if (clientId == 0 && entrySize != 8)
      throw new FormatError(s"fixed array entry size $entrySize for client 0")
    def readEntry(i: Long): Unit = {
      val addr = in.u64()
      val sz =
        if (clientId == 0) unfilteredBytes
        else {
          var s = 0L; var j = 0
          while (j < szLen) { s |= in.u8().toLong << (8 * j); j += 1 }
          in.u32() // filter mask
          s
        }
      if (sz > MaxChunkBytes)
        throw new FormatError(s"fixed array chunk size $sz")
      if (defined(addr))
        out += ((originOf(i, grid, ch.chunkDims), addr, sz.toInt))
    }
    val pageSize = 1L << math.min(pageBits, 30)
    if (nElmts <= pageSize) {
      var i = 0L
      while (i < nElmts) { readEntry(i); i += 1 }
    } else {
      // paged data block: page-initialization bitmask + prefix
      // checksum, then pages of elements (last truncated, the total is
      // fixed), each page trailed by its own checksum. Uninitialized
      // pages occupy file space but hold no allocated chunks.
      val npages = (nElmts + pageSize - 1) / pageSize
      if (npages > (1L << 20))
        throw new FormatError(s"fixed array page count $npages")
      val bitmask = in.bytes(((npages + 7) / 8).toInt)
      in.u32() // data-block prefix checksum (reader never validates)
      var p = 0L
      while (p < npages) {
        val inPage = math.min(pageSize, nElmts - p * pageSize).toInt
        val initd =
          (bitmask((p / 8).toInt) & (1 << (p % 8).toInt)) != 0
        if (initd) {
          var j = 0
          while (j < inPage) { readEntry(p * pageSize + j); j += 1 }
          in.u32() // page checksum
        } else in.seek(in.pos + inPage.toLong * entrySize + 4)
        p += 1
      }
    }
  }

  /** Version-2 B-tree chunk index (record types 10 = unfiltered,
    * 11 = filtered): BTHD header, BTLF leaves, BTIN internal nodes at
    * any depth. Child-pointer field widths follow the H5B2 node-
    * capacity recursion from the public spec: the record-count field
    * is sized for the LEAF maximum (the fullest node kind), and each
    * internal child pointer carries a cumulative-total field sized by
    * that level's maximum subtree record count. */
  private def walkChunkBtree2(in: In, ch: Chunked, ds: Dataset,
      unfilteredBytes: Long, out: ArrayBuffer[(Seq[Long], Long, Int)]): Unit = {
    in.seek(ch.btree)
    if (!in.bytes(4).sameElements("BTHD".getBytes))
      throw new FormatError(s"bad v2 B-tree header @${ch.btree}")
    in.u8() // version
    val btype = in.u8()
    if (btype != 10 && btype != 11)
      throw new FormatError(s"v2 B-tree record type $btype is not a chunk index")
    val nodeSize = in.u32()
    val recSize = in.u16()
    val depth = in.u16()
    in.u8(); in.u8() // split / merge percents
    val rootAddr = in.u64()
    val rootNrec = in.u16()
    in.u64() // total records
    if (!defined(rootAddr)) return
    if (depth > MaxBtreeDepth)
      throw new FormatError(s"v2 B-tree chunk index depth $depth")
    val rank = ds.shape.size
    val szLen = recSize - 8 - 4 - 8 * rank // filtered records only
    if (btype == 10 && recSize != 8 + 8 * rank)
      throw new FormatError(s"v2 B-tree record size $recSize for rank $rank")
    if (btype == 11 && (szLen < 1 || szLen > 8))
      throw new FormatError(s"v2 B-tree filtered record size $recSize")
    if (nodeSize <= 10 || recSize <= 0)
      throw new FormatError(s"v2 B-tree node size $nodeSize")
    def bytesFor(v: Long): Int = {
      var b = 1
      while (b < 8 && (1L << (8 * b)) <= v) b += 1
      b
    }
    // metadata prefix = sig(4) + version(1) + type(1) + checksum(4)
    val leafMax = (nodeSize - 10) / recSize
    if (leafMax <= 0)
      throw new FormatError(s"v2 B-tree leaf capacity 0 (node $nodeSize)")
    val nrecBytes = bytesFor(leafMax) // hdr max_nrec_size: leaf is fullest
    // cumSize(u): bytes of the cumulative-total field for a child at
    // level u (present in its parent's pointer when u > 0)
    val cumSize = new Array[Int](math.max(depth, 1))
    var cumMax: Long = leafMax
    cumSize(0) = bytesFor(cumMax)
    var u = 1
    while (u < depth) {
      val ptr = 8 + nrecBytes + cumSize(u - 1)
      val maxRec = (nodeSize - 10 - ptr) / (recSize + ptr)
      if (maxRec <= 0)
        throw new FormatError(s"v2 B-tree internal capacity 0 at level $u")
      cumMax = (maxRec + 1) * cumMax + maxRec
      cumSize(u) = bytesFor(cumMax)
      u += 1
    }
    def readRecord(): Unit = {
      val addr = in.u64()
      val sz =
        if (btype == 10) unfilteredBytes
        else {
          var s = 0L; var j = 0
          while (j < szLen) { s |= in.u8().toLong << (8 * j); j += 1 }
          in.u32() // filter mask
          s
        }
      val scaled = Seq.fill(rank)(in.u64())
      if (sz > MaxChunkBytes) throw new FormatError(s"v2 B-tree chunk size $sz")
      if (defined(addr))
        out += ((scaled.zip(ch.chunkDims).map { case (s, c) => s * c },
          addr, sz.toInt))
    }
    var visited = 0L
    def walkNode(addr: Long, nrec: Int, level: Int): Unit = {
      visited += 1
      if (visited > (1L << 22))
        throw new FormatError("v2 B-tree node count exceeds sanity bound")
      in.seek(addr)
      val sig = in.bytes(4)
      val want = if (level == 0) "BTLF" else "BTIN"
      if (!sig.sameElements(want.getBytes))
        throw new FormatError(s"bad v2 B-tree node @$addr (want $want)")
      in.u8() // version
      if (in.u8() != btype)
        throw new FormatError(s"v2 B-tree node type mismatch @$addr")
      if (nrec > leafMax + 1)
        throw new FormatError(s"v2 B-tree node @$addr holds $nrec records")
      (0 until nrec).foreach(_ => readRecord())
      if (level > 0) {
        // child pointers follow the records: address + record count
        // (+ subtree total when the child is itself internal)
        val children = (0 to nrec).map { _ =>
          val a = in.u64()
          var n = 0L; var j = 0
          while (j < nrecBytes) { n |= in.u8().toLong << (8 * j); j += 1 }
          if (level - 1 > 0) {
            var k = 0
            while (k < cumSize(level - 1)) { in.u8(); k += 1 } // subtree total
          }
          (a, n)
        }
        children.foreach { case (a, n) =>
          if (defined(a)) walkNode(a, n.toInt, level - 1)
        }
      }
    }
    walkNode(rootAddr, rootNrec, depth)
  }

  private def walkChunkBtree(in: In, nodeAddr: Long, rank: Int,
      out: ArrayBuffer[(Seq[Long], Long, Int)], depth: Int = 0): Unit = {
    if (depth > MaxBtreeDepth)
      throw new FormatError(s"chunk B-tree @$nodeAddr: depth/cycle bound hit")
    in.seek(nodeAddr)
    if (!in.bytes(4).sameElements("TREE".getBytes))
      throw new FormatError(s"bad chunk B-tree node @$nodeAddr")
    val ntype = in.u8(); val level = in.u8(); val used = in.u16()
    if (ntype != 1) throw new FormatError(s"B-tree node type $ntype for chunks")
    in.u64(); in.u64()
    // entries: key_i (size,mask,offsets[rank+1]) then child_i; +final key
    val entries = (0 until used).map { _ =>
      val szL = in.u32(); in.u32()
      if (szL > MaxChunkBytes)
        throw new FormatError(s"chunk B-tree @$nodeAddr: stored size $szL")
      val offs = (0 to rank).map(_ => in.u64()).dropRight(1)
      val child = in.u64()
      (offs, child, szL.toInt)
    }
    entries.foreach { case (offs, child, sz) =>
      if (level > 0) walkChunkBtree(in, child, rank, out, depth + 1)
      else out += ((offs, child, sz))
    }
  }

  /** Chunk reads+decodes since JVM start — the observable behind the
    * any-axis subset-pruning I/O audit: a local-mode test resets it,
    * runs a pruned scan, and asserts fewer chunks were inflated than a
    * full scan costs. One increment per chunk fetched off disk. */
  val chunkDecodes = new java.util.concurrent.atomic.AtomicLong

  /** Fetch one chunk's stored bytes and run the filter pipeline in
    * reverse application order, returning the decoded cell buffer.
    * Shared by [[readSlab]] and [[readBox]]. */
  private def readDecodeChunk(f: RandomAccessFile, ds: Dataset,
      chDims: Seq[Int], es: Int, addr: Long,
      storedSize: Int): ByteBuffer = {
    chunkDecodes.incrementAndGet()
    f.seek(addr)
    var raw = new Array[Byte](storedSize)
    f.readFully(raw)
    // Filters apply in reverse pipeline order on read. When
    // fletcher32 PRECEDES deflate in the pipeline (the h5py /
    // netcdf-c default), the deflated payload still carries
    // the 4-byte checksum: inflate must expect it, and the
    // checksum is verified before the strip.
    val fl = ds.filters
    var stage = fl.size
    while (stage > 0) {
      stage -= 1
      val flt = fl(stage)
      raw = flt.id match {
        case 1 =>
          val extra = 4 * fl.take(stage).count(_.id == 3)
          // a packing filter BELOW deflate (nbit/scaleoffset
          // applied before it on write) makes the inflated
          // size data-dependent — inflate to completion
          // instead of to the full chunk size
          if (fl.take(stage).exists(f => f.id == 5 || f.id == 6))
            inflateAll(raw,
              chDims.map(_.toLong).product.toInt * es + extra +
                graft.sources.ScaleOffset.PayloadOff)
          else inflate(raw,
            chDims.map(_.toLong).product.toInt * es + extra)
        case 2 => unshuffle(raw, flt.client.headOption.getOrElse(es))
        case 3 => fletcherStrip(raw, ds.name)
        case 4 =>
          // H5Zszip prepends the ORIGINAL byte count as a
          // 4-byte little-endian header before the szip
          // stream; pixels = original bytes / sample size
          if (raw.length < 4)
            throw new FormatError(s"${ds.name}: szip chunk " +
              s"of ${raw.length} bytes has no size header")
          val origBytes = ((raw(0) & 0xFFL) | ((raw(1) & 0xFFL) << 8) |
            ((raw(2) & 0xFFL) << 16) | ((raw(3) & 0xFFL) << 24)).toInt
          val bps = Szip.params(flt.client, ds.name).bytesPerSample
          Szip.decode(java.util.Arrays.copyOfRange(raw, 4, raw.length),
            flt.client, origBytes / bps, ds.name)
        case 5 => graft.sources.Nbit.decode(raw, flt.client,
          ds.dtype, ds.name)
        case 6 => graft.sources.ScaleOffset.decode(raw, flt.client,
          ds.dtype, ds.name)
        case id => throw new FormatError(s"filter $id not supported")
      }
    }
    ByteBuffer.wrap(raw)
      .order(if (ds.dtype.littleEndian) ByteOrder.LITTLE_ENDIAN
             else ByteOrder.BIG_ENDIAN)
  }

  /** Read `count` cells from flat row-major cell `start`, decoded to
    * doubles. Chunked reads touch only the intersecting chunks. */
  def readSlab(path: String, ds: Dataset, start: Long, count: Int,
      fill: Double = 0.0): Array[Double] = {
    val out = Array.fill(count)(fill)
    val es = ds.dtype.size
    if (es < 1 || es > 8)
      throw new FormatError(s"${ds.name}: element size $es not readable")
    ds.layout match {
      case Compact(data) =>
        // inline bytes (≤64 KiB by spec): no file I/O at all
        if ((start + count) * es > data.length)
          throw new FormatError(s"${ds.name}: compact slab " +
            s"[$start,+$count)×$es beyond ${data.length} inline bytes")
        val raw = java.util.Arrays.copyOfRange(data,
          (start * es).toInt, ((start + count) * es).toInt)
        val vals = decode(raw, ds.dtype, count)
        var i = 0; while (i < count) { out(i) = vals(i); i += 1 }
      case Contiguous(addr, _) =>
        if (!defined(addr)) return out // never-allocated: all fill
        val f = new RandomAccessFile(path, "r")
        try {
          f.seek(addr + start * es)
          val raw = new Array[Byte](count * es)
          f.readFully(raw)
          val vals = decode(raw, ds.dtype, count)
          var i = 0; while (i < count) { out(i) = vals(i); i += 1 }
        } finally f.close()
      case ch: Chunked =>
        val shape = ds.shape
        val rank = shape.size
        val strides = new Array[Long](rank) // row-major flat strides
        var s = 1L
        var d = rank - 1
        while (d >= 0) { strides(d) = s; s *= shape(d); d -= 1 }
        val end = start + count
        val chunks = chunkIndex(path, ds)
        val f = new RandomAccessFile(path, "r")
        try {
          chunks.foreach { case (origin, addr, storedSize) =>
            // flat range this chunk covers (loose bound: first..last cell)
            val first = (0 until rank).map(i => origin(i) * strides(i)).sum
            val chDims = ch.chunkDims
            val lastCoord = (0 until rank).map(i =>
              math.min(origin(i) + chDims(i) - 1, shape(i) - 1))
            val last = (0 until rank).map(i => lastCoord(i) * strides(i)).sum
            if (last >= start && first < end) {
              val bb = readDecodeChunk(f, ds, chDims, es, addr, storedSize)
              // row-block chunks (trailing dims full-width — what
              // netCDF writers emit) are CONTIGUOUS in the flat index:
              // bulk-copy the overlap without per-cell coordinate math
              val rowBlock = (1 until rank).forall(i =>
                chDims(i).toLong == shape(i))
              if (rowBlock) {
                val cells = chDims.map(_.toLong).product
                val lo = math.max(first, start)
                val hi = math.min(first + cells, end)
                var flat = lo
                while (flat < hi) {
                  out((flat - start).toInt) =
                    cellAt(bb, ds.dtype, (flat - first).toInt)
                  flat += 1
                }
              } else {
                // general case: walk the chunk's cells in row-major
                // order, mapping each to its global flat index
                val local = new Array[Long](rank)
                val cells = chDims.map(_.toLong).product
                var c = 0L
                while (c < cells) {
                  var flat = 0L; var inBounds = true
                  var i = 0
                  while (i < rank) {
                    val g = origin(i) + local(i)
                    if (g >= shape(i)) inBounds = false
                    flat += g * strides(i)
                    i += 1
                  }
                  if (inBounds && flat >= start && flat < end)
                    out((flat - start).toInt) = cellAt(bb, ds.dtype, c.toInt)
                  // advance row-major within the chunk
                  var k = rank - 1
                  var carry = true
                  while (k >= 0 && carry) {
                    local(k) += 1
                    if (local(k) == chDims(k)) local(k) = 0 else carry = false
                    k -= 1
                  }
                  c += 1
                }
              }
            }
          }
        } finally f.close()
    }
    out
  }

  /** Read a hyper-rectangle of the dataset — `lens(i)` cells starting
    * at `origin(i)` along each axis — decoded to doubles in row-major
    * BOX order. This is the I/O path behind any-axis subset pruning:
    * a chunked layout reads and decodes ONLY the chunks intersecting
    * the box (mirroring the reference's in-engine subset pushdown,
    * `/root/reference/src/oph_subset_library.h:35` applied at
    * `src/oph_filters.c:223`, but at the chunk-grid level), while a
    * contiguous layout reads only the box's runs. Cells of chunks the
    * file never allocated read as `fill`, like [[readSlab]]. */
  def readBox(path: String, ds: Dataset, origin: Seq[Long],
      lens: Seq[Int], fill: Double = 0.0): Array[Double] = {
    val shape = ds.shape
    val rank = shape.size
    require(origin.size == rank && lens.size == rank,
      s"${ds.name}: box rank ${origin.size}/${lens.size} vs dataset rank $rank")
    require((0 until rank).forall(i => origin(i) >= 0 && lens(i) >= 0 &&
      origin(i) + lens(i) <= shape(i)),
      s"${ds.name}: box $origin+$lens outside shape $shape")
    if (rank == 0) return readSlab(path, ds, 0, 1, fill)
    val cellsL = lens.map(_.toLong).product
    require(cellsL <= Int.MaxValue, s"${ds.name}: box of $cellsL cells")
    val cells = cellsL.toInt
    val out = Array.fill(cells)(fill)
    if (cells == 0) return out
    val es = ds.dtype.size
    if (es < 1 || es > 8)
      throw new FormatError(s"${ds.name}: element size $es not readable")
    // row-major strides of the box (destination indexing)
    val boxStrides = new Array[Long](rank)
    locally {
      var s = 1L; var d = rank - 1
      while (d >= 0) { boxStrides(d) = s; s *= lens(d); d -= 1 }
    }
    ds.layout match {
      case Compact(data) =>
        // whole dataset is already in memory: decode once, gather the
        // box with an odometer over global flat indexes
        val strides = new Array[Long](rank)
        locally {
          var s = 1L; var d = rank - 1
          while (d >= 0) { strides(d) = s; s *= shape(d); d -= 1 }
        }
        val total = shape.product
        if (total * es > data.length)
          throw new FormatError(s"${ds.name}: compact data " +
            s"${data.length}B < ${total}×$es")
        val vals = decode(data, ds.dtype, total.toInt)
        val idx = new Array[Int](rank)
        var dst = 0
        while (dst < cells) {
          var flat = 0L; var i = 0
          while (i < rank) { flat += (origin(i) + idx(i)) * strides(i); i += 1 }
          out(dst) = vals(flat.toInt)
          var j = rank - 1; var carry = true
          while (j >= 0 && carry) {
            idx(j) += 1
            if (idx(j) == lens(j)) idx(j) = 0 else carry = false
            j -= 1
          }
          dst += 1
        }
      case Contiguous(addr, _) =>
        if (!defined(addr)) return out
        // contiguous runs: merge trailing axes the box covers fully,
        // then one seek+read per outer coordinate tuple
        val strides = new Array[Long](rank)
        locally {
          var s = 1L; var d = rank - 1
          while (d >= 0) { strides(d) = s; s *= shape(d); d -= 1 }
        }
        var k = rank - 1
        while (k >= 0 && origin(k) == 0 && lens(k).toLong == shape(k)) k -= 1
        val runLen =
          if (k < 0) cellsL
          else lens(k).toLong * strides(k)
        // a run is read and decoded as one byte array: the byte size
        // must fit Int (planned partitions stay far below this; a
        // direct caller with a pathological box fails loudly here)
        require(runLen * es <= Int.MaxValue,
          s"${ds.name}: box run of $runLen cells exceeds a single read")
        val runAxis = math.max(k, 0)
        val f = new RandomAccessFile(path, "r")
        try {
          val outerIdx = new Array[Int](runAxis) // axes 0..runAxis-1
          var dst = 0L
          var more = true
          while (more && dst < cells) {
            var flat = origin(runAxis) * strides(runAxis)
            var i = 0
            while (i < runAxis) {
              flat += (origin(i) + outerIdx(i)) * strides(i); i += 1
            }
            f.seek(addr + flat * es)
            val raw = new Array[Byte]((runLen * es).toInt)
            f.readFully(raw)
            val vals = decode(raw, ds.dtype, runLen.toInt)
            System.arraycopy(vals, 0, out, dst.toInt, runLen.toInt)
            dst += runLen
            // odometer over the outer axes
            var j = runAxis - 1
            var carry = true
            while (j >= 0 && carry) {
              outerIdx(j) += 1
              if (outerIdx(j) == lens(j)) outerIdx(j) = 0 else carry = false
              j -= 1
            }
            more = runAxis > 0 && !carry
          }
        } finally f.close()
      case ch: Chunked =>
        val chDims = ch.chunkDims
        val chunks = chunkIndex(path, ds)
        val f = new RandomAccessFile(path, "r")
        try chunks.foreach { case (corigin, addr, storedSize) =>
          // chunk box ∩ requested box, clipped to the shape
          val lo = new Array[Long](rank); val hi = new Array[Long](rank)
          var empty = false
          var i = 0
          while (i < rank) {
            lo(i) = math.max(corigin(i), origin(i))
            hi(i) = math.min(math.min(corigin(i) + chDims(i),
              origin(i) + lens(i)), shape(i))
            if (lo(i) >= hi(i)) empty = true
            i += 1
          }
          if (!empty) {
            val bb = readDecodeChunk(f, ds, chDims, es, addr, storedSize)
            // chunk-local strides (row-major over chDims)
            val chStrides = new Array[Long](rank)
            var s = 1L; var d = rank - 1
            while (d >= 0) { chStrides(d) = s; s *= chDims(d); d -= 1 }
            // copy the intersection; the innermost axis is contiguous
            // in both chunk and box, so it runs as the inner loop
            val innerN = (hi(rank - 1) - lo(rank - 1)).toInt
            val idx = new Array[Long](rank - 1) // offsets on outer axes
            var more = true
            while (more) {
              var src = (lo(rank - 1) - corigin(rank - 1))
              var dstL = (lo(rank - 1) - origin(rank - 1))
              var j = 0
              while (j < rank - 1) {
                src += (lo(j) + idx(j) - corigin(j)) * chStrides(j)
                dstL += (lo(j) + idx(j) - origin(j)) * boxStrides(j)
                j += 1
              }
              var t = 0
              while (t < innerN) {
                out((dstL + t).toInt) =
                  cellAt(bb, ds.dtype, (src + t).toInt)
                t += 1
              }
              var j2 = rank - 2
              var carry = true
              while (j2 >= 0 && carry) {
                idx(j2) += 1
                if (lo(j2) + idx(j2) == hi(j2)) idx(j2) = 0
                else carry = false
                j2 -= 1
              }
              more = rank > 1 && !carry
            }
          }
        } finally f.close()
    }
    out
  }

  private def cellAt(b: ByteBuffer, t: Dtype, i: Int): Double = t.clazz match {
    case ClassFloat if t.size == 4 => b.getFloat(i * 4).toDouble
    case ClassFloat if t.size == 8 => b.getDouble(i * 8)
    case ClassFixed => t.size match {
      case 1 => val v = b.get(i); if (t.signed) v.toDouble else (v & 0xFF).toDouble
      case 2 => val v = b.getShort(i * 2); if (t.signed) v.toDouble else (v & 0xFFFF).toDouble
      case 4 => val v = b.getInt(i * 4); if (t.signed) v.toDouble else (v & 0xFFFFFFFFL).toDouble
      case 8 => b.getLong(i * 8).toDouble
      case s => throw new FormatError(s"fixed-point size $s")
    }
    case c => throw new FormatError(s"cannot decode class $c")
  }

  private def inflate(raw: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(raw)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val n = inf.inflate(out, off, expected - off)
      // needsDictionary: a crafted zlib header with FDICT set makes
      // Inflater stall at 0 bytes without needing input — without this
      // check the loop would spin forever instead of failing catchably
      if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
        throw new FormatError("truncated or dictionary-requiring deflate chunk")
      off += n
    }
    inf.end()
    if (off != expected)
      throw new FormatError(s"deflate chunk: got $off of $expected bytes")
    out
  }

  /** Inflate to completion with `cap` as a sanity bound — for payloads
    * whose unfiltered size is data-dependent (a packing filter below
    * deflate in the pipeline). */
  private def inflateAll(raw: Array[Byte], cap: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(raw)
    val out = new Array[Byte](cap)
    var off = 0
    while (!inf.finished()) {
      if (off >= cap)
        throw new FormatError(s"deflate chunk exceeds $cap-byte bound")
      val n = inf.inflate(out, off, cap - off)
      if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
        throw new FormatError("truncated or dictionary-requiring deflate chunk")
      off += n
    }
    inf.end()
    java.util.Arrays.copyOf(out, off)
  }

  /** HDF5's Fletcher-32 over big-endian 16-bit words (H5checksum.c —
    * 360-word inner blocks before each modular reduction). Public
    * algorithm; the stored checksum trails the data little-endian. */
  private[sources] def fletcher32(data: Array[Byte], len: Int): Long = {
    var sum1 = 0L; var sum2 = 0L
    var i = 0
    var rem = len / 2
    while (rem > 0) {
      var tlen = math.min(rem, 360)
      rem -= tlen
      while (tlen > 0) {
        sum1 += (((data(i) & 0xFF) << 8) | (data(i + 1) & 0xFF)).toLong
        i += 2
        sum2 += sum1
        tlen -= 1
      }
      sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
      sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    }
    if ((len & 1) == 1) {
      sum1 += (data(i) & 0xFF).toLong << 8
      sum2 += sum1
      sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
      sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    }
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    (sum2 << 16) | sum1
  }

  /** Verify and strip the trailing fletcher32 checksum of a chunk. */
  private def fletcherStrip(raw: Array[Byte], what: String): Array[Byte] = {
    if (raw.length < 4)
      throw new FormatError(s"$what: fletcher32 chunk under 4 bytes")
    val n = raw.length - 4
    val stored = (raw(n) & 0xFFL) | ((raw(n + 1) & 0xFFL) << 8) |
      ((raw(n + 2) & 0xFFL) << 16) | ((raw(n + 3) & 0xFFL) << 24)
    val calc = fletcher32(raw, n)
    if (calc != stored)
      throw new FormatError(
        f"$what: fletcher32 mismatch (stored 0x$stored%08x, computed 0x$calc%08x)")
    java.util.Arrays.copyOf(raw, n)
  }

  private def unshuffle(raw: Array[Byte], es: Int): Array[Byte] = {
    if (es <= 1) return raw
    val n = raw.length / es
    val out = new Array[Byte](raw.length)
    var b = 0
    while (b < es) {
      var i = 0
      while (i < n) { out(i * es + b) = raw(b * n + i); i += 1 }
      b += 1
    }
    // H5Zshuffle leaves a non-multiple-of-es tail unshuffled: copy it
    var t = n * es
    while (t < raw.length) { out(t) = raw(t); t += 1 }
    out
  }
}
