package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

/**
 * NetCDF-4 — the netCDF data model carried in HDF5 — on top of the
 * pure-JVM [[Hdf5]] subset. Maps the public netCDF-4 on-disk
 * conventions to the same dims/vars/attributes view [[NetCDF3]]
 * exposes, so `oph_importnc` (`/root/reference/src/oph_json/
 * oph_json_objkeys.h:114`) transparently consumes both classic and
 * NetCDF-4 archives:
 *
 *  - a DIMENSION is a dataset tagged `CLASS="DIMENSION_SCALE"` with
 *    its id in `_Netcdf4Dimid`; a dim WITHOUT a coordinate variable
 *    carries the "This is a netCDF dimension but not a netCDF
 *    variable" sentinel in `NAME` (and no allocated storage);
 *  - a VARIABLE is any other dataset; its dims resolve through the
 *    `DIMENSION_LIST` attribute (vlen of object references to the
 *    scale datasets), with a shape-match fallback;
 *  - global attributes live on the root group's object header.
 *
 * `write` emits chunked + deflated variables — the layout that makes
 * NetCDF-4 worthwhile at scale — with real dimension scales and
 * DIMENSION_LIST references, one chunk per row-block so a distributed
 * reader decompresses only its own row range.
 */
object NetCDF4 {

  final case class V4Var(name: String, dimIds: Seq[Int], ds: Hdf5.Dataset)

  final case class Model(
      dims: Seq[NetCDF3.Dim],
      gatts: Seq[NetCDF3.Att],
      vars: Seq[V4Var]) {
    def dimLength(id: Int): Int = dims(id).length
    def shapeOf(v: V4Var): Seq[Int] = v.dimIds.map(dimLength)
    def varByName(n: String): V4Var = vars.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no variable '$n'"))
  }

  private val NotAVariable = "This is a netCDF dimension but not a netCDF variable"

  def isNc4(path: String): Boolean = Hdf5.isHdf5(path)

  def open(path: String): Model = {
    val f = Hdf5.open(path)
    val scales = f.datasets.filter(
      _.attr("CLASS").exists(_.text == "DIMENSION_SCALE"))
    // dim order: _Netcdf4Dimid when present, else file order
    val ordered = scales.zipWithIndex.sortBy { case (s, i) =>
      s.attr("_Netcdf4Dimid").flatMap(_.numbers.headOption)
        .map(_.toInt).getOrElse(i)
    }.map(_._1)
    val dims = ordered.map(s => NetCDF3.Dim(s.name,
      s.shape.headOption.getOrElse(0L).toInt))
    val idOfAddr: Map[Long, Int] =
      ordered.zipWithIndex.map { case (s, i) => s.addr -> i }.toMap
    def resolveDims(ds: Hdf5.Dataset): Seq[Int] = {
      val viaList = ds.attr("DIMENSION_LIST").map(_.refs.flatMap(idOfAddr.get))
        .filter(_.size == ds.shape.size)
      viaList.getOrElse {
        // fallback: greedy match of each axis extent against dim lengths
        var used = Set.empty[Int]
        ds.shape.map { n =>
          val id = dims.indices.find(i => dims(i).length == n && !used(i))
            .orElse(dims.indices.find(dims(_).length == n))
            .getOrElse(throw new Hdf5.FormatError(
              s"$path: ${ds.name}: no dimension of length $n"))
          used += id
          id
        }
      }
    }
    // symbol-table order is alphabetical; ascending object-header
    // address recovers creation (declaration) order
    val dataVars = f.datasets.filterNot(scales.contains).sortBy(_.addr)
      .map(ds => V4Var(ds.name, resolveDims(ds), ds))
    // a scale that IS a netCDF variable (coordinate variable)
    val coordVars = ordered.zipWithIndex.collect {
      case (s, i) if !s.attr("NAME").exists(_.text.startsWith(NotAVariable)) =>
        V4Var(s.name, Seq(i), s)
    }
    val gatts = f.rootAttrs.filterNot(_.name.startsWith("_Netcdf")).map(a =>
      NetCDF3.Att(a.name, if (a.text.nonEmpty) NetCDF3.NcChar else NetCDF3.NcDouble,
        a.text, a.numbers))
    Model(dims, gatts, coordVars ++ dataVars)
  }

  def readSlab(path: String, v: V4Var, start: Long, count: Int): Array[Double] =
    Hdf5.readSlab(path, v.ds, start, count)

  // =========================================================== WRITE

  private val Undef = -1L

  /** Mirror of [[NetCDF3.write]]: double variables over shared dims,
    * emitted as netCDF-4/HDF5. Variables are chunked by row-block and
    * deflated; dims with a same-named 1-D variable become coordinate
    * scales carrying that data, others are anonymous scales. */
  def write(path: String,
      dims: Seq[NetCDF3.Dim],
      vars: Seq[(String, Seq[Int], Array[Double])],
      gatts: Seq[(String, String)] = Seq.empty,
      deflateLevel: Int = 1,
      chunkCells: Int = 256 * 1024): Unit = {
    require(dims.forall(_.length > 0), "netcdf4: fixed dimensions only")

    // coordinate variables double as the dim's scale dataset
    val coordOf: Map[Int, (String, Seq[Int], Array[Double])] =
      dims.indices.flatMap { i =>
        vars.find(v => v._1 == dims(i).name && v._2 == Seq(i)).map(i -> _)
      }.toMap
    val plainVars = vars.filterNot(coordOf.values.toSet.contains)

    // ---- build every object's bytes with a two-pass address plan:
    // sizes first (no block's SIZE depends on an address), then
    // addresses by fixed order, then emission with addresses known.

    def pad8(n: Int): Int = (n + 7) & ~7

    final class B {
      val o = new ByteArrayOutputStream
      def u8(v: Int): B = { o.write(v & 0xFF); this }
      def u16(v: Int): B = { u8(v); u8(v >> 8) }
      def u32(v: Long): B = { u16(v.toInt); u16((v >> 16).toInt) }
      def u64(v: Long): B = { u32(v); u32(v >> 32) }
      def raw(b: Array[Byte]): B = { o.write(b); this }
      def str(s: String): B = raw(s.getBytes("UTF-8"))
      def padTo8(): B = { while (o.size % 8 != 0) u8(0); this }
      def bytes: Array[Byte] = o.toByteArray
    }

    def dtDouble: Array[Byte] = new B()
      .u8(0x11).u8(0x20).u8(0x3F).u8(0x00).u32(8)
      .u16(0).u16(64).u8(52).u8(11).u8(0).u8(52).u32(1023).bytes
    def dtInt: Array[Byte] =
      new B().u8(0x10).u8(0x08).u8(0).u8(0).u32(4).u16(0).u16(32).bytes
    def dtString(n: Int): Array[Byte] =
      new B().u8(0x13).u8(0).u8(0).u8(0).u32(n).bytes
    def dtRef: Array[Byte] =
      new B().u8(0x17).u8(0).u8(0).u8(0).u32(8).bytes
    def dtVlenRef: Array[Byte] =
      new B().u8(0x19).u8(0).u8(0).u8(0).u32(16).raw(dtRef).bytes
    def dsScalar: Array[Byte] =
      new B().u8(1).u8(0).u8(0).u8(0).u32(0).bytes
    def dsSimple(shape: Seq[Long]): Array[Byte] = {
      val b = new B().u8(1).u8(shape.size).u8(0).u8(0).u32(0)
      shape.foreach(b.u64)
      b.bytes
    }

    def attrMsg(name: String, dt: Array[Byte], ds: Array[Byte],
        data: Array[Byte]): Array[Byte] = {
      val nb = name.getBytes("UTF-8") :+ 0.toByte
      val b = new B().u8(1).u8(0).u16(nb.length).u16(dt.length).u16(ds.length)
      b.raw(nb); b.raw(new Array[Byte](pad8(nb.length) - nb.length))
      b.raw(dt); b.raw(new Array[Byte](pad8(dt.length) - dt.length))
      b.raw(ds); b.raw(new Array[Byte](pad8(ds.length) - ds.length))
      b.raw(data).bytes
    }
    def strAttr(name: String, v: String): Array[Byte] = {
      val vb = v.getBytes("UTF-8") :+ 0.toByte
      attrMsg(name, dtString(vb.length), dsScalar, vb)
    }
    def intAttr(name: String, v: Int): Array[Byte] =
      attrMsg(name, dtInt, dsScalar, new B().u32(v).bytes)

    /** v1 object header: prefix + 4-pad + messages (each padded to 8). */
    def objectHeader(msgs: Seq[(Int, Array[Byte])]): Array[Byte] = {
      val body = new B()
      msgs.foreach { case (t, d) =>
        val sz = pad8(d.length)
        body.u16(t).u16(sz).u8(0).u8(0).u8(0).u8(0)
        body.raw(d).raw(new Array[Byte](sz - d.length))
      }
      val bb = body.bytes
      new B().u8(1).u8(0).u16(msgs.size).u32(1).u32(bb.length).u32(0)
        .raw(bb).bytes
    }

    val fillMsg: Array[Byte] = new B().u8(2).u8(2).u8(2).u8(0).bytes

    // ---- chunk planning + compression (sizes needed for the layout)
    final case class VarPlan(name: String, dimIds: Seq[Int],
        shape: Seq[Long], chunkDims: Seq[Int],
        chunks: Seq[(Seq[Long], Array[Byte])]) // (origin, deflated bytes)

    def planVar(name: String, dimIds: Seq[Int], data: Array[Double]): VarPlan = {
      val shape = dimIds.map(dims(_).length.toLong)
      val rowCells = shape.drop(1).product max 1L
      val chunkRows = math.max(1L, math.min(shape.headOption.getOrElse(1L),
        chunkCells / rowCells max 1L)).toInt
      val chunkDims = chunkRows +: shape.drop(1).map(_.toInt)
      val cellsPerChunk = chunkDims.map(_.toLong).product.toInt
      val nChunks = ((shape.headOption.getOrElse(1L) + chunkRows - 1) /
        chunkRows).toInt max 1
      val chunks = (0 until nChunks).map { c =>
        val origin = (c.toLong * chunkRows) +: shape.drop(1).map(_ => 0L)
        // HDF5 stores FULL chunks; edge chunks pad with fill
        val buf = ByteBuffer.allocate(cellsPerChunk * 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        val base = c.toLong * chunkRows * rowCells
        while (i < cellsPerChunk) {
          val src = base + i
          buf.putDouble(if (src < data.length) data(src.toInt) else 0.0)
          i += 1
        }
        val defl = new Deflater(deflateLevel)
        defl.setInput(buf.array()); defl.finish()
        val out = new ByteArrayOutputStream
        val tmp = new Array[Byte](64 * 1024)
        while (!defl.finished()) out.write(tmp, 0, defl.deflate(tmp))
        defl.end()
        (origin, out.toByteArray)
      }
      VarPlan(name, dimIds, shape, chunkDims, chunks)
    }
    val varPlans = plainVars.map(v => planVar(v._1, v._2, v._3))

    // ---- local heap: "" at offset 0, then every dataset name
    val dsNames = (dims.map(_.name) ++ varPlans.map(_.name)).distinct
    val heapOffsets = scala.collection.mutable.Map.empty[String, Long]
    val heapData = {
      val b = new B().u8(0).padTo8()
      dsNames.foreach { n =>
        heapOffsets(n) = b.o.size.toLong
        b.str(n).u8(0).padTo8()
      }
      b.bytes
    }

    // ---- size plan, in emission order
    val rank1 = dims.indices.map(i => Seq(dims(i).length.toLong))
    def scaleMsgs(i: Int, dataAddr: Long): Seq[(Int, Array[Byte])] = {
      val name = dims(i).name
      val isCoord = coordOf.contains(i)
      Seq(
        0x0001 -> dsSimple(rank1(i)),
        0x0003 -> dtDouble,
        0x0005 -> fillMsg,
        0x0008 -> new B().u8(3).u8(1).u64(dataAddr)
          .u64(dims(i).length.toLong * 8).bytes,
        0x000C -> strAttr("CLASS", "DIMENSION_SCALE"),
        0x000C -> strAttr("NAME",
          if (isCoord) name
          else s"$NotAVariable. ${dims(i).length}"),
        0x000C -> intAttr("_Netcdf4Dimid", i))
    }
    def varMsgs(p: VarPlan, btreeAddr: Long, gcolAddr: Long,
        gcolBase: Int): Seq[(Int, Array[Byte])] = {
      val dimList = {
        val data = new B()
        p.dimIds.indices.foreach { k =>
          data.u32(1).u64(gcolAddr).u32(gcolBase + k)
        }
        attrMsg("DIMENSION_LIST", dtVlenRef,
          dsSimple(Seq(p.dimIds.size.toLong)), data.bytes)
      }
      Seq(
        0x0001 -> dsSimple(p.shape),
        0x0003 -> dtDouble,
        0x0005 -> fillMsg,
        0x000B -> new B().u8(1).u8(1).u16(0).u32(0)
          .u16(1).u16(0).u16(0).u16(1).u32(deflateLevel).u32(0).bytes,
        0x0008 -> {
          val b = new B().u8(3).u8(2).u8(p.shape.size + 1).u64(btreeAddr)
          p.chunkDims.foreach(d => b.u32(d.toLong))
          b.u32(8)
          b.bytes
        },
        0x000C -> dimList)
    }

    // chunk B-tree geometry: leaves of <=32 entries (+ level-1 root)
    val keySize = (rank: Int) => 8 + 8 * (rank + 1)
    def btreeNodeSize(rank: Int, used: Int): Int =
      24 + used * (keySize(rank) + 8) + keySize(rank)
    final case class BtPlan(leaves: Seq[Seq[Int]], hasRoot: Boolean) // chunk idxs
    def btPlan(p: VarPlan): BtPlan = {
      val groups = p.chunks.indices.grouped(32).map(_.toSeq).toSeq
      if (groups.size > 256) throw new Hdf5.FormatError(
        s"${p.name}: ${p.chunks.size} chunks exceed the writer's B-tree plan")
      BtPlan(groups, groups.size > 1)
    }
    val btPlans = varPlans.map(btPlan)

    // global heap: one 8-byte ref object per (var, axis)
    val nRefs = varPlans.map(_.dimIds.size).sum
    val gcolSize = math.max(4096L, 16L + 24L * nRefs + 16L)
    // per-var base index into the collection (indices are 1-based)
    val gcolBase = varPlans.scanLeft(1)((a, p) => a + p.dimIds.size)

    // sizes: OH sizes are independent of the addresses they embed
    val scaleOhSize = dims.indices.map(i =>
      objectHeader(scaleMsgs(i, 0L)).length)
    val scaleDataSize = dims.indices.map(i =>
      if (coordOf.contains(i)) dims(i).length.toLong * 8 else 0L)
    val varOhSize = varPlans.map(p =>
      objectHeader(varMsgs(p, 0L, 0L, 1)).length)
    val rootMsgsOf = (btree: Long, heap: Long) =>
      (0x0011 -> new B().u64(btree).u64(heap).bytes) +:
        gatts.map { case (k, v) => 0x000C -> strAttr(k, v) }
    val rootOhSize = objectHeader(rootMsgsOf(0L, 0L)).length

    // ---- assign addresses in emission order
    // NOTE: the plan must `take` blocks in the EXACT emission order
    var at = 96L // superblock
    def take(n: Long): Long = { val a = at; at += n; a }
    val heapDataAddr = take(heapData.length)
    val heapHdrAddr = take(32)
    // per dim: OH then (for coordinates) its contiguous data
    val scaleOhAddr = new Array[Long](dims.size)
    val scaleDataAddr = new Array[Long](dims.size)
    dims.indices.foreach { i =>
      scaleOhAddr(i) = take(scaleOhSize(i))
      scaleDataAddr(i) =
        if (coordOf.contains(i)) take(scaleDataSize(i)) else Undef
    }
    val gcolAddr = take(gcolSize)
    val varOhAddr = varPlans.indices.map(i => take(varOhSize(i)))
    // per var: chunk data, B-tree leaves, optional level-1 root
    val chunkAddr = Array.ofDim[Seq[Long]](varPlans.size)
    val leafAddr = Array.ofDim[Seq[Long]](varPlans.size)
    val btRootAddr = Array.ofDim[Long](varPlans.size)
    varPlans.zipWithIndex.foreach { case (p, i) =>
      val bt = btPlans(i)
      chunkAddr(i) = p.chunks.map(c => take(c._2.length))
      leafAddr(i) = bt.leaves.map(l => take(btreeNodeSize(p.shape.size, l.size)))
      btRootAddr(i) =
        if (bt.hasRoot) take(btreeNodeSize(p.shape.size, bt.leaves.size))
        else leafAddr(i).head
    }
    val snodAddr = take(8L + 40L * dsNames.size)
    val gbtreeAddr = take(24L + 8L * 3)
    val rootOhAddr = take(rootOhSize)
    val eof = at

    // ---- emit
    val out = new B()
    // superblock v0
    out.raw(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    out.u8(0).u8(0).u8(0).u8(0).u8(0).u8(8).u8(8).u8(0)
    out.u16(dsNames.size max 4).u16(16).u32(0)
    out.u64(0).u64(Undef).u64(eof).u64(Undef)
    // root symbol-table entry: name 0, OH, cached btree+heap
    out.u64(0).u64(rootOhAddr).u32(1).u32(0).u64(gbtreeAddr).u64(heapHdrAddr)

    out.raw(heapData)
    out.raw(new B().str("HEAP").u8(0).u8(0).u8(0).u8(0)
      .u64(heapData.length).u64(Undef).u64(heapDataAddr).bytes)
    dims.indices.foreach { i =>
      out.raw(objectHeader(scaleMsgs(i, scaleDataAddr(i))))
      if (coordOf.contains(i)) {
        val buf = ByteBuffer.allocate(coordOf(i)._3.length * 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        coordOf(i)._3.foreach(buf.putDouble)
        out.raw(buf.array())
      }
    }
    // global heap collection
    locally {
      val g = new B().str("GCOL").u8(1).u8(0).u8(0).u8(0).u64(gcolSize)
      var idx = 1
      varPlans.foreach { p =>
        p.dimIds.foreach { d =>
          g.u16(idx).u16(1).u32(0).u64(8).u64(scaleOhAddr(d))
          idx += 1
        }
      }
      val free = gcolSize - (16 + 24L * nRefs)
      g.u16(0).u16(0).u32(0).u64(free)
      g.raw(new Array[Byte]((free - 16).toInt))
      out.raw(g.bytes)
    }
    varPlans.zipWithIndex.foreach { case (p, i) =>
      out.raw(objectHeader(varMsgs(p, btRootAddr(i), gcolAddr, gcolBase(i))))
    }
    // chunk data, then B-tree leaves, then optional level-1 root
    varPlans.zipWithIndex.foreach { case (p, i) =>
      p.chunks.foreach { case (_, bytes) => out.raw(bytes) }
      val bt = btPlans(i)
      val rank = p.shape.size
      def key(b: B, chunkIdx: Int): Unit = {
        val (origin, bytes) = p.chunks(chunkIdx)
        b.u32(bytes.length.toLong).u32(0)
        origin.foreach(b.u64); b.u64(0)
      }
      def endKey(b: B): Unit = {
        b.u32(0).u32(0)
        // one past the last chunk in every axis
        val last = p.chunks.last._1
        last.indices.foreach(k => b.u64(last(k) + (if (k == 0) p.chunkDims(0) else p.chunkDims(k))))
        b.u64(0)
      }
      bt.leaves.zipWithIndex.foreach { case (leaf, li) =>
        val b = new B().str("TREE").u8(1).u8(0).u16(leaf.size)
        b.u64(if (li > 0) leafAddr(i)(li - 1) else Undef)
        b.u64(if (li < bt.leaves.size - 1) leafAddr(i)(li + 1) else Undef)
        leaf.foreach { ci => key(b, ci); b.u64(chunkAddr(i)(ci)) }
        if (li == bt.leaves.size - 1) endKey(b)
        else key(b, bt.leaves(li + 1).head)
        out.raw(b.bytes)
      }
      if (bt.hasRoot) {
        val b = new B().str("TREE").u8(1).u8(1).u16(bt.leaves.size)
        b.u64(Undef).u64(Undef)
        bt.leaves.zipWithIndex.foreach { case (leaf, li) =>
          key(b, leaf.head); b.u64(leafAddr(i)(li))
        }
        endKey(b)
        out.raw(b.bytes)
      }
    }
    // SNOD: entries sorted by link name
    locally {
      val b = new B().str("SNOD").u8(1).u8(0).u16(dsNames.size)
      val ohOf: Map[String, Long] =
        dims.indices.map(i => dims(i).name -> scaleOhAddr(i)).toMap ++
          varPlans.zipWithIndex.map { case (p, i) => p.name -> varOhAddr(i) }
      dsNames.sorted.foreach { n =>
        b.u64(heapOffsets(n)).u64(ohOf(n)).u32(0).u32(0)
          .u64(0).u64(0)
      }
      out.raw(b.bytes)
    }
    // group B-tree: one SNOD child
    locally {
      val b = new B().str("TREE").u8(0).u8(0).u16(1).u64(Undef).u64(Undef)
      b.u64(0).u64(snodAddr).u64(heapOffsets(dsNames.sorted.last))
      out.raw(b.bytes)
    }
    out.raw(objectHeader(rootMsgsOf(gbtreeAddr, heapHdrAddr)))

    val bytes = out.bytes
    if (bytes.length != eof)
      throw new Hdf5.FormatError(
        s"netcdf4 writer: layout planned $eof bytes, emitted ${bytes.length}")
    val fos = new java.io.FileOutputStream(path)
    try fos.write(bytes) finally fos.close()
  }
}
