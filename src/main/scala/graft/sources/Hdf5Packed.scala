package graft.sources

import graft.sources.Hdf5.{ClassFixed, ClassFloat, Dtype, FormatError}

/**
 * The HDF5 bit-packing filters: N-bit (filter id 5) and scale+offset
 * (filter id 6), decoded per the public HDF5 library behavior
 * (H5Znbit.c / H5Zscaleoffset.c in the public HDF5 source; the filter
 * ids and cd_values layouts are part of the published file format).
 * The reference reads these through libhdf5 (`oph_importnc`); here
 * they are pure-JVM so a Spark task can open any archive chunk
 * without native libraries.
 *
 * Both filters serialize element payloads MSB-first into a big-endian
 * bit stream — the byte-wise loops in the C source are equivalent to
 * "append the significant field of each element, most significant bit
 * first", which is how these codecs implement it.
 *
 * Encoders implement the inverse transforms for fixture construction
 * and round-trip testing (and any writer that wants the filters).
 */
private[sources] final class BitReader(buf: Array[Byte], start: Int) {
  private var pos = start
  private var bitsLeft = 8
  def read(n: Int): Long = {
    var out = 0L
    var need = n
    while (need > 0) {
      if (pos >= buf.length)
        throw new FormatError(s"bit stream exhausted at byte $pos")
      val take = math.min(need, bitsLeft)
      val cur = buf(pos) & 0xFF
      val bits = (cur >>> (bitsLeft - take)) & ((1 << take) - 1)
      out = (out << take) | bits
      bitsLeft -= take
      need -= take
      if (bitsLeft == 0) { pos += 1; bitsLeft = 8 }
    }
    out
  }
}

private[sources] final class BitWriter {
  private val out = new java.io.ByteArrayOutputStream
  private var cur = 0
  private var used = 0
  def write(v: Long, n: Int): Unit = {
    var left = n
    while (left > 0) {
      val take = math.min(left, 8 - used)
      val bits = ((v >>> (left - take)) & ((1L << take) - 1)).toInt
      cur = (cur << take) | bits
      used += take
      left -= take
      if (used == 8) { out.write(cur); cur = 0; used = 0 }
    }
  }
  def bytes: Array[Byte] = {
    if (used > 0) { out.write(cur << (8 - used)); cur = 0; used = 0 }
    out.toByteArray
  }
}

private[sources] object PackedCommon {
  /** Write the low `size` bytes of `v` at `off` in the given order. */
  def writeInt(out: Array[Byte], off: Int, size: Int, v: Long,
      littleEndian: Boolean): Unit = {
    var i = 0
    while (i < size) {
      val b = ((v >>> (8 * i)) & 0xFF).toByte
      out(off + (if (littleEndian) i else size - 1 - i)) = b
      i += 1
    }
  }

  def signExtend(v: Long, bits: Int): Long =
    if (bits >= 64 || ((v >>> (bits - 1)) & 1L) == 0L) v
    else v | (-1L << bits)
}

/**
 * N-bit filter (H5Z_FILTER_NBIT = 5): packs only the significant
 * `precision` bits of each element (a datatype narrower than its
 * storage size, e.g. a 12-bit integer stored in 16 bits).
 *
 * cd_values layout (atomic datatypes): [0]=total parameter count,
 * [1]=needn't-compress flag, [2]=elements per chunk, [3]=datatype
 * class (1=atomic, 2=array, 3=compound, 4=no-op), [4]=size bytes,
 * [5]=byte order (0 LE / 1 BE), [6]=precision bits, [7]=bit offset.
 *
 * Scope: atomic integer datatypes at any precision/offset (the
 * overwhelmingly common case — netCDF/h5py expose exactly this), the
 * no-op class, and the needn't-compress passthrough. Decoded output
 * is the CONVERTED full-width value (field extracted from its bit
 * offset, signed types sign-extended) — the same result libhdf5's
 * datatype conversion hands a reader asking for the native wide type,
 * which is what [[Hdf5.readSlab]]'s full-width cell decoder consumes.
 * Array/compound classes and reduced-precision floats raise named
 * errors (a reduced float field is not IEEE and cannot round-trip
 * through a double without the file's custom exponent layout).
 */
object Nbit {
  val ClsAtomic = 1; val ClsArray = 2; val ClsCompound = 3; val ClsNoop = 4

  def decode(raw: Array[Byte], cd: Seq[Int], dtype: Dtype,
      name: String): Array[Byte] = {
    if (cd.length < 5)
      throw new FormatError(s"$name: nbit cd_values has ${cd.length} entries")
    val nelmts = cd(2)
    val size = cd(4)
    if (nelmts < 0 || size < 1 || size > 8 ||
        nelmts.toLong * size > (1L << 28))
      throw new FormatError(s"$name: nbit nelmts=$nelmts size=$size")
    val outLen = nelmts * size
    if (cd(1) != 0 || cd(3) == ClsNoop) { // passthrough: raw chunk bytes
      if (raw.length < outLen)
        throw new FormatError(
          s"$name: nbit passthrough ${raw.length} < $outLen bytes")
      return java.util.Arrays.copyOf(raw, outLen)
    }
    cd(3) match {
      case ClsAtomic =>
        if (cd.length < 8)
          throw new FormatError(s"$name: nbit atomic cd_values ${cd.length}")
        val precision = cd(6)
        val offset = cd(7)
        if (precision < 1 || precision > size * 8 ||
            precision + offset > size * 8)
          throw new FormatError(
            s"$name: nbit precision=$precision offset=$offset size=$size")
        if (dtype.clazz == ClassFloat && precision != size * 8)
          throw new FormatError(
            s"$name: nbit reduced-precision float not supported")
        val out = new Array[Byte](outLen)
        val br = new BitReader(raw, 0)
        val signed = dtype.clazz == ClassFixed && dtype.signed
        var i = 0
        while (i < nelmts) {
          var v = br.read(precision)
          if (signed && precision < 64) v = PackedCommon.signExtend(v, precision)
          PackedCommon.writeInt(out, i * size, size, v, dtype.littleEndian)
          i += 1
        }
        out
      case c =>
        throw new FormatError(
          s"$name: nbit datatype class $c (array/compound) not supported")
    }
  }

  /** Pack logical field values (the low `precision` bits of each long
    * are significant) into the nbit stream — the filter's forward
    * direction, for fixtures and round-trips. */
  def encode(values: Array[Long], precision: Int): Array[Byte] = {
    val bw = new BitWriter
    values.foreach(v => bw.write(v & (if (precision == 64) -1L
      else (1L << precision) - 1), precision))
    bw.bytes
  }

  /** cd_values for an atomic dataset, as H5Z__set_local_nbit builds
    * them. */
  def cdValues(nelmts: Int, size: Int, littleEndian: Boolean,
      precision: Int, offset: Int): Seq[Int] =
    Seq(8, if (precision == size * 8 && offset == 0) 1 else 0, nelmts,
      ClsAtomic, size, if (littleEndian) 0 else 1, precision, offset)
}

/**
 * Scale+offset filter (H5Z_FILTER_SCALEOFFSET = 6): subtract the
 * chunk minimum (integers) or fixed-decimal-scale against the chunk
 * minimum (floats, GRIB-style D-scaling), then pack each residual in
 * `minbits` bits. Chunk layout: bytes 0-3 little-endian minbits,
 * byte 4 the stored minval width, bytes 5.. the little-endian minval,
 * packed payload from byte 21 (both directions of H5Zscaleoffset.c
 * use that fixed offset).
 *
 * cd_values: [0]=scale type (0 float D-scale / 1 float E-scale /
 * 2 int), [1]=scale factor, [2]=elements per chunk, [3]=datatype
 * class (0 int / 1 float), [4]=size, [5]=sign, [6]=order,
 * [7]=fill-value-defined flag, [8..]=fill value bytes (little-endian
 * 32-bit words). With a fill value defined the all-ones residual is
 * reserved as the fill marker and checked BEFORE un-offsetting.
 * E-scale is unimplemented in libhdf5 itself and raises the same
 * named error here.
 */
object ScaleOffset {
  val SoFloatDscale = 0; val SoFloatEscale = 1; val SoInt = 2
  val ClsInteger = 0; val ClsFloat = 1
  val PayloadOff = 21

  def decode(raw: Array[Byte], cd: Seq[Int], dtype: Dtype,
      name: String): Array[Byte] = {
    if (cd.length < 8)
      throw new FormatError(s"$name: scaleoffset cd_values ${cd.length}")
    if (raw.length < PayloadOff)
      throw new FormatError(s"$name: scaleoffset chunk ${raw.length} bytes")
    val nelmts = cd(2)
    val size = cd(4)
    if (nelmts < 0 || size < 1 || size > 8 ||
        nelmts.toLong * size > (1L << 28))
      throw new FormatError(s"$name: scaleoffset nelmts=$nelmts size=$size")
    val minbits = ((raw(0) & 0xFFL) | ((raw(1) & 0xFFL) << 8) |
      ((raw(2) & 0xFFL) << 16) | ((raw(3) & 0xFFL) << 24)).toInt
    if (minbits < 0 || minbits > size * 8)
      throw new FormatError(s"$name: scaleoffset minbits=$minbits size=$size")
    val minvalSize = math.min(raw(4) & 0xFF, 8)
    var minval = 0L
    var i = 0
    while (i < minvalSize) {
      minval |= (raw(5 + i) & 0xFFL) << (8 * i)
      i += 1
    }
    val outLen = nelmts * size
    if (minbits == size * 8) { // full precision: verbatim payload
      if (raw.length < PayloadOff + outLen)
        throw new FormatError(s"$name: scaleoffset verbatim payload short")
      return java.util.Arrays.copyOfRange(raw, PayloadOff, PayloadOff + outLen)
    }
    val packed = new Array[Long](nelmts)
    if (minbits > 0) {
      val br = new BitReader(raw, PayloadOff)
      var j = 0
      while (j < nelmts) { packed(j) = br.read(minbits); j += 1 }
    }
    val fillDefined = cd(7) == 1
    val fillCode = if (minbits >= 64) -1L else (1L << minbits) - 1
    val out = new Array[Byte](outLen)
    def fillBytes: Array[Byte] = {
      val b = new Array[Byte](size)
      var k = 0
      while (k < size) {
        if (8 + k / 4 >= cd.length)
          throw new FormatError(s"$name: scaleoffset fill value truncated")
        b(k) = ((cd(8 + k / 4) >>> (8 * (k % 4))) & 0xFF).toByte
        k += 1
      }
      b
    }
    cd(0) match {
      case SoInt =>
        if (cd(3) != ClsInteger)
          throw new FormatError(s"$name: scaleoffset int scale on class ${cd(3)}")
        // minval is a memcpy of the native minimum: only the low
        // `size` bytes are significant; signed types sign-extend
        val signed = dtype.signed
        val minTyped =
          if (signed) PackedCommon.signExtend(minval, math.min(size * 8, 64))
          else minval
        val fb = if (fillDefined) fillBytes else null
        var j = 0
        while (j < nelmts) {
          if (fillDefined && minbits > 0 && packed(j) == fillCode) {
            var k = 0
            while (k < size) {
              out(j * size + (if (dtype.littleEndian) k else size - 1 - k)) =
                fb(k)
              k += 1
            }
          } else {
            PackedCommon.writeInt(out, j * size, size, packed(j) + minTyped,
              dtype.littleEndian)
          }
          j += 1
        }
        out
      case SoFloatDscale =>
        if (cd(3) != ClsFloat || (size != 4 && size != 8))
          throw new FormatError(
            s"$name: scaleoffset D-scale on class ${cd(3)} size $size")
        val min = if (size == 8) java.lang.Double.longBitsToDouble(minval)
          else java.lang.Float.intBitsToFloat(minval.toInt).toDouble
        val factor = math.pow(10.0, cd(1))
        val fb = if (fillDefined) fillBytes else null
        var j = 0
        while (j < nelmts) {
          if (fillDefined && minbits > 0 && packed(j) == fillCode) {
            var k = 0
            while (k < size) {
              out(j * size + (if (dtype.littleEndian) k else size - 1 - k)) =
                fb(k)
              k += 1
            }
          } else {
            val x = packed(j).toDouble / factor + min
            val bits = if (size == 8) java.lang.Double.doubleToLongBits(x)
              else java.lang.Float.floatToIntBits(x.toFloat).toLong & 0xFFFFFFFFL
            PackedCommon.writeInt(out, j * size, size, bits,
              dtype.littleEndian)
          }
          j += 1
        }
        out
      case SoFloatEscale =>
        throw new FormatError(
          s"$name: scaleoffset E-scale is unimplemented (as in libhdf5)")
      case t =>
        throw new FormatError(s"$name: scaleoffset scale type $t")
    }
  }

  private def ceilLog2(v: Long): Int = {
    var bits = 0
    var bound = 1L
    while (bound < v && bits < 63) { bound <<= 1; bits += 1 }
    bits
  }

  /** Forward transform for INTEGER data (fixtures / round-trips):
    * residual-pack `values` (logical longs, `fill` marking fill slots
    * when defined) into a scaleoffset chunk. */
  def encodeInt(values: Array[Long], size: Int,
      fill: Option[Long]): Array[Byte] = {
    val data = fill match {
      case Some(f) => values.filter(_ != f)
      case None => values
    }
    require(data.nonEmpty, "scaleoffset encode: all-fill chunk")
    val min = data.min
    val span = data.max - min + 1
    var minbits = ceilLog2(span + (if (fill.isDefined) 1 else 0))
    if (minbits >= size * 8) minbits = size * 8
    header(minbits, min, size, isFloat = false) ++ (
      if (minbits == size * 8) {
        val out = new Array[Byte](values.length * size)
        values.zipWithIndex.foreach { case (v, i) =>
          PackedCommon.writeInt(out, i * size, size, v, littleEndian = true) }
        out
      } else {
        val bw = new BitWriter
        val fillCode = (1L << minbits) - 1
        values.foreach { v =>
          bw.write(if (fill.contains(v)) fillCode else v - min, minbits)
        }
        bw.bytes
      })
  }

  /** Forward transform for float D-scale data; NaN slots encode as
    * the fill marker when `fill` is defined. */
  def encodeDscale(values: Array[Double], size: Int, dScale: Int,
      fill: Option[Double]): Array[Byte] = {
    def isFill(v: Double) = fill.exists(f =>
      java.lang.Double.compare(f, v) == 0)
    val data = values.filterNot(isFill)
    require(data.nonEmpty, "scaleoffset encode: all-fill chunk")
    val factor = math.pow(10.0, dScale)
    val min = data.min
    val minScaled = math.round(min * factor)
    val scaled = data.map(v => math.round(v * factor) - minScaled)
    val span = scaled.max + 1
    var minbits = ceilLog2(span + (if (fill.isDefined) 1 else 0))
    if (minbits >= size * 8) minbits = size * 8
    val minBits64 = if (size == 8) java.lang.Double.doubleToLongBits(min)
      else java.lang.Float.floatToIntBits(min.toFloat).toLong & 0xFFFFFFFFL
    header(minbits, minBits64, size, isFloat = true) ++ (
      if (minbits == size * 8) {
        val out = new Array[Byte](values.length * size)
        values.zipWithIndex.foreach { case (v, i) =>
          val b = if (size == 8) java.lang.Double.doubleToLongBits(v)
            else java.lang.Float.floatToIntBits(v.toFloat).toLong & 0xFFFFFFFFL
          PackedCommon.writeInt(out, i * size, size, b, littleEndian = true)
        }
        out
      } else {
        val bw = new BitWriter
        val fillCode = (1L << minbits) - 1
        values.foreach { v =>
          bw.write(if (isFill(v)) fillCode
            else math.round(v * factor) - minScaled, minbits)
        }
        bw.bytes
      })
  }

  private def header(minbits: Int, minval: Long, size: Int,
      isFloat: Boolean): Array[Byte] = {
    val h = new Array[Byte](PayloadOff)
    h(0) = (minbits & 0xFF).toByte
    h(1) = ((minbits >> 8) & 0xFF).toByte
    h(2) = ((minbits >> 16) & 0xFF).toByte
    h(3) = ((minbits >> 24) & 0xFF).toByte
    h(4) = 8.toByte
    var i = 0
    while (i < 8) { h(5 + i) = ((minval >>> (8 * i)) & 0xFF).toByte; i += 1 }
    h
  }

  /** cd_values as H5Z__set_local_scaleoffset builds them (fill packed
    * as little-endian 32-bit words). */
  def cdValues(scaleType: Int, scaleFactor: Int, nelmts: Int,
      isFloat: Boolean, size: Int, signed: Boolean, littleEndian: Boolean,
      fillBytes: Option[Array[Byte]]): Seq[Int] = {
    val base = Seq(scaleType, scaleFactor, nelmts,
      if (isFloat) ClsFloat else ClsInteger, size,
      if (signed) 1 else 0, if (littleEndian) 0 else 1,
      if (fillBytes.isDefined) 1 else 0)
    base ++ fillBytes.toSeq.flatMap { fb =>
      fb.padTo((fb.length + 3) / 4 * 4, 0.toByte).grouped(4).map { w =>
        (w(0) & 0xFF) | ((w(1) & 0xFF) << 8) | ((w(2) & 0xFF) << 16) |
          ((w(3) & 0xFF) << 24)
      }
    }
  }
}
