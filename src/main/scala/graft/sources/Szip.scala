package graft.sources

/**
 * szip (HDF5 filter id 4): the CCSDS 121.0-B extended-Rice entropy
 * coder that older HDF5/NetCDF-4 archives compress chunks with.
 * Implemented from the public CCSDS 121.0-B-2 standard and the
 * published szlib/libaec parameter surface — no szip code. The
 * container has no szip library to cross-check bitstreams against, so
 * the contract here is: a full decoder for the common option set, an
 * encoder mirroring it for round-trip tests, and hand-computed
 * bit-exact fixtures for the Rice primitives (FS coding, sample
 * splitting, zero blocks, the NN mapper); untestable or ambiguous
 * option combinations fail with a NAMED error rather than decode
 * wrongly.
 *
 * HDF5 client data (H5Zszip): [options_mask, bits_per_pixel,
 * pixels_per_block, pixels_per_scanline].
 *
 * Stream layout (per CCSDS 121 / szlib):
 *  - the chunk is a continuous bitstream of scanlines (pps samples
 *    each, the last may be short), byte-padded only at the end;
 *  - with NN preprocessing each scanline starts with one raw n-bit
 *    reference sample; the first block then codes J-1 mapped deltas,
 *    later blocks J each;
 *  - block header: an ID of ceil-log2 width (3 bits for n<=8, 4 for
 *    n<=16, 5 for n<=32). ID 0 + one bit selects zero-block runs (0)
 *    or the second extension (1); ID 1..max-1 selects sample-split
 *    k = ID-1 (FS-coded high parts then k low bits per sample);
 *    ID max = uncompressed (n bits per sample);
 *  - zero-run length is FS-coded: 0..3 -> 1..4 blocks, 4 -> rest of
 *    the 64-block segment, >=5 -> that many blocks;
 *  - the NN mapper is the standard unit-delay predictor with the
 *    theta folding of CCSDS 121.
 */
object Szip {

  // szlib option mask bits (public constants)
  val AllowK13 = 1; val Chip = 2; val EC = 4
  val LSB = 8; val MSB = 16; val NN = 32; val Raw = 128

  final case class Params(mask: Int, n: Int, blockSize: Int,
      scanline: Int) {
    require(n >= 1 && n <= 32, s"szip: $n bits per pixel")
    val bytesPerSample: Int = if (n <= 8) 1 else if (n <= 16) 2 else 4
    val idBits: Int = if (n <= 8) 3 else if (n <= 16) 4 else 5
    val uncompressedId: Int = (1 << idBits) - 1
    val littleEndian: Boolean = (mask & LSB) != 0
    val preprocess: Boolean = (mask & NN) != 0
  }

  def params(client: Seq[Int], path: String): Params = {
    if (client.size < 4)
      throw new Hdf5.FormatError(
        s"$path: szip filter carries ${client.size} client values, need 4")
    val p = Params(client(0), client(1), client(2), client(3))
    if ((p.mask & Chip) != 0)
      throw new Hdf5.FormatError(s"$path: szip CHIP option not supported")
    if (p.blockSize < 2 || p.blockSize > 32)
      throw new Hdf5.FormatError(
        s"$path: szip pixels_per_block ${p.blockSize}")
    if (p.scanline < p.blockSize)
      throw new Hdf5.FormatError(
        s"$path: szip pixels_per_scanline ${p.scanline} < block")
    p
  }

  // ----------------------------------------------------------- bits

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0 // bit position
    def bit(): Int = {
      if (pos >= data.length * 8)
        throw new Hdf5.FormatError("szip: bitstream exhausted")
      val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def bits(k: Int): Long = {
      var v = 0L
      var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** FS (unary): number of zeros before the terminating 1. */
    def fs(): Int = {
      var z = 0
      while (bit() == 0) {
        z += 1
        if (z > (1 << 24)) throw new Hdf5.FormatError("szip: runaway FS code")
      }
      z
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream
    private var cur = 0; private var nb = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
    }
    def bits(v: Long, k: Int): Unit = {
      var i = k - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def fs(z: Int): Unit = { (0 until z).foreach(_ => bit(0)); bit(1) }
    def bytes: Array[Byte] = { while (nb != 0) bit(0); out.toByteArray }
  }

  // ------------------------------------------------ CCSDS 121 mapper

  /** Map a prediction residual to unsigned (theta folding). */
  private def mapDelta(x: Long, pred: Long, n: Int): Long = {
    val xmax = (1L << n) - 1
    val d = x - pred
    val theta = math.min(pred, xmax - pred)
    if (d >= 0 && d <= theta) 2 * d
    else if (d < 0 && -d <= theta) -2 * d - 1
    else theta + math.abs(d)
  }

  private def unmapDelta(m: Long, pred: Long, n: Int): Long = {
    val xmax = (1L << n) - 1
    val theta = math.min(pred, xmax - pred)
    if (m <= 2 * theta) {
      // both signs still available: even = non-negative, odd = negative
      if (m % 2 == 0) pred + m / 2 else pred - (m + 1) / 2
    } else {
      // one side is exhausted, so the sign is implied: when theta ==
      // pred the negative range is used up (deltas below -pred would
      // underflow), so the residual is positive; otherwise negative
      val mag = m - theta
      if (theta == pred) pred + mag else pred - mag
    }
  }

  // ---------------------------------------------------------- decode

  /** Decode a szip-compressed chunk back to `nPixels` raw samples. */
  def decode(data: Array[Byte], client: Seq[Int], nPixels: Int,
      path: String): Array[Byte] = {
    val p = params(client, path)
    val in = new BitReader(data)
    val out = new Array[Long](nPixels)
    var base = 0
    while (base < nPixels) {
      val count = math.min(p.scanline, nPixels - base)
      decodeScanline(in, p, out, base, count, path)
      base += count
    }
    packSamples(out, p)
  }

  private def decodeScanline(in: BitReader, p: Params, out: Array[Long],
      base: Int, count: Int, path: String): Unit = {
    val J = p.blockSize
    val nBlocks = (count + J - 1) / J
    var zeroRun = 0 // pending zero blocks from a run
    var block = 0
    while (block < nBlocks) {
      val bStart = block * J
      val bLen = math.min(J, count - bStart)
      // the reference sample eats the first slot of block 0
      val refHere = p.preprocess && block == 0
      val codedLen = if (refHere) bLen - 1 else bLen
      val mapped = new Array[Long](codedLen)
      if (refHere) out(base) = in.bits(p.n)
      if (codedLen == 0) { /* 1-sample scanline: reference only */ }
      else if (zeroRun > 0) { zeroRun -= 1 } // all-zero mapped block
      else {
        val id = in.bits(p.idBits).toInt
        if (id == 0) {
          if (in.bit() == 0) {
            // zero-block run: this block + following ones
            val z = in.fs()
            val run =
              if (z == 4) { // ROS: rest of the 64-block segment
                val segEnd = math.min(((block / 64) + 1) * 64, nBlocks)
                segEnd - block
              } else if (z < 4) z + 1
              else z
            zeroRun = run - 1
          } else {
            // second extension: one FS gamma codeword per sample PAIR,
            // paired on ABSOLUTE block positions (0,1)(2,3)…. A
            // reference sample occupies position 0 and participates as
            // a phantom zero delta (szlib/libaec preprocessing sets
            // d[0]=0), so block 0 of an even-J scanline carries J/2
            // codewords whose first decodes (phantom, mapped(0)).
            if (bLen % 2 != 0)
              throw new Hdf5.FormatError(
                s"$path: szip second extension on an odd-length block")
            var pos = 0
            while (pos < bLen) {
              val g = in.fs().toLong
              // invert gamma = (a+b)(a+b+1)/2 + b by triangular root
              var s = 0L
              while ((s + 1) * (s + 2) / 2 <= g) s += 1
              val b2 = g - s * (s + 1) / 2
              val a2 = s - b2
              if (refHere && pos == 0) mapped(0) = b2 // a2 is phantom
              else {
                val mi = pos - (if (refHere) 1 else 0)
                mapped(mi) = a2; mapped(mi + 1) = b2
              }
              pos += 2
            }
          }
        } else if (id == p.uncompressedId) {
          var i = 0
          while (i < codedLen) { mapped(i) = in.bits(p.n); i += 1 }
        } else {
          val k = id - 1
          if (k > p.n - 2)
            throw new Hdf5.FormatError(s"$path: szip split k=$k for n=${p.n}")
          var i = 0
          while (i < codedLen) { mapped(i) = in.fs().toLong << k; i += 1 }
          if (k > 0) {
            i = 0
            while (i < codedLen) { mapped(i) |= in.bits(k); i += 1 }
          }
        }
      }
      // un-preprocess into sample values
      var i = 0
      var outIdx = base + bStart + (if (refHere) 1 else 0)
      while (i < codedLen) {
        if (p.preprocess) {
          val pred = out(outIdx - 1) // scanline-local unit delay
          out(outIdx) = unmapDelta(mapped(i), pred, p.n)
        } else out(outIdx) = mapped(i)
        i += 1; outIdx += 1
      }
      block += 1
    }
  }

  private def packSamples(v: Array[Long], p: Params): Array[Byte] = {
    val bps = p.bytesPerSample
    val out = new Array[Byte](v.length * bps)
    var i = 0
    while (i < v.length) {
      var b = 0
      while (b < bps) {
        val shift = if (p.littleEndian) 8 * b else 8 * (bps - 1 - b)
        out(i * bps + b) = ((v(i) >> shift) & 0xFF).toByte
        b += 1
      }
      i += 1
    }
    out
  }

  // ---------------------------------------------------------- encode
  // Mirrors the decoder exactly (round-trip tests); emits per block the
  // cheapest of: zero-block run (coalesced across blocks, ROS when the
  // run reaches the 64-block segment end), second extension, split-k,
  // or uncompressed — the same option set szlib chooses from, so
  // round-trips exercise every decoder branch.

  def encode(raw: Array[Byte], client: Seq[Int], path: String): Array[Byte] = {
    val p = params(client, path)
    val bps = p.bytesPerSample
    require(raw.length % bps == 0, "szip encode: ragged sample bytes")
    val n = raw.length / bps
    val v = new Array[Long](n)
    var i = 0
    while (i < n) {
      var x = 0L
      var b = 0
      while (b < bps) {
        val shift = if (p.littleEndian) 8 * b else 8 * (bps - 1 - b)
        x |= (raw(i * bps + b) & 0xFFL) << shift
        b += 1
      }
      v(i) = x
      i += 1
    }
    val w = new BitWriter
    var base = 0
    while (base < n) {
      val count = math.min(p.scanline, n - base)
      encodeScanline(w, p, v, base, count)
      base += count
    }
    w.bytes
  }

  private def encodeScanline(w: BitWriter, p: Params, v: Array[Long],
      base: Int, count: Int): Unit = {
    val J = p.blockSize
    val nBlocks = (count + J - 1) / J
    // mapped deltas per block, computed once up front (run coalescing
    // needs lookahead over following blocks)
    def blockLen(b: Int) = math.min(J, count - b * J)
    val mappedByBlock: Array[Array[Long]] = Array.tabulate(nBlocks) { b =>
      val bLen = blockLen(b)
      val refHere = p.preprocess && b == 0
      val codedLen = if (refHere) bLen - 1 else bLen
      val m = new Array[Long](codedLen)
      var i = 0
      var idx = base + b * J + (if (refHere) 1 else 0)
      while (i < codedLen) {
        m(i) =
          if (p.preprocess) mapDelta(v(idx), v(idx - 1), p.n)
          else v(idx)
        i += 1; idx += 1
      }
      m
    }
    var block = 0
    while (block < nBlocks) {
      val bLen = blockLen(block)
      val refHere = p.preprocess && block == 0
      val mapped = mappedByBlock(block)
      val codedLen = mapped.length
      if (refHere) w.bits(v(base), p.n)
      if (codedLen == 0) { block += 1 } // 1-sample scanline: ref only
      else if (mapped.forall(_ == 0L)) {
        // coalesce consecutive all-zero blocks into one run header;
        // runs never cross a 64-block segment (ROS semantics)
        val segEnd = math.min(((block / 64) + 1) * 64, nBlocks)
        var r = 1
        while (block + r < segEnd && mappedByBlock(block + r).forall(_ == 0L))
          r += 1
        w.bits(0, p.idBits); w.bit(0)
        if (block + r == segEnd && r >= 5) w.fs(4) // ROS: rest of segment
        else if (r <= 4) w.fs(r - 1)
        else w.fs(r)
        block += r
      } else {
        // best among split-k, uncompressed, second extension — exact
        // bit costs including the header (SE pays an extra option bit)
        var bestK = -1
        var bestCost = p.idBits + p.n * codedLen // uncompressed
        var k = 0
        while (k <= math.min(p.n - 2, p.uncompressedId - 2)) {
          var cost = p.idBits.toLong
          var j = 0
          while (j < codedLen) {
            cost += (mapped(j) >> k) + 1 + k
            j += 1
          }
          if (cost < bestCost) { bestCost = cost.toInt; bestK = k }
          k += 1
        }
        // second extension: one gamma FS codeword per absolute-position
        // pair, the reference slot pairing as a phantom zero. Only
        // defined for even-length blocks; skipped when any pair sum is
        // large (the gamma codeword length explodes quadratically).
        var seGammas: Array[Long] = null
        if (bLen % 2 == 0) {
          val g = new Array[Long](bLen / 2)
          var ok = true
          var cost = p.idBits.toLong + 1
          var pos = 0
          while (ok && pos < bLen) {
            val a = if (refHere && pos == 0) 0L
              else mapped(pos - (if (refHere) 1 else 0))
            val b = mapped(pos + 1 - (if (refHere) 1 else 0))
            if (a + b > 4096) ok = false
            else {
              val gamma = (a + b) * (a + b + 1) / 2 + b
              g(pos / 2) = gamma
              cost += gamma + 1
            }
            pos += 2
          }
          if (ok && cost < bestCost) { bestCost = cost.toInt; seGammas = g }
        }
        if (seGammas != null) {
          w.bits(0, p.idBits); w.bit(1)
          seGammas.foreach(gm => w.fs(gm.toInt))
        } else if (bestK < 0) {
          w.bits(p.uncompressedId, p.idBits)
          mapped.foreach(m => w.bits(m, p.n))
        } else {
          w.bits(bestK + 1, p.idBits)
          mapped.foreach(m => w.fs((m >> bestK).toInt))
          if (bestK > 0) mapped.foreach(m => w.bits(m, bestK))
        }
        block += 1
      }
    }
  }
}
