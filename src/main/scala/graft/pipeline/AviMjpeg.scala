package graft.pipeline

import java.io.ByteArrayOutputStream

/**
 * Minimal pure-Scala AVI (RIFF) container with an MJPEG video stream —
 * writer and demuxer. MJPEG-in-AVI is the one mainstream video format
 * a bare JVM can genuinely decode end to end: the container is plain
 * RIFF chunk framing (public spec: the AVI RIFF form of the Windows
 * multimedia file format), and every frame payload is an ordinary
 * JPEG, which `javax.imageio` ships a codec for. This is what upgrades
 * the pipeline's video handling from a declared stub to a real decode
 * path: demux here, per-frame decode through the true ImageIO codec.
 *
 * Layout written (all sizes little-endian):
 * {{{
 * RIFF <sz> 'AVI '
 *   LIST <sz> 'hdrl'
 *     'avih' 56   main header (usPerFrame, totalFrames, w, h, ...)
 *     LIST <sz> 'strl'
 *       'strh' 56 stream header ('vids'/'MJPG', dwScale=1, dwRate=fps)
 *       'strf' 40 BITMAPINFOHEADER (biCompression='MJPG')
 *   LIST <sz> 'movi'
 *     '00dc' <jpeg bytes> (each padded to even length)
 *   'idx1' 16*n  index (fourcc, AVIIF_KEYFRAME, offset, size)
 * }}}
 */
object AviMjpeg {

  final case class VideoMeta(
      width: Int, height: Int, fps: Int, usPerFrame: Int,
      nFrames: Int, frames: IndexedSeq[Array[Byte]]) {
    def durationUs: Long = nFrames.toLong * usPerFrame
  }

  // ------------------------------------------------------------ writer

  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }
  private def fourcc(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  /** Assemble an AVI file holding `frames` (JPEG payloads) at `fps`. */
  def write(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int): Array[Byte] = {
    require(fps > 0 && frames.nonEmpty)
    val usPerFrame = 1000000 / fps
    val maxFrame = frames.map(_.length).max

    val strh = new ByteArrayOutputStream()
    fourcc(strh, "vids"); fourcc(strh, "MJPG")
    le32(strh, 0); le16(strh, 0); le16(strh, 0) // flags, prio, language
    le32(strh, 0)                               // initial frames
    le32(strh, 1); le32(strh, fps)              // dwScale, dwRate
    le32(strh, 0); le32(strh, frames.length)    // start, length
    le32(strh, maxFrame); le32(strh, -1)        // bufsize, quality
    le32(strh, 0)                               // sample size
    le16(strh, 0); le16(strh, 0); le16(strh, width); le16(strh, height)

    val strf = new ByteArrayOutputStream()      // BITMAPINFOHEADER
    le32(strf, 40); le32(strf, width); le32(strf, height)
    le16(strf, 1); le16(strf, 24)               // planes, bit count
    fourcc(strf, "MJPG")                        // biCompression
    le32(strf, width * height * 3)
    le32(strf, 0); le32(strf, 0); le32(strf, 0); le32(strf, 0)

    val avih = new ByteArrayOutputStream()
    le32(avih, usPerFrame); le32(avih, maxFrame * fps)
    le32(avih, 0); le32(avih, 0x10)             // padding, AVIF_HASINDEX
    le32(avih, frames.length); le32(avih, 0)    // total frames, initial
    le32(avih, 1); le32(avih, maxFrame)         // streams, bufsize
    le32(avih, width); le32(avih, height)
    le32(avih, 0); le32(avih, 0); le32(avih, 0); le32(avih, 0)

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      fourcc(out, id); le32(out, body.length); out.write(body)
      if (body.length % 2 == 1) out.write(0)    // word alignment
      out.toByteArray
    }
    def list(form: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      fourcc(out, "LIST"); le32(out, body.length + 4)
      fourcc(out, form); out.write(body)
      out.toByteArray
    }

    val strl = list("strl",
      chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)

    val moviBody = new ByteArrayOutputStream()
    // idx1 offsets are relative to the 'movi' form-type fourcc start
    val offsets = frames.map { f =>
      val off = moviBody.size() + 4
      moviBody.write(chunk("00dc", f)); off
    }
    val movi = list("movi", moviBody.toByteArray)

    val idx = new ByteArrayOutputStream()
    frames.zip(offsets).foreach { case (f, off) =>
      fourcc(idx, "00dc"); le32(idx, 0x10); le32(idx, off)
      le32(idx, f.length)
    }

    val riffBody = hdrl ++ movi ++ chunk("idx1", idx.toByteArray)
    val out = new ByteArrayOutputStream()
    fourcc(out, "RIFF"); le32(out, riffBody.length + 4)
    fourcc(out, "AVI "); out.write(riffBody)
    out.toByteArray
  }

  // ------------------------------------------------------------ parser

  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def rdCc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Demux an AVI byte payload: header fields + raw JPEG frame
    * payloads. None = not a parseable MJPEG AVI (truncated, wrong
    * magic, or no video frames). Per-frame image decode is the
    * caller's job (ImageIO), keeping demux cheap for frame sampling. */
  def parse(bytes: Array[Byte]): Option[VideoMeta] =
    // same contract as decodeImage: a hostile/corrupt row yields None,
    // it never throws into the Spark task
    try parse0(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def parse0(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes.length < 12 || rdCc(bytes, 0) != "RIFF" ||
        rdCc(bytes, 8) != "AVI ") return None
    var usPerFrame = 0
    var w = 0; var h = 0
    var scale = 0; var rate = 0
    var strhSeen = 0
    var vidsStream = -1 // stream number of the first 'vids' stream
    val frames = IndexedSeq.newBuilder[Array[Byte]]

    def walk(start: Int, end: Int, depth: Int): Boolean = {
      // real AVIs nest RIFF/LIST ~4 deep; a crafted file of thousands
      // of 12-byte LIST headers must hit this cap, not StackOverflow
      // past the Option contract and kill the whole Spark task
      if (depth > 32) return false
      var off = start
      while (off + 8 <= end) {
        val id = rdCc(bytes, off)
        val sz = rdLe32(bytes, off + 4)
        val body = off + 8
        // compare in long space: a hostile 32-bit size can overflow
        // `body + sz` negative and slip past an int-typed bounds check
        if (sz < 0 || body.toLong + sz > end) return false // truncated
        id match {
          case "LIST" =>
            if (sz < 4) return false
            if (!walk(body + 4, body + sz, depth + 1)) return false
          case "avih" if sz >= 40 =>
            usPerFrame = rdLe32(bytes, body)
            w = rdLe32(bytes, body + 32); h = rdLe32(bytes, body + 36)
          case "strh" if sz >= 32 =>
            if (vidsStream < 0 && rdCc(bytes, body) == "vids") {
              vidsStream = strhSeen
              scale = rdLe32(bytes, body + 20); rate = rdLe32(bytes, body + 24)
            }
            strhSeen += 1
          case id if (id.endsWith("dc") || id.endsWith("db")) &&
              id.take(2).forall(_.isDigit) &&
              // only the video stream's chunks are frames; '01dc' from
              // a second stream must not inflate the frame count
              id.take(2).toInt == math.max(vidsStream, 0) =>
            frames += java.util.Arrays.copyOfRange(bytes, body, body + sz)
          case _ => ()
        }
        off = body + sz + (sz & 1) // skip the pad byte on odd sizes
      }
      true
    }
    if (!walk(12, bytes.length, 0)) return None
    val fs = frames.result()
    if (fs.isEmpty || w <= 0 || h <= 0) None
    else {
      val fps = if (scale > 0 && rate > 0) rate / scale
        else if (usPerFrame > 0) 1000000 / usPerFrame else 0
      if (fps <= 0) None
      else Some(VideoMeta(w, h, fps,
        if (usPerFrame > 0) usPerFrame else 1000000 / fps, fs.length, fs))
    }
  }
}
