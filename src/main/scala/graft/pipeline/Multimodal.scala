package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, processed in batch-shaped partition
 * passes.
 *
 * IMAGE decode is REAL (`javax.imageio` — PNG/JPEG/BMP/GIF ship with
 * the JVM): `decodeImage` yields true dimensions and per-channel
 * statistics. AUDIO decode is REAL too (`javax.sound.sampled` — WAV/
 * AIFF PCM ship with the JVM): `decodeAudio` yields format, duration
 * and waveform statistics. VIDEO decode is REAL for MJPEG-in-AVI
 * (`AviMjpeg` demuxes the RIFF container; every frame is a JPEG the
 * ImageIO codec decodes) — `decodeVideo` yields container metadata
 * plus per-frame decoded dimensions. Other video codecs (H.264 etc.)
 * have no JVM decoder; those payloads fall back to the declared
 * `decodeImageStub`, honest rather than faked.
 *
 * Scale notes: media batches flow through `mapPartitions` on a typed
 * Dataset — the Scala analogue of `mapInPandas` batch processing; rows
 * never leave the executor, and the binary payload is projected only
 * when the decode stage actually runs.
 */
object Multimodal {

  /** Real image decode via the JVM's ImageIO: dimensions + mean
    * R/G/B channel values. None = payload not a decodable image. */
  def decodeImage(content: Array[Byte])
      : Option[(Int, Int, Double, Double, Double)] =
    (try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(content)))
    catch {
      // a corrupt image (valid signature, damaged body) THROWS rather
      // than returning null — either way it is "not decodable", and a
      // bad row must not kill the whole Spark job
      case _: java.io.IOException | _: RuntimeException => None
    }).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }

  /** Deterministic synthetic PNG: solid color + dimensions derived
    * from the id — REAL png bytes (ImageIO encoder), so decode tests
    * and the oracle query exercise the true codec path. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 16).toInt
    val h = 8 + ((id * 7) % 16).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (((id * 13) % 256).toInt << 16) |
      (((id * 29) % 256).toInt << 8) | ((id * 47) % 256).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthetic PNG media table — every row a real decodable image. */
  def syntheticPngMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map(id =>
      MediaRow(id, "image", s"synthetic://png/$id", syntheticPng(id)))
  }

  /** Real audio decode via the JVM's sampled-sound stack (WAV/AIFF
    * PCM): sample rate, channels, per-channel sample count, RMS
    * amplitude and zero-crossing count of channel 0. None = payload
    * not decodable 16-bit PCM audio. */
  def decodeAudio(content: Array[Byte])
      : Option[(Float, Int, Long, Double, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val bytes = in.readAllBytes()
          val frameSize = fmt.getFrameSize
          val n = bytes.length / frameSize
          val be = fmt.isBigEndian
          var i = 0; var sumSq = 0.0; var zc = 0L; var prevSign = 0
          while (i < n) {
            val off = i * frameSize // channel 0 leads each frame
            val s = (if (be) (bytes(off) << 8) | (bytes(off + 1) & 0xFF)
                     else (bytes(off + 1) << 8) | (bytes(off) & 0xFF))
              .toShort.toInt
            sumSq += s.toDouble * s
            val sign = Integer.signum(s)
            if (sign != 0) {
              if (prevSign != 0 && sign != prevSign) zc += 1
              prevSign = sign
            }
            i += 1
          }
          if (n == 0) None
          else Some((fmt.getSampleRate, fmt.getChannels, n.toLong,
            math.sqrt(sumSq / n), zc))
        }
      } finally in.close()
    } catch {
      // not-a-WAV and corrupt-WAV both surface as exceptions from the
      // codec; either way the row is "not decodable audio"
      case _: Exception => None
    }

  /** Deterministic synthetic WAV: a 16-bit PCM mono square wave whose
    * every statistic is arithmetically predictable from the id —
    * amplitude A = rms exactly, zero crossings = n/halfPeriod - 1 —
    * encoded through the REAL WAV writer so the decode path exercises
    * the true codec end to end. */
  def syntheticWav(id: Long): Array[Byte] = {
    val halfPeriod = 8 + (id % 8).toInt
    val cycles = 10 + (id % 5).toInt
    val n = 2 * halfPeriod * cycles
    val amp = (1000 + (id * 17) % 20000).toInt
    val sampleRate = (8000 + (id % 4) * 4000).toInt
    val pcm = new Array[Byte](n * 2) // little-endian int16 mono
    var i = 0
    while (i < n) {
      val s = if ((i / halfPeriod) % 2 == 0) amp else -amp
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthetic WAV media table — every row real decodable audio. */
  def syntheticWavMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map(id =>
      MediaRow(id, "audio", s"synthetic://wav/$id", syntheticWav(id)))
  }

  /** Decoded-audio statistics as a relational frame — the oracle-
    * checkable face of the real audio decode (for synthetic square
    * waves rms = amplitude exactly and the zero-crossing count is
    * closed-form, so a SQL oracle verifies the codec end to end). */
  def audioStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAudio(r.content).map { case (sr, ch, n, rms, zc) =>
          // rms stays the raw double: for a +/-A square wave it is
          // EXACTLY A (perfect square under IEEE sqrt), so the SQL
          // oracle can compare without rounding; duration uses
          // integer division to stay rational-safe
          (r.media_id, sr.toLong, ch.toLong, n, rms, zc,
            n * 1000000L / sr.toLong)
        }
      }
    }.toDF("media_id", "sample_rate", "channels", "n_samples",
      "rms", "zero_crossings", "duration_us")
  }

  /** Real video decode: AVI/MJPEG demux + per-frame ImageIO decode.
    * Yields (width, height, fps, n_frames, frames_decoded,
    * duration_us) where frames_decoded counts frames that actually
    * decode to the header dimensions through the true JPEG codec.
    * None = payload is not a parseable MJPEG AVI. */
  def decodeVideo(content: Array[Byte])
      : Option[(Int, Int, Int, Int, Int, Long)] =
    AviMjpeg.parse(content).map { m =>
      val ok = m.frames.count(f => decodeImage(f) match {
        case Some((w, h, _, _, _)) => w == m.width && h == m.height
        case None => false
      })
      (m.width, m.height, m.fps, m.nFrames, ok, m.durationUs)
    }

  /** Deterministic synthetic MJPEG AVI: frame count, dimensions and
    * frame rate all closed-form in the id; frames are REAL JPEGs
    * (ImageIO encoder) with a per-frame pixel pattern, so the decode
    * path exercises the true demux + JPEG codec end to end. */
  def syntheticAvi(id: Long): Array[Byte] = {
    val w = 16 + (id % 8).toInt * 2
    val h = 16 + ((id * 3) % 8).toInt * 2
    val nFrames = 3 + (id % 4).toInt
    val fps = 10 + (id % 5).toInt
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = ((id * 31 + f * 53) % 256).toInt
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    AviMjpeg.write(frames, w, h, fps)
  }

  /** Synthetic MJPEG-AVI media table — every row a real decodable
    * video clip. */
  def syntheticAviMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map(id =>
      MediaRow(id, "video", s"synthetic://avi/$id", syntheticAvi(id)))
  }

  /** Decoded-video statistics as a relational frame — the oracle-
    * checkable face of the real video path: container metadata is
    * closed-form in the id and frames_decoded can only equal n_frames
    * when every JPEG frame truly decodes, so a SQL oracle verifies
    * demux + codec end to end. */
  def videoStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeVideo(r.content).map { case (w, h, fps, nf, ok, durUs) =>
          (r.media_id, w.toLong, h.toLong, fps.toLong, nf.toLong,
            ok.toLong, durUs)
        }
      }
    }.toDF("media_id", "width", "height", "fps", "n_frames",
      "frames_decoded", "duration_us")
  }

  /** Frame sampling over REAL video: demux the AVI, keep every
    * `stride`-th frame, decode it through the JPEG codec. The
    * explode-shaped output one row per sampled frame with its true
    * decoded dimensions and byte size. */
  def sampleVideoFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        AviMjpeg.parse(r.content).toSeq.flatMap { m =>
          m.frames.zipWithIndex.collect {
            case (f, i) if i % stride == 0 =>
              val (w, h) = decodeImage(f) match {
                case Some((dw, dh, _, _, _)) => (dw.toLong, dh.toLong)
                case None => (-1L, -1L)
              }
              (r.media_id, i.toLong, w, h, f.length.toLong)
          }
        }
      }
    }.toDF("media_id", "frame_idx", "width", "height", "n_bytes")
  }

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,           // image | audio | video
      uri: String,
      content: Array[Byte])

  /** Decoded features (fake, deterministic from the payload). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_bytes: Long,
      features: Array[Float])

  /** STUB decoder — the fallback for payloads no JVM codec can open
    * (e.g. H.264 video). Deterministic: outputs derive from the
    * payload. */
  def decodeImageStub(content: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(content)
    val width = 16 + math.abs(h % 1024)
    val height = 16 + math.abs((h / 1024) % 1024)
    val features = Array.tabulate(8) { i =>
      // cheap rolling checksum per stripe — stands in for an embedding
      var acc = i + 1
      var j = i
      while (j < content.length) { acc = acc * 31 + content(j); j += 8 }
      (acc % 1000) / 1000.0f
    }
    (width, height, features)
  }

  /** Build a deterministic synthetic media table (driver for tests —
    * payload bytes derived from the id, distributed via spark.range). */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val bytes = Array.tabulate(64 + (id % 64).toInt)(i =>
        ((id * 131 + i * 31) % 251).toByte)
      MediaRow(id, if (id % 3 == 0) "image" else if (id % 3 == 1) "audio"
        else "video", s"synthetic://media/$id", bytes)
    }
  }

  /** The decode/feature-extract stage: batch iteration per partition
    * (mapPartitions keeps the decode loop tight and amortizes any
    * per-batch codec setup, exactly like mapInPandas batches). Images
    * decode through the REAL codec (feature vector = normalized
    * channel means + shape); non-image kinds and undecodable payloads
    * fall back to the declared stub. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition: ImageIO caches its plugin registry per JVM;
      // per-row work is decode only
      rows.map { r =>
        val real =
          if (r.kind == "image") decodeImage(r.content)
          else if (r.kind == "video") // first-frame features, real codec
            AviMjpeg.parse(r.content).flatMap(m => decodeImage(m.frames.head))
          else None
        real match {
          case Some((w, h, mr, mg, mb)) =>
            val feats = Array(
              (mr / 255.0).toFloat, (mg / 255.0).toFloat, (mb / 255.0).toFloat,
              w.toFloat, h.toFloat, w.toFloat / h,
              ((mr + mg + mb) / (3 * 255.0)).toFloat,
              r.content.length.toFloat)
            MediaFeatures(r.media_id, r.kind, w, h,
              r.content.length.toLong, feats)
          case None =>
            val (w, h, feats) = decodeImageStub(r.content)
            MediaFeatures(r.media_id, r.kind, w, h,
              r.content.length.toLong, feats)
        }
      }
    }
  }

  /** Decoded-image statistics as a relational frame — the oracle-
    * checkable face of the real decode: for synthetic PNGs every value
    * is arithmetically predictable from the id, so a SQL oracle can
    * verify the codec path end-to-end. */
  def imageStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeImage(r.content).map { case (w, h, mr, mg, mb) =>
          (r.media_id, w.toLong, h.toLong, mr, mg, mb)
        }
      }
    }.toDF("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
  }

  /** Frame-sample stub: pick every `stride`-th byte window as a "frame"
    * — demonstrates the explode-shaped output schema of frame sampling. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    media.toDF()
      .withColumn("n_frames",
        greatest(floor(length(col("content")) / stride), lit(1)).cast("int"))
      .select(col("media_id"), col("kind"),
        posexplode(transform(sequence(lit(0), col("n_frames") - 1),
          f => xxhash64(col("content"), f))).as(Seq("frame_idx", "frame_sig")))
  }
}
