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
 * statistics. Audio/video remain stubbed (`decodeImageStub` fallback —
 * no such codecs in the JVM), declared rather than faked.
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

  /** STUB decoder for the media kinds the JVM has no codec for
    * (audio/video). Deterministic: outputs derive from the payload. */
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
          if (r.kind == "image") decodeImage(r.content) else None
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
