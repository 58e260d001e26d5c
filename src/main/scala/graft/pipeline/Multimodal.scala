package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, processed in batch-shaped partition
 * passes.
 *
 * The decode step is STUBBED (no image/audio codecs in this
 * environment): `decodeImageStub` derives deterministic fake
 * width/height/features from the bytes, so the Spark-side plumbing —
 * schema, partitioning, batch iteration, feature schema — is real and
 * testable, and swapping in a real codec is a one-function change.
 *
 * Scale notes: media batches flow through `mapPartitions` on a typed
 * Dataset — the Scala analogue of `mapInPandas` batch processing; rows
 * never leave the executor, and the binary payload is projected only
 * when the decode stage actually runs.
 */
object Multimodal {

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

  /** STUB decoder — replace with a real codec binding in production.
    * Deterministic: all outputs derive from the payload bytes. */
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
    * per-batch codec setup, exactly like mapInPandas batches). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition: real codecs would init here, once per batch
      rows.map { r =>
        val (w, h, feats) = decodeImageStub(r.content)
        MediaFeatures(r.media_id, r.kind, w, h, r.content.length.toLong, feats)
      }
    }
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
