package graft.pipeline

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media pipeline: synthetic -> features, deterministic, partition-local") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 30)
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(r => r.width >= 16 && r.height >= 16))
    // deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 30))
      .collect().map(r => (r.media_id, r.features.toSeq)).toMap
    assert(rows.forall(r => again(r.media_id) == r.features.toSeq))
  }

  test("real PNG decode recovers exact dimensions and channel means") {
    val media = Multimodal.syntheticPngMedia(spark, 40)
    val stats = Multimodal.imageStats(media)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(stats.length == 40, "every synthetic PNG must decode")
    stats.foreach { case (id, w, h, mr, mg, mb) =>
      assert(w == 8 + id % 16)
      assert(h == 8 + (id * 7) % 16)
      assert(mr == ((id * 13) % 256).toDouble) // solid color: exact mean
      assert(mg == ((id * 29) % 256).toDouble)
      assert(mb == ((id * 47) % 256).toDouble)
    }
    // extractFeatures routes images through the real codec too
    val f = Multimodal.extractFeatures(media).collect()
    assert(f.forall(r => r.width == 8 + r.media_id % 16))
    // garbage bytes don't crash the image path — they fall to the stub
    val garbage = Multimodal.syntheticMedia(spark, 6) // payloads aren't PNGs
    assert(Multimodal.imageStats(garbage).count() == 0)
    assert(Multimodal.extractFeatures(garbage).count() == 6)
    // a CORRUPT png (valid signature, damaged body) makes ImageIO.read
    // THROW rather than return null — must degrade, not kill the job
    val corrupt = Multimodal.syntheticPng(3).take(40)
    val corruptDs = spark.createDataset(Seq(
      Multimodal.MediaRow(99, "image", "synthetic://corrupt", corrupt)))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    assert(Multimodal.imageStats(corruptDs).count() == 0)
    assert(Multimodal.extractFeatures(corruptDs).count() == 1)
  }

  test("real WAV decode round-trips the synthetic square waves exactly") {
    val media = Multimodal.syntheticWavMedia(spark, 24)
    val rows = Multimodal.audioStats(media)
      .as[(Long, Long, Long, Long, Double, Long, Long)].collect()
    assert(rows.length == 24) // every payload decoded — real codec path
    rows.foreach { case (id, sr, ch, n, rms, zc, durUs) =>
      val hp = 8 + (id % 8); val cyc = 10 + (id % 5)
      assert(sr == 8000 + (id % 4) * 4000)
      assert(ch == 1L)
      assert(n == 2 * hp * cyc)
      assert(rms == (1000 + (id * 17) % 20000).toDouble) // EXACT
      assert(zc == 2 * cyc - 1)
      assert(durUs == n * 1000000L / sr)
    }
    // non-audio payloads are "not decodable", never a crash
    val garbage = Multimodal.syntheticMedia(spark, 5)
    assert(Multimodal.audioStats(garbage).count() == 0)
    // a WAV truncated INSIDE the header is not decodable audio (the
    // codec throws; a body-truncated file by contrast decodes its
    // surviving samples — lenient, like the reference's partial reads)
    val corrupt = Multimodal.syntheticWav(3).take(20)
    val corruptDs = spark.createDataset(Seq(
      Multimodal.MediaRow(99, "audio", "synthetic://corrupt", corrupt)))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    assert(Multimodal.audioStats(corruptDs).count() == 0)
  }

  test("frame sampling explodes one row per frame") {
    val media = Multimodal.syntheticMedia(spark, 5)
    val frames = Multimodal.sampleFrames(media, stride = 16)
    val counts = frames.groupBy("media_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts.keySet == (0L until 5L).toSet)
    assert(counts.values.forall(_ >= 1))
  }

  test("AVI/MJPEG writer-demuxer roundtrip preserves frames and headers") {
    val jpeg = { // one real JPEG via ImageIO
      val img = new java.awt.image.BufferedImage(20, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos); bos.toByteArray
    }
    val avi = AviMjpeg.write(Seq(jpeg, jpeg, jpeg), 20, 12, fps = 25)
    val m = AviMjpeg.parse(avi).get
    assert(m.width == 20 && m.height == 12)
    assert(m.fps == 25 && m.usPerFrame == 40000)
    assert(m.nFrames == 3 && m.frames.forall(_.sameElements(jpeg)))
    assert(m.durationUs == 120000L)
    // odd-length frame payloads survive word-alignment padding
    val odd = jpeg :+ 0x7F.toByte
    val m2 = AviMjpeg.parse(AviMjpeg.write(Seq(odd, odd), 20, 12, 10)).get
    assert(m2.nFrames == 2 && m2.frames.forall(_.length == odd.length))
    // garbage and truncation are "not a video", never a crash
    assert(AviMjpeg.parse(Array[Byte](1, 2, 3)).isEmpty)
    assert(AviMjpeg.parse(avi.take(40)).isEmpty)
    assert(AviMjpeg.parse("RIFF1234WAVE".getBytes).isEmpty)
    // a hostile chunk size near Int.MaxValue must fail the (long-space)
    // bounds check, not overflow past it and crash
    val hostile = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(12).put("AVI ".getBytes)
      .put("00dc".getBytes).putInt(0x7FFFFFF8).array()
    assert(AviMjpeg.parse(hostile).isEmpty)
    // frame chunks of OTHER streams ('01dc' when video is stream 0)
    // must not inflate the frame count
    val stray = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("01dc".getBytes).putInt(4).putInt(0xDEAD).array()
    val m3 = AviMjpeg.parse(avi ++ stray).get
    assert(m3.nFrames == 3)
  }

  test("AVI parser survives byte-flip fuzzing without throwing") {
    // the parser runs on arbitrary 'video'-kind payloads inside
    // executors — any mutation must yield Some/None, never an exception
    val base = Multimodal.syntheticAvi(7)
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val mutated = base.clone()
      (1 to 1 + rnd.nextInt(4)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      AviMjpeg.parse(mutated) // must not throw
    }
    // truncations at every prefix length of the header region
    (0 until 200).foreach(n => AviMjpeg.parse(base.take(n)))
  }

  test("AVI parser bounds LIST nesting instead of overflowing the stack") {
    // thousands of nested 12-byte LIST headers: each level declares a
    // size covering the rest of the file. Must return None (depth cap),
    // not StackOverflowError escaping the Option contract.
    val levels = 20000
    val inner = 4 // innermost payload
    val buf = java.nio.ByteBuffer
      .allocate(12 + levels * 12 + inner)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val total = buf.capacity()
    buf.put("RIFF".getBytes).putInt(total - 8).put("AVI ".getBytes)
    (0 until levels).foreach { i =>
      val remaining = total - 12 - i * 12 - 8 // this LIST's body size
      buf.put("LIST".getBytes).putInt(remaining).put("obfu".getBytes)
    }
    buf.putInt(0)
    assert(AviMjpeg.parse(buf.array()).isEmpty)
  }

  test("real video decode: closed-form stats and true per-frame decode") {
    val media = Multimodal.syntheticAviMedia(spark, 25)
    val stats = Multimodal.videoStats(media)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.length == 25, "every synthetic AVI must demux")
    stats.foreach { case (id, w, h, fps, nf, ok, durUs) =>
      assert(w == 16 + (id % 8) * 2)
      assert(h == 16 + ((id * 3) % 8) * 2)
      assert(fps == 10 + id % 5)
      assert(nf == 3 + id % 4)
      assert(ok == nf, "every JPEG frame must decode at header dims")
      assert(durUs == nf * (1000000L / fps))
    }
    // video frame sampling: stride 2 keeps ceil(n/2) frames, real dims
    val sampled = Multimodal.sampleVideoFrames(media, stride = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(sampled.forall { case (id, i, w, h, nb) =>
      i % 2 == 0 && w == 16 + (id % 8) * 2 && nb > 0 })
    // extractFeatures uses the real first-frame decode for videos
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(f => f.width == 16 + (f.media_id % 8) * 2))
  }
}
