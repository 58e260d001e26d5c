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

  test("frame sampling explodes one row per frame") {
    val media = Multimodal.syntheticMedia(spark, 5)
    val frames = Multimodal.sampleFrames(media, stride = 16)
    val counts = frames.groupBy("media_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts.keySet == (0L until 5L).toSet)
    assert(counts.values.forall(_ >= 1))
  }
}
