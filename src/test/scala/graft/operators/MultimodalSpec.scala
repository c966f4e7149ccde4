package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("media table has the binary+metadata schema") {
    val m = Multimodal.syntheticMedia(spark, sf)
    val fields = m.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(fields("media") == "binary")
    assert(fields("meta").startsWith("struct<kind:string,width:int"))
    assert(m.count() > 0)
  }

  test("decodeFrames samples every k-th frame with w*h pixels") {
    val m = Multimodal.syntheticMedia(spark, sf)
    val frames = Multimodal.decodeFrames(m, stride = 2)
    val f = frames.head()
    val meta = m.filter(_.media_id == f.media_id).head().meta
    assert(f.pixels.length == meta.width * meta.height)
    assert(frames.filter(_.frame_idx % 2 != 0).isEmpty)
  }

  test("resize produces the target grid deterministically") {
    val m = Multimodal.syntheticMedia(spark, sf).limit(4)
    val first = m.head()
    val meta = first.meta
    val firstId = first.media_id
    val frames = Multimodal.decodeFrames(m.filter(_.media_id == firstId), 1)
    val small = Multimodal.resize(frames, meta.width, meta.height, 8, 6)
    assert(small.collect().forall(_.pixels.length == 48))
  }

  test("extractFeatures yields fixed-width vectors ready for ANN") {
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticMedia(spark, sf), dim = 64)
    val rows = feats.collect()
    assert(rows.nonEmpty && rows.forall(_.feature.length == 64))
    // deterministic: same input → same feature
    val again = Multimodal.extractFeatures(
      Multimodal.syntheticMedia(spark, sf), dim = 64).collect()
    assert(rows.sortBy(_.media_id).map(_.feature.toSeq).toSeq ==
           again.sortBy(_.media_id).map(_.feature.toSeq).toSeq)
  }
}
