package graft

import graft.multimodal.MediaPipeline
import graft.multimodal.MediaPipeline.{MediaRow, StubCodec}
import org.scalatest.funsuite.AnyFunSuite

class MediaPipelineSpec extends AnyFunSuite with SparkTestBase {

  test("binary payloads flow through the batch feature kernel deterministically") {
    import spark.implicits._
    val docs = Seq(
      (0L, "an image payload here"),
      (1L, "an audio payload here"),
      (2L, "a video payload here"),
      (3L, "another image payload")
    ).toDF("doc_id", "text")
    val media = MediaPipeline.synthesize(spark, docs)
    val feats = MediaPipeline.extractFeatures(spark, media).collect().sortBy(_.media_id)

    assert(feats.map(_.kind).toSeq == Seq("image", "audio", "video", "image"))
    // features are pure functions of bytes: recompute locally and compare
    media.collect().sortBy(_.media_id).zip(feats).foreach { case (m, f) =>
      assert(StubCodec.decodeFeatures(m) == f)
      assert(f.n_bytes == m.bytes.length)
    }
    // kind-specific fields
    assert(feats(1).meanLuma == 0.0 && feats(1).rmsLevel > 0.0)
    assert(feats(2).frameCount > 0)
    assert(feats(0).frameCount == 0 && feats(0).rmsLevel == 0.0)
  }

  test("schema carries binary column + typed metadata") {
    import spark.implicits._
    val media: org.apache.spark.sql.DataFrame =
      MediaPipeline.synthesize(spark, Seq((7L, "xyz")).toDF("doc_id", "text")).toDF()
    val types = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("bytes") == "binary")
    assert(types("width") == "integer" && types("durationMs") == "integer")
  }
}
