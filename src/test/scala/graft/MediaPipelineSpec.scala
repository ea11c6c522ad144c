package graft

import graft.multimodal.{BinaryMedia, MediaPipeline}
import graft.multimodal.BinaryMedia.{Bmp, Gvf, RealCodec, Wav}
import graft.multimodal.MediaPipeline.{MediaRow, StubCodec}
import org.scalatest.funsuite.AnyFunSuite

class MediaPipelineSpec extends AnyFunSuite with SparkTestBase {

  test("BMP codec: hand-computed Rec.601 luma, padding, top-down variant, truncation") {
    // 1×1 pure red: luma = 299/1000
    val red = Bmp.encode(1, 1, Array(255.toByte, 0, 0))
    assert(Bmp.meanLuma(red) == 0.299)
    // 2×1 white+black: (255000 + 0) / (2*255000) = 0.5
    val wb = Bmp.encode(2, 1, Array[Byte](-1, -1, -1, 0, 0, 0))
    assert(Bmp.meanLuma(wb) == 0.5)
    // width 5 ⇒ 15-byte rows padded to 16: padding must not enter the sum
    val rgb = Array.tabulate(5 * 4 * 3)(i => ((i * 37) % 256).toByte)
    val padded = Bmp.encode(5, 4, rgb)
    val expected = rgb.grouped(3).map { p =>
      299L * (p(0) & 0xff) + 587L * (p(1) & 0xff) + 114L * (p(2) & 0xff)
    }.sum.toDouble / (20L * 1000 * 255)
    assert(Bmp.meanLuma(padded) == expected)
    // top-down BMP (negative height) decodes to the same luma
    val topDown = padded.clone()
    val bb = java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -4)
    assert(Bmp.meanLuma(topDown) == expected) // luma is row-order-invariant
    // truncated pixel data refused
    assertThrows[IllegalArgumentException](Bmp.meanLuma(padded.take(padded.length - 8)))
    assertThrows[IllegalArgumentException](Bmp.meanLuma("not a bmp at all".getBytes))
  }

  test("WAV codec: RIFF chunk walk, hand-computed RMS") {
    // two samples ±16384: rms = 16384/32768 = 0.5
    val wav = Wav.encode(Array[Short](16384, -16384), 8000)
    assert(Wav.rms(wav) == 0.5)
    // silence
    assert(Wav.rms(Wav.encode(Array[Short](0, 0, 0), 8000)) == 0.0)
    // full-scale negative: 32768/32768 = 1.0
    assert(Wav.rms(Wav.encode(Array[Short](Short.MinValue), 8000)) == 1.0)
    // an extra chunk between fmt and data must be skipped by the walk
    val withExtra = {
      val b = java.nio.ByteBuffer.allocate(wav.length + 12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(wav, 0, 36) // RIFF..WAVE + fmt chunk
      b.put("LIST".getBytes).putInt(3).put(Array[Byte](1, 2, 3)).put(0.toByte) // odd size + pad
      b.put(wav, 36, wav.length - 36) // data chunk
      val out = b.array()
      // fix RIFF size field
      java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(4, out.length - 8)
      out
    }
    assert(Wav.rms(withExtra) == 0.5)
    assertThrows[IllegalArgumentException](Wav.rms("RIFFxxxxNOPE".getBytes))
  }

  test("GVF video: frame count + every-2nd-frame luma sampling") {
    val f0 = Bmp.encode(1, 1, Array(255.toByte, 0, 0)) // 0.299
    val f1 = Bmp.encode(1, 1, Array[Byte](0, 0, 0)) // skipped (odd index)
    val f2 = Bmp.encode(1, 1, Array[Byte](-1, -1, -1)) // 1.0
    val (n, luma) = Gvf.sampleLuma(Gvf.encode(Seq(f0, f1, f2)), sampleEvery = 2)
    assert(n == 3)
    assert(luma == (0.299 + 1.0) / 2)
  }

  test("synthesizeReal payloads decode with the REAL codec end-to-end in Spark") {
    import testImplicits._
    val docs = Seq(
      (0L, "an image doc"), (1L, "an audio doc"), (2L, "a video doc"),
      (3L, "another image"), (4L, "more audio here")
    ).toDF("doc_id", "text")
    val media = MediaPipeline.synthesizeReal(spark, docs)
    val feats = MediaPipeline.extractFeatures(spark, media, RealCodec)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.kind).toSeq == Seq("image", "audio", "video", "image", "audio"))
    // images: genuine pixel luma in (0,1); audio: genuine PCM rms in (0,1]
    assert(feats(0).meanLuma > 0 && feats(0).meanLuma < 1 && feats(0).rmsLevel == 0.0)
    assert(feats(1).rmsLevel > 0 && feats(1).rmsLevel <= 1 && feats(1).meanLuma == 0.0)
    assert(feats(2).frameCount == 3 && feats(2).meanLuma > 0)
    // decode is a pure function of the payload: recompute locally
    media.collect().sortBy(_.media_id).zip(feats).foreach { case (m, f) =>
      assert(RealCodec.decodeFeatures(m) == f)
    }
    // determinism across invocations (same seed text ⇒ same bytes ⇒ same features)
    val again = MediaPipeline.extractFeatures(spark,
      MediaPipeline.synthesizeReal(spark, docs), RealCodec).collect().sortBy(_.media_id)
    assert(again.toSeq == feats.toSeq)
  }

  test("binary payloads flow through the batch feature kernel deterministically") {
    import testImplicits._
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
    import testImplicits._
    val media: org.apache.spark.sql.DataFrame =
      MediaPipeline.synthesize(spark, Seq((7L, "xyz")).toDF("doc_id", "text")).toDF()
    val types = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("bytes") == "binary")
    assert(types("width") == "integer" && types("durationMs") == "integer")
  }
}
