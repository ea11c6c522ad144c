package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for the training-data pipeline: media payloads
  * travel as opaque BINARY columns with typed metadata, and decode /
  * feature-extract / resize / frame-sample run as per-partition batch
  * kernels — the same seam as the text extraction kernels.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[StubCodec]] derives deterministic pseudo-features from the
  * bytes. Everything around it — schema, partitioning, batch shape,
  * metadata plumbing — is real and tested, so a real codec drops into
  * [[MediaCodec]] without touching the pipeline.
  *
  * Reference ancestry: `cv2.imread` + per-image kernels
  * (`/root/reference/src/controller/idcardprocesser.py:132`,
  * `src/controller/pagepredictor.py:260-340`) — the decode-then-kernel
  * per-blob shape, distributed.
  */
object MediaPipeline {

  /** One media object: payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int, // images/video: pixels; audio: 0
      height: Int,
      durationMs: Int // audio/video; images: 0
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      // decoded features (stub-deterministic):
      meanLuma: Double, // image/video
      frameCount: Int, // video frame-sample count
      rmsLevel: Double // audio
  )

  /** Pluggable codec seam — swap [[StubCodec]] for a real decoder. */
  trait MediaCodec extends Serializable {
    def decodeFeatures(row: MediaRow): MediaFeatures
  }

  /** Deterministic fake codec: features are pure functions of the payload
    * bytes (rolling hash), so tests have exact expectations. CLEARLY A STUB
    * — no real pixels/samples are decoded in this sandbox. */
  object StubCodec extends MediaCodec {
    private def hash(bytes: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h & Long.MaxValue
    }
    def decodeFeatures(r: MediaRow): MediaFeatures = {
      val h = hash(r.bytes)
      MediaFeatures(
        r.media_id, r.kind, r.bytes.length,
        meanLuma = if (r.kind == "audio") 0.0 else (h % 256).toDouble / 255.0,
        frameCount = if (r.kind == "video") 1 + (h % 30).toInt else 0,
        rmsLevel = if (r.kind == "audio") ((h >> 8) % 1000).toDouble / 1000.0 else 0.0
      )
    }
  }

  /** Batch feature extraction: mapPartitions so a real codec can amortize
    * per-task init (model load, decoder context) exactly like the reference's
    * per-daemon model loads (`server_so.py:100-103`). */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it => it.map(codec.decodeFeatures) }
  }

  /** Deterministic synthetic media table derived from a text table: payload
    * bytes = UTF-8 of the text (an opaque blob as far as the pipeline is
    * concerned), kind round-robined, metadata derived. No external data. */
  def synthesize(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      MediaRow(id, kind, bytes,
        width = if (kind == "audio") 0 else 640,
        height = if (kind == "audio") 0 else 480,
        durationMs = if (kind == "image") 0 else bytes.length)
    }
  }
}
