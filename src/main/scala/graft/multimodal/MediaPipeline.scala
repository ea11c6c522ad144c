package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for the training-data pipeline: media payloads
  * travel as opaque BINARY columns with typed metadata, and decode /
  * feature-extract / resize / frame-sample run as per-partition batch
  * kernels — the same seam as the text extraction kernels.
  *
  * Two codecs plug into the [[MediaCodec]] seam: [[BinaryMedia.RealCodec]]
  * genuinely parses BMP pixels / WAV PCM / GVF frames (pure JVM, no
  * external libraries — see [[BinaryMedia]]), and [[StubCodec]] derives
  * deterministic pseudo-features from raw bytes for payloads in formats
  * this sandbox can't decode (jpeg/mp3/mp4 would need native libs).
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

  /** Text of row `id` of the deterministic media demo corpus — the SINGLE
    * definition both the query input ([[mediaDocs]]) and the spec-derived
    * golden (tools.GoldenDump) seed their byte streams from. Pure function
    * of the id: no dependence on any external table, so the golden oracle
    * is valid at every scale factor. */
  def mediaDocText(id: Long): String =
    s"media doc $id seed ${java.lang.Long.toHexString(id * 2654435761L + 40503L)}"

  /** Deterministic (doc_id, text) corpus for the media demo query. */
  def mediaDocs(spark: SparkSession, n: Int = 500): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, mediaDocText(i.toLong)))
      .toDF("doc_id", "text").repartition(spark.sparkContext.defaultParallelism)
  }

  /** Deterministic media table with REAL decodable payloads: 24-bpp BMP
    * images (5×4, padding path exercised), 16-bit mono PCM WAV audio, and
    * GVF frame-container video — pixel/sample values derived from a rolling
    * hash of the doc text, encoded by [[BinaryMedia]]'s own encoders. No
    * external data; [[BinaryMedia.RealCodec]] genuinely parses these. */
  def synthesizeReal(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      // deterministic byte stream seeded by the text
      var h = 1125899906842597L
      text.foreach(c => h = 31 * h + c)
      def next(): Int = { h = h * 6364136223846793005L + 1442695040888963407L; ((h >>> 33) & 0xff).toInt }
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val (w0, h0) = (5, 4)
      def frame(): Array[Byte] =
        BinaryMedia.Bmp.encode(w0, h0, Array.fill(w0 * h0 * 3)(next().toByte))
      kind match {
        case "image" =>
          MediaRow(id, kind, frame(), w0, h0, 0)
        case "audio" =>
          val samples = Array.fill(240)(((next() << 8) | next()).toShort)
          MediaRow(id, kind, BinaryMedia.Wav.encode(samples, 8000), 0, 0,
            durationMs = 240 * 1000 / 8000)
        case _ =>
          MediaRow(id, kind, BinaryMedia.Gvf.encode(Seq(frame(), frame(), frame())),
            w0, h0, durationMs = 3 * 40) // 25 fps
      }
    }
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
