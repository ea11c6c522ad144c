package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real pure-JVM media codecs — no external libraries, just bytes.
  *
  * Two genuinely-parseable formats (one image, one audio) plus a minimal
  * frame container for the video path:
  *
  *  - BMP, 24-bpp uncompressed (BITMAPINFOHEADER): decoded to mean Rec.601
  *    luma over all pixels. Handles bottom-up AND top-down row order and
  *    4-byte row padding (luma is row-order-invariant, but the parser walks
  *    rows exactly as a renderer would).
  *  - WAV, 16-bit mono PCM (RIFF chunk walk): decoded to RMS level in
  *    [0, 1] (normalized by 32768).
  *  - GVF ("graft video frames"): length-prefixed concatenated BMP frames —
  *    frame-sampling decodes every 2nd frame, the batch shape of real video
  *    feature extraction.
  *
  * Encoders exist so tests and synthesis produce REAL decodable payloads
  * deterministically (no external fixture data). All arithmetic is integer
  * accumulation + one final IEEE division/sqrt, so features are exact and
  * reproducible across JVMs.
  *
  * Reference ancestry: the decode-then-kernel per-blob shape of
  * `cv2.imread` + per-image kernels (`/root/reference/src/controller/
  * idcardprocesser.py:132`, `pagepredictor.py:260-340`).
  */
object BinaryMedia {

  // ------------------------------------------------------------------ BMP

  object Bmp {
    private val FileHeaderSize = 14
    private val InfoHeaderSize = 40

    private def rowStride(width: Int): Int = ((width * 3) + 3) & ~3

    /** 24-bpp bottom-up BMP from packed RGB rows (top-to-bottom, 3 bytes
      * per pixel, no padding in the input). */
    def encode(width: Int, height: Int, rgbTopDown: Array[Byte]): Array[Byte] = {
      require(rgbTopDown.length == width * height * 3, "need 3 bytes/pixel")
      val stride = rowStride(width)
      val dataSize = stride * height
      val total = FileHeaderSize + InfoHeaderSize + dataSize
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(total)
        .putShort(0).putShort(0).putInt(FileHeaderSize + InfoHeaderSize)
      b.putInt(InfoHeaderSize).putInt(width).putInt(height) // +height = bottom-up
        .putShort(1).putShort(24).putInt(0).putInt(dataSize)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      val row = new Array[Byte](stride) // zero padding bytes
      var y = height - 1
      while (y >= 0) { // bottom-up: last image row first
        var x = 0
        while (x < width) {
          val src = (y * width + x) * 3
          // BMP stores BGR
          row(x * 3) = rgbTopDown(src + 2)
          row(x * 3 + 1) = rgbTopDown(src + 1)
          row(x * 3 + 2) = rgbTopDown(src)
          x += 1
        }
        b.put(row)
        y -= 1
      }
      b.array()
    }

    /** Mean Rec.601 luma in [0, 1] over every pixel of a 24-bpp BMP.
      * Integer-weighted (299/587/114 per mille) accumulation — exact. */
    def meanLuma(bytes: Array[Byte]): Double = {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= FileHeaderSize + InfoHeaderSize &&
        b.get(0) == 'B' && b.get(1) == 'M', "not a BMP payload")
      val dataOffset = b.getInt(10)
      val width = b.getInt(18)
      val rawHeight = b.getInt(22) // negative ⇒ top-down
      val bpp = b.getShort(28)
      val compression = b.getInt(30)
      require(bpp == 24 && compression == 0, s"unsupported BMP: bpp=$bpp compression=$compression")
      val height = math.abs(rawHeight)
      val stride = rowStride(width)
      require(bytes.length >= dataOffset + stride * height, "truncated BMP pixel data")
      var sum = 0L
      var y = 0
      while (y < height) {
        val rowStart = dataOffset + y * stride
        var x = 0
        while (x < width) {
          val p = rowStart + x * 3
          val bl = bytes(p) & 0xff
          val g = bytes(p + 1) & 0xff
          val r = bytes(p + 2) & 0xff
          sum += 299L * r + 587L * g + 114L * bl
          x += 1
        }
        y += 1
      }
      val nPix = width.toLong * height
      if (nPix == 0) 0.0 else sum.toDouble / (nPix * 1000L * 255L)
    }
  }

  // ------------------------------------------------------------------ WAV

  object Wav {
    /** 16-bit mono PCM RIFF/WAVE. */
    def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataSize = samples.length * 2
      val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits/sample
      b.put("data".getBytes).putInt(dataSize)
      samples.foreach(b.putShort)
      b.array()
    }

    /** RMS level in [0, 1] of 16-bit mono PCM, found by a proper RIFF chunk
      * walk (skips any non-`data` chunks, honors odd-size padding). */
    def rms(bytes: Array[Byte]): Double = {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 44 &&
        new String(bytes, 0, 4) == "RIFF" && new String(bytes, 8, 4) == "WAVE",
        "not a WAV payload")
      var pos = 12
      var bitsPerSample = -1
      var channels = -1
      var dataStart = -1
      var dataLen = -1
      while (pos + 8 <= bytes.length && (dataStart < 0 || bitsPerSample < 0)) {
        val id = new String(bytes, pos, 4)
        val size = b.getInt(pos + 4)
        if (id == "fmt ") {
          require(b.getShort(pos + 8) == 1, "only PCM WAV supported")
          channels = b.getShort(pos + 10)
          bitsPerSample = b.getShort(pos + 22)
        } else if (id == "data") {
          dataStart = pos + 8
          dataLen = size
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(bitsPerSample == 16 && channels == 1, "only 16-bit mono supported")
      require(dataStart > 0 && dataStart + dataLen <= bytes.length, "truncated WAV data")
      val n = dataLen / 2
      if (n == 0) return 0.0
      var sumSq = 0L
      var i = 0
      while (i < n) {
        val s = b.getShort(dataStart + i * 2).toLong
        sumSq += s * s
        i += 1
      }
      math.sqrt(sumSq.toDouble / n) / 32768.0
    }
  }

  // ------------------------------------------------------------ GVF video

  /** Minimal frame container: magic "GVF0", frame count, then per-frame
    * [int32 length][BMP bytes]. Stands in for a real container so the
    * frame-walk + frame-sample decode path is genuinely exercised. */
  object Gvf {
    private val Magic = Array[Byte]('G', 'V', 'F', '0')

    def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
      val total = 8 + frames.map(4 + _.length).sum
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      b.put(Magic).putInt(frames.length)
      frames.foreach { f => b.putInt(f.length); b.put(f) }
      b.array()
    }

    /** (frameCount, mean luma over every `sampleEvery`-th frame). */
    def sampleLuma(bytes: Array[Byte], sampleEvery: Int): (Int, Double) = {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 8 && bytes.take(4).sameElements(Magic), "not a GVF payload")
      val n = b.getInt(4)
      var pos = 8
      var i = 0
      var lumaSum = 0.0
      var sampled = 0
      while (i < n) {
        val len = b.getInt(pos)
        pos += 4
        if (i % sampleEvery == 0) {
          lumaSum += Bmp.meanLuma(java.util.Arrays.copyOfRange(bytes, pos, pos + len))
          sampled += 1
        }
        pos += len
        i += 1
      }
      (n, if (sampled == 0) 0.0 else lumaSum / sampled)
    }
  }

  // ------------------------------------------------------------ the codec

  /** The REAL codec behind [[MediaPipeline.MediaCodec]]: parses actual
    * pixels and PCM samples. Replaces [[MediaPipeline.StubCodec]] wherever
    * payloads are real BMP/WAV/GVF bytes. */
  object RealCodec extends MediaPipeline.MediaCodec {
    def decodeFeatures(r: MediaPipeline.MediaRow): MediaPipeline.MediaFeatures =
      r.kind match {
        case "image" =>
          MediaPipeline.MediaFeatures(r.media_id, r.kind, r.bytes.length,
            meanLuma = Bmp.meanLuma(r.bytes), frameCount = 0, rmsLevel = 0.0)
        case "audio" =>
          MediaPipeline.MediaFeatures(r.media_id, r.kind, r.bytes.length,
            meanLuma = 0.0, frameCount = 0, rmsLevel = Wav.rms(r.bytes))
        case "video" =>
          val (frames, luma) = Gvf.sampleLuma(r.bytes, sampleEvery = 2)
          MediaPipeline.MediaFeatures(r.media_id, r.kind, r.bytes.length,
            meanLuma = luma, frameCount = frames, rmsLevel = 0.0)
        case other => sys.error(s"unknown media kind: $other")
      }
  }
}
