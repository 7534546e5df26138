package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.SplitMix64

/** Multimodal (image/audio/video) columns for the training-data pipeline:
  * media is carried as opaque `binary` with typed metadata, processed in
  * per-partition batches (the Scala/Tungsten analog of `mapInPandas`
  * batching: one "decoder" instance per partition, amortized across rows).
  *
  * Codec status (r4): image, audio AND video byte-format work is REAL —
  * the synthetic table carries actual BMP (BITMAPINFOHEADER, 24bpp), WAV
  * (RIFF PCM16 mono) and AVI (RIFF 'AVI ', uncompressed 24bpp DIB
  * streams) payloads; `decodeMeta` parses all three headers and the video
  * lane demuxes genuine '00db' frame chunks out of the 'movi' list.
  * Embeddings come from [[ContentCodec]] — a model-free featurizer over
  * the DECODED signal (histogram + fixed random projection) with honest
  * similarity semantics; a LEARNED encoder (needs a model this container
  * doesn't have) swaps in behind the same signature.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image | audio | video
    StructField("bytes", BinaryType, nullable = false),     // opaque payload
    StructField("source_url", StringType, nullable = false)
  ))

  case class MediaMeta(width: Int, height: Int, channels: Int, durationMs: Long)
  case class Featurized(media_id: Long, kind: String, meta: MediaMeta, embedding: Array[Float])

  /** Real header codecs for the two formats that are pure public byte
    * layouts (no external libs needed): BMP images and RIFF/WAV audio. */
  object Codecs {
    import java.nio.{ByteBuffer, ByteOrder}

    /** One 54-byte 24bpp BMP header writer shared by encode and resize —
      * a header fix must never have to land in two places. */
    private def writeBmpHeader(bb: ByteBuffer, width: Int, height: Int, dataSize: Int): Unit = {
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
        .putInt(0).putInt(54)                       // reserved, pixel offset
      bb.putInt(40).putInt(width).putInt(height)    // BITMAPINFOHEADER
        .putShort(1).putShort(24).putInt(0)         // planes, bpp, BI_RGB
        .putInt(dataSize).putInt(2835).putInt(2835) // size, 72dpi
        .putInt(0).putInt(0)
    }

    /** 24bpp bottom-up BMP with deterministic pixel bytes. */
    def encodeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
      val rowSize = ((width * 3 + 3) / 4) * 4
      val dataSize = rowSize * height
      val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      writeBmpHeader(bb, width, height, dataSize)
      var st = SplitMix64.mix(seed)
      var i = 0
      while (i < dataSize) { st = SplitMix64.mix(st); bb.put(st.toByte); i += 1 }
      bb.array()
    }

    def decodeBmpMeta(bytes: Array[Byte]): MediaMeta = {
      require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
        "not a BMP payload")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val width = bb.getInt(18)
      val height = math.abs(bb.getInt(22)) // negative height = top-down
      val bpp = bb.getShort(28).toInt
      MediaMeta(width, height, bpp / 8, 0L)
    }

    /** RIFF/WAV, PCM16 mono, deterministic samples. */
    def encodeWav(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
      val dataSize = nSamples * 2
      val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(1)                    // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2)  // byte rate
        .putShort(2).putShort(16)                   // block align, bits
      bb.put("data".getBytes).putInt(dataSize)
      var st = SplitMix64.mix(seed)
      var i = 0
      while (i < nSamples) { st = SplitMix64.mix(st); bb.putShort(st.toShort); i += 1 }
      bb.array()
    }

    /** Nearest-neighbor resize of a 24bpp bottom-up BMP — real pixel work
      * on the public byte layout, no external libs. Row padding (rows are
      * 4-byte aligned) is handled on both sides. */
    def resizeBmp(bytes: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
      require(newW > 0 && newH > 0, s"bad target size ${newW}x$newH")
      val src = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
        "not a BMP payload")
      require(src.getShort(28) == 24, "only 24bpp supported")
      val srcW = src.getInt(18)
      val srcH = src.getInt(22)
      require(srcH > 0, "top-down BMP not supported")
      val srcOff = src.getInt(10)
      val srcRow = ((srcW * 3 + 3) / 4) * 4
      // truncated or header-lying payloads fail loudly like every other
      // malformed-input path here, not with an index crash mid-pixel-loop
      require(srcW > 0 && srcOff >= 54 &&
        bytes.length.toLong >= srcOff.toLong + srcH.toLong * srcRow,
        s"BMP payload too short for claimed ${srcW}x$srcH@$srcOff")
      val dstRow = ((newW * 3 + 3) / 4) * 4
      val dataSize = dstRow * newH
      val out = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      writeBmpHeader(out, newW, newH, dataSize)
      val arr = out.array()
      var y = 0
      while (y < newH) {
        val sy = (y.toLong * srcH / newH).toInt
        var x = 0
        while (x < newW) {
          val sx = (x.toLong * srcW / newW).toInt
          val s = srcOff + sy * srcRow + sx * 3
          val d = 54 + y * dstRow + x * 3
          arr(d) = bytes(s); arr(d + 1) = bytes(s + 1); arr(d + 2) = bytes(s + 2)
          x += 1
        }
        y += 1
      }
      arr
    }

    def decodeWavMeta(bytes: Array[Byte]): MediaMeta = {
      require(bytes.length >= 44 &&
        bytes(0) == 'R'.toByte && bytes(8) == 'W'.toByte, "not a WAV payload")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val channels = bb.getShort(22).toInt
      val sampleRate = bb.getInt(24)
      val bitsPerSample = bb.getShort(34).toInt
      val dataSize = bb.getInt(40)
      // fail loudly on layouts this decoder doesn't support (e.g. 4-bit
      // ADPCM would integer-divide to a zero byte width) instead of an
      // ArithmeticException mid-partition
      require(channels > 0 && sampleRate > 0 && bitsPerSample >= 8,
        s"unsupported WAV layout: ch=$channels rate=$sampleRate bits=$bitsPerSample")
      val durationMs = dataSize.toLong * 1000 / (sampleRate.toLong * channels * (bitsPerSample / 8))
      MediaMeta(0, 0, channels, durationMs)
    }

    // ------------------------------------------------------------- AVI
    // RIFF 'AVI ' with one uncompressed 24bpp DIB video stream — the same
    // public-byte-layout discipline as the BMP/WAV codecs (MainAVIHeader /
    // AVIStreamHeader / BITMAPINFOHEADER are all documented structures).
    // Real container DEMUXING: frames are '00db' chunks in the 'movi'
    // LIST, found by walking the chunk tree, not by offset guessing.

    private def fourcc(s: String): Int =
      (s.charAt(0) & 0xFF) | ((s.charAt(1) & 0xFF) << 8) |
        ((s.charAt(2) & 0xFF) << 16) | ((s.charAt(3) & 0xFF) << 24)

    /** Single-stream uncompressed AVI with deterministic frame pixels. */
    def encodeAvi(width: Int, height: Int, fps: Int, nFrames: Int, seed: Long): Array[Byte] = {
      require(width > 0 && height > 0 && fps > 0 && nFrames > 0)
      val rowSize = ((width * 3 + 3) / 4) * 4
      val frameSize = rowSize * height
      val framePadded = frameSize + (frameSize & 1)
      val hdrlContent = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40))) // 'hdrl' avih LIST(strl strh strf)
      val moviContent = 4 + nFrames * (8 + framePadded)
      val riffContent = 4 + (8 + hdrlContent) + (8 + moviContent)
      val bb = ByteBuffer.allocate(8 + riffContent).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(fourcc("RIFF")).putInt(riffContent).putInt(fourcc("AVI "))
      // LIST hdrl
      bb.putInt(fourcc("LIST")).putInt(hdrlContent).putInt(fourcc("hdrl"))
      //   avih: MainAVIHeader (56 bytes)
      bb.putInt(fourcc("avih")).putInt(56)
      bb.putInt(1000000 / fps)                   // dwMicroSecPerFrame
        .putInt(frameSize * fps).putInt(0).putInt(0) // maxBytesPerSec, padding, flags (no idx1 -> no HASINDEX)
        .putInt(nFrames).putInt(0).putInt(1).putInt(frameSize) // totalFrames, initial, streams, sugBuf
        .putInt(width).putInt(height)
        .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
      //   LIST strl
      bb.putInt(fourcc("LIST")).putInt(4 + (8 + 56) + (8 + 40)).putInt(fourcc("strl"))
      //     strh: AVIStreamHeader (56 bytes)
      bb.putInt(fourcc("strh")).putInt(56)
      bb.putInt(fourcc("vids")).putInt(fourcc("DIB "))
        .putInt(0).putInt(0)                     // flags, prio+lang
        .putInt(0).putInt(1).putInt(fps)         // initFrames, scale, rate
        .putInt(0).putInt(nFrames)               // start, length (frames)
        .putInt(frameSize).putInt(0).putInt(0)   // sugBuf, quality, sampleSize
        .putShort(0).putShort(0)                 // rcFrame left, top
        .putShort(width.toShort).putShort(height.toShort)
      //     strf: BITMAPINFOHEADER (40 bytes)
      bb.putInt(fourcc("strf")).putInt(40)
      bb.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24).putInt(0)      // planes, bpp, BI_RGB
        .putInt(frameSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      // LIST movi with one 00db chunk per frame
      bb.putInt(fourcc("LIST")).putInt(moviContent).putInt(fourcc("movi"))
      var st = SplitMix64.mix(seed)
      var f = 0
      while (f < nFrames) {
        bb.putInt(fourcc("00db")).putInt(frameSize)
        var i = 0
        while (i < frameSize) { st = SplitMix64.mix(st); bb.put(st.toByte); i += 1 }
        if ((frameSize & 1) == 1) bb.put(0.toByte)
        f += 1
      }
      bb.array()
    }

    /** Walk every chunk of a RIFF tree, descending into LISTs. */
    private def walkRiff(bb: ByteBuffer, from: Int, until: Int)
                        (visit: (Int, Int, Int, Int) => Unit): Unit = {
      var p = from
      while (p + 8 <= until) {
        val cc = bb.getInt(p)
        val sz = bb.getInt(p + 4)
        if (cc == fourcc("LIST") && p + 12 <= until)
          visit(cc, bb.getInt(p + 8), p + 12, sz - 4)
        else visit(cc, 0, p + 8, sz)
        if (cc == fourcc("LIST")) walkRiff(bb, p + 12, math.min(until, p + 8 + sz))(visit)
        p += 8 + sz + (sz & 1)
      }
    }

    /** AVI header round trip: dimensions from avih, channels from strf's
      * bit depth, duration from microSecPerFrame x totalFrames. */
    def decodeAviMeta(bytes: Array[Byte]): MediaMeta = {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 12 && bb.getInt(0) == fourcc("RIFF") &&
        bb.getInt(8) == fourcc("AVI "), "not a RIFF AVI payload")
      var microPerFrame = 0L; var totalFrames = 0L; var w = 0; var h = 0; var bpp = 24
      walkRiff(bb, 12, bytes.length) { (cc, _, dataAt, _) =>
        if (cc == fourcc("avih")) {
          microPerFrame = bb.getInt(dataAt).toLong & 0xFFFFFFFFL
          totalFrames = bb.getInt(dataAt + 16).toLong & 0xFFFFFFFFL
          w = bb.getInt(dataAt + 32)
          h = bb.getInt(dataAt + 36)
        } else if (cc == fourcc("strf")) bpp = bb.getShort(dataAt + 14) & 0xFFFF
      }
      require(w > 0 && h > 0, "AVI: no avih header found")
      MediaMeta(w, h, math.max(1, bpp / 8), microPerFrame * totalFrames / 1000L)
    }

    /** REAL demux: the '##db'/'##dc' frame chunk payloads inside the
      * 'movi' LIST, in stream order. */
    def demuxAviFrames(bytes: Array[Byte]): Array[Array[Byte]] = {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 12 && bb.getInt(0) == fourcc("RIFF") &&
        bb.getInt(8) == fourcc("AVI "), "not a RIFF AVI payload")
      val dbTag = ('d' & 0xFF) | (('b' & 0xFF) << 8)
      val dcTag = ('d' & 0xFF) | (('c' & 0xFF) << 8)
      val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      walkRiff(bb, 12, bytes.length) { (cc, _, dataAt, sz) =>
        val suffix = (cc >>> 16) & 0xFFFF
        if (cc != fourcc("LIST") && (suffix == dbTag || suffix == dcTag))
          out += java.util.Arrays.copyOfRange(bytes, dataAt, dataAt + sz)
      }
      out.toArray
    }

    /** `n` evenly-spaced REAL frames of an AVI payload (all frames when
      * the video has fewer than `n`). */
    def sampleAviFrames(bytes: Array[Byte], n: Int): Array[Array[Byte]] = {
      val frames = demuxAviFrames(bytes)
      if (frames.isEmpty || n <= 0) Array.empty
      else {
        val take = math.min(n, frames.length)
        Array.tabulate(take)(i => frames((i.toLong * frames.length / take).toInt))
      }
    }

    /** Kind-dispatched header decode — every branch is a real parser. */
    def decodeMeta(kind: String, bytes: Array[Byte]): MediaMeta = kind match {
      case "image" => decodeBmpMeta(bytes)
      case "audio" => decodeWavMeta(bytes)
      case "video" => decodeAviMeta(bytes)
      case other   => throw new IllegalArgumentException(s"unknown media kind: $other")
    }
  }

  /** Model-free CONTENT featurizer (upgrades the r3 rolling-hash stand-in):
    * the embedding is a fixed seeded random projection of histograms over
    * the DECODED signal — per-channel pixel-value histograms for images,
    * a PCM amplitude histogram for audio, frame-averaged pixel histograms
    * for video — L2-normalized. Deterministic and dependency-free, with
    * honest similarity semantics: near-identical payloads (a re-encoded
    * copy, a lightly edited frame) land cosine-close because their
    * histograms nearly coincide and the projection is linear, while the
    * old byte-hash stand-in scattered a 1-byte edit across the whole
    * vector. A LEARNED encoder (the production call — no model ships in
    * this sandbox) swaps in behind the same (kind, bytes, dim) signature. */
  object ContentCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    private val PixBins = 16  // per BGR channel -> raw dims 0..47
    private val PcmBins = 32  // amplitude histogram -> raw dims 0..31
    private val RawDim = 3 * PixBins

    /** Normalized per-channel histogram of a 24bpp bottom-up BMP's pixels
      * (row padding skipped). */
    private def bmpHistogram(bytes: Array[Byte]): Array[Double] = {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val w = bb.getInt(18)
      val h = math.abs(bb.getInt(22))
      val off = bb.getInt(10)
      val rowSize = ((w * 3 + 3) / 4) * 4
      val raw = new Array[Double](RawDim)
      var n = 0L
      var y = 0
      while (y < h) {
        val rowAt = off + y * rowSize
        var x = 0
        while (x < w) {
          val p = rowAt + x * 3
          if (p + 2 < bytes.length) {
            var c = 0
            while (c < 3) {
              raw(c * PixBins + ((bytes(p + c) & 0xFF) * PixBins) / 256) += 1.0
              c += 1
            }
            n += 1
          }
          x += 1
        }
        y += 1
      }
      if (n > 0) { var i = 0; while (i < raw.length) { raw(i) /= n; i += 1 } }
      raw
    }

    /** Normalized amplitude histogram of PCM16 samples. */
    private def wavHistogram(bytes: Array[Byte]): Array[Double] = {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val raw = new Array[Double](RawDim)
      var n = 0L
      var p = 44
      while (p + 1 < bytes.length) {
        val s = bb.getShort(p).toInt + 32768 // 0..65535
        raw((s * PcmBins) / 65536) += 1.0
        n += 1
        p += 2
      }
      if (n > 0) { var i = 0; while (i < raw.length) { raw(i) /= n; i += 1 } }
      raw
    }

    /** Frame-averaged pixel histogram: frames are headerless 24bpp DIB
      * rows (bottom-up, 4-byte-aligned), so histogram the payload bytes
      * channel-interleaved. */
    private def aviHistogram(bytes: Array[Byte]): Array[Double] = {
      val frames = Codecs.sampleAviFrames(bytes, 4)
      val raw = new Array[Double](RawDim)
      if (frames.isEmpty) return raw
      frames.foreach { f =>
        var i = 0
        while (i + 2 < f.length) { // BGR triples; alignment padding is noise-level
          var c = 0
          while (c < 3) {
            raw(c * PixBins + ((f(i + c) & 0xFF) * PixBins) / 256) += 1.0
            c += 1
          }
          i += 3
        }
      }
      var n = 0.0
      raw.foreach(n += _)
      if (n > 0) { var i = 0; while (i < raw.length) { raw(i) /= n; i += 1 } }
      raw
    }

    /** Deterministic Rademacher (+1/-1) projection entry for (i, j). */
    @inline private def sign(i: Int, j: Int): Double =
      if ((SplitMix64.mix(0x5851F42D4C957F2DL ^ (i.toLong << 32) ^ j.toLong) & 1L) == 0L)
        1.0 else -1.0

    /** Content embedding: decode -> histogram -> fixed random projection
      * -> L2 normalize. */
    def embed(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      val raw = kind match {
        case "image" => bmpHistogram(bytes)
        case "audio" => wavHistogram(bytes)
        case "video" => aviHistogram(bytes)
        case other   => throw new IllegalArgumentException(s"unknown media kind: $other")
      }
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        var acc = 0.0
        var i = 0
        while (i < raw.length) { acc += raw(i) * sign(i, j); i += 1 }
        out(j) = acc.toFloat
        j += 1
      }
      var n = 0.0
      out.foreach(v => n += v.toDouble * v)
      val inv = if (n == 0) 0f else (1.0 / math.sqrt(n)).toFloat
      out.map(_ * inv)
    }
  }

  /** Batch feature extraction over the media table via `mapPartitions`: one
    * codec/model instance per partition (amortized init — the reason this is
    * NOT a per-row UDF), narrow output rows (id, kind, meta, embedding). */
  def featurize(media: DataFrame, dim: Int = 64): Dataset[Featurized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init goes here (decoder/model handle in production)
        rows.map { case (id, kind, bytes) =>
          Featurized(id, kind, Codecs.decodeMeta(kind, bytes), ContentCodec.embed(kind, bytes, dim))
        }
      }
  }

  /** Batch image resize over the media table (images only, other kinds pass
    * through untouched): same mapPartitions batching as featurize — one
    * decoder instance per partition, never a per-row UDF. The BMP path does
    * real pixel resampling (Codecs.resizeBmp); swapping in a JPEG/PNG codec
    * is a Codecs-only change. */
  def resizeImages(media: DataFrame, width: Int, height: Int): DataFrame = {
    // schema-preserving: every input column (source_url, provenance, ...)
    // passes through — only the image rows' bytes cell is rewritten
    val schema = media.schema
    val kindIdx = schema.fieldIndex("kind")
    val bytesIdx = schema.fieldIndex("bytes")
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.getString(kindIdx) == "image") {
          val vals = r.toSeq.toArray
          vals(bytesIdx) = Codecs.resizeBmp(r.getAs[Array[Byte]](bytesIdx), width, height)
          Row.fromSeq(vals.toIndexedSeq)
        } else r
      }
    }
  }

  /** Video frame sampling as a generator: one output row per sampled frame,
    * `(media_id, frame_idx, frame_bytes)` — REAL container demuxing: the
    * frames are the '00db' DIB chunk payloads of the AVI's 'movi' list,
    * evenly sampled. The explode-style plumbing a frame-dedup lane (hash
    * frames, join back) builds on. */
  def sampleFrames(media: DataFrame, framesPerVideo: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val frames = media.filter(col("kind") === "video")
      .select("media_id", "bytes").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Codecs.sampleAviFrames(bytes, framesPerVideo).zipWithIndex.map {
          case (frame, idx) => (id, idx, frame)
        }
      }
    frames.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Deterministic synthetic media table: REAL BMP, WAV and AVI payloads —
    * every kind is parsed back by the codecs above, byte-format work
    * included. */
  def mediaTable(spark: SparkSession, n: Int, seed: Long = 42L, parts: Int = 8): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes = kind match {
        case "image" => Codecs.encodeBmp(4 + i % 60, 4 + (i * 7) % 44, seed ^ i)
        case "audio" => Codecs.encodeWav(8000, 800 + (i * 37) % 4000, seed ^ i)
        case _ => Codecs.encodeAvi(4 + i % 28, 4 + (i * 5) % 20,
          10 + i % 20, 4 + i % 9, seed ^ i)
      }
      Row(i.toLong, kind, bytes, s"https://media.example/$kind/$i")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), mediaSchema)
  }
}
