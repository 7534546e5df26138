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
  * Codec status (r2): image and audio metadata decode is REAL — the
  * synthetic table carries actual BMP (BITMAPINFOHEADER, 24bpp) and WAV
  * (RIFF PCM16 mono) payloads and `decodeMeta` parses their headers, so
  * the lane exercises genuine byte-format parsing end to end. Video
  * container demuxing and learned embeddings remain STUBBED behind
  * `FakeCodec` (no ffmpeg/model in this container) — deterministic
  * stand-ins with the real call shape; swapping them for javacv/ffmpeg is
  * a single-object change.
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
  }

  /** STUB codec for what genuinely needs external libraries (video
    * demuxing, learned embeddings): deterministic pure functions of the
    * payload bytes with the signature a real decoder would have. */
  object FakeCodec {
    def decodeMeta(kind: String, bytes: Array[Byte]): MediaMeta = kind match {
      case "image" => Codecs.decodeBmpMeta(bytes)
      case "audio" => Codecs.decodeWavMeta(bytes)
      case _ => // video: container demuxing stubbed
        val h = graft.core.ThetaSketch.hashBytes(bytes)
        MediaMeta(64 + (math.abs(h) % 1024).toInt,
          64 + (math.abs(SplitMix64.mix(h)) % 1024).toInt, 3,
          1000L + math.abs(h) % 600000L)
    }

    /** Deterministic fixed-dim pseudo-embedding (rolling-hash features). */
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < bytes.length) {
        h = SplitMix64.mix(h ^ bytes(i))
        out((i % dim)) += (h.toDouble / Long.MaxValue.toDouble).toFloat
        i += 1
      }
      // L2 normalize
      var n = 0.0
      out.foreach(v => n += v * v)
      val inv = if (n == 0) 0f else (1.0 / math.sqrt(n)).toFloat
      out.map(_ * inv)
    }

    /** Deterministic n evenly-spaced "frames" (byte slices) of a video. */
    def sampleFrames(bytes: Array[Byte], n: Int): Array[Array[Byte]] = {
      if (bytes.isEmpty || n <= 0) return Array.empty
      val stride = math.max(1, bytes.length / n)
      (0 until math.min(n, bytes.length)).map { i =>
        val from = i * stride
        java.util.Arrays.copyOfRange(bytes, from, math.min(from + stride, bytes.length))
      }.toArray
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
          Featurized(id, kind, FakeCodec.decodeMeta(kind, bytes), FakeCodec.embed(bytes, dim))
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
    * `(media_id, frame_idx, frame_bytes)` — the explode-style plumbing a
    * real frame-dedup lane (hash frames, join back) builds on. */
  def sampleFrames(media: DataFrame, framesPerVideo: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val frames = media.filter(col("kind") === "video")
      .select("media_id", "bytes").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        FakeCodec.sampleFrames(bytes, framesPerVideo).zipWithIndex.map {
          case (frame, idx) => (id, idx, frame)
        }
      }
    frames.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Deterministic synthetic media table: REAL BMP and WAV payloads for
    * image/audio rows (parsed back by the codecs above); opaque bytes for
    * video rows (demuxing stubbed). */
  def mediaTable(spark: SparkSession, n: Int, seed: Long = 42L, parts: Int = 8): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes = kind match {
        case "image" => Codecs.encodeBmp(4 + i % 60, 4 + (i * 7) % 44, seed ^ i)
        case "audio" => Codecs.encodeWav(8000, 800 + (i * 37) % 4000, seed ^ i)
        case _ =>
          var st = SplitMix64.mix(seed ^ i)
          val len = 256 + (math.abs(st) % 2048).toInt
          val out = new Array[Byte](len)
          var j = 0
          while (j < len) { st = SplitMix64.mix(st); out(j) = st.toByte; j += 1 }
          out
      }
      Row(i.toLong, kind, bytes, s"https://media.example/$kind/$i")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), mediaSchema)
  }
}
