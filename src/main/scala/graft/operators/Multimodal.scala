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
  * The actual codec work is STUBBED — this container has no image/audio
  * libraries — behind `FakeCodec`, a deterministic stand-in with the real
  * call shape. The Spark-side plumbing (schema, partitioning, batch
  * iteration, column contracts) is real and tested; swapping `FakeCodec`
  * for javacv/ffmpeg is a single-object change.
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

  /** STUB codec: deterministic pure functions of the payload bytes with the
    * signature a real decoder would have. Replace with a real decode when
    * codec libraries are available (`???`-equivalent, but total so the
    * pipeline plumbing stays testable end-to-end). */
  object FakeCodec {
    def decodeMeta(kind: String, bytes: Array[Byte]): MediaMeta = {
      val h = graft.core.ThetaSketch.hashBytes(bytes)
      val w = 64 + (math.abs(h) % 1024).toInt
      val hh = 64 + (math.abs(SplitMix64.mix(h)) % 1024).toInt
      MediaMeta(w, hh, if (kind == "audio") 1 else 3,
        if (kind == "image") 0L else 1000L + math.abs(h) % 600000L)
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

  /** Deterministic synthetic media table (payload bytes from seed). */
  def mediaTable(spark: SparkSession, n: Int, seed: Long = 42L, parts: Int = 8): DataFrame = {
    val rows = (0 until n).map { i =>
      var st = SplitMix64.mix(seed ^ i)
      val kind = Seq("image", "audio", "video")(i % 3)
      val len = 256 + (math.abs(st) % 2048).toInt
      val bytes = new Array[Byte](len)
      var j = 0
      while (j < len) { st = SplitMix64.mix(st); bytes(j) = st.toByte; j += 1 }
      Row(i.toLong, kind, bytes, s"https://media.example/$kind/$i")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), mediaSchema)
  }
}
