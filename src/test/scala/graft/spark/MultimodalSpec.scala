package graft.spark

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSuiteBase {

  test("featurize: schema, determinism, normalized embeddings, partition independence") {
    val media = Multimodal.mediaTable(spark, 120, seed = 5L, parts = 6)
    val feats = Multimodal.featurize(media, dim = 32)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "meta", "embedding"))

    val rows = feats.collect().sortBy(_.media_id)
    assert(rows.length == 120)
    rows.foreach { f =>
      assert(f.embedding.length == 32)
      val n = f.embedding.map(x => x * x).sum
      assert(n == 0f || math.abs(n - 1f) < 1e-3, s"not normalized: $n")
      val i = f.media_id.toInt
      f.kind match {
        case "image" => // REAL BMP header round trip: decoded == generated
          assert(f.meta.width == 4 + i % 60 && f.meta.height == 4 + (i * 7) % 44, f)
          assert(f.meta.channels == 3 && f.meta.durationMs == 0L)
        case "audio" => // REAL WAV header round trip
          assert(f.meta.channels == 1)
          val samples = 800 + (i * 37) % 4000
          assert(f.meta.durationMs == samples.toLong * 1000 / 8000, f)
        case _ => // REAL AVI header round trip: decoded == generated
          assert(f.meta.width == 4 + i % 28 && f.meta.height == 4 + (i * 5) % 20, f)
          assert(f.meta.channels == 3)
          val fps = 10 + i % 20
          val nFrames = 4 + i % 9
          assert(f.meta.durationMs == (1000000 / fps).toLong * nFrames / 1000, f)
      }
    }

    // repartitioning must not change any value (pure per-row kernel)
    val rows2 = Multimodal.featurize(media.repartition(13), dim = 32)
      .collect().sortBy(_.media_id)
    rows.zip(rows2).foreach { case (a, b) =>
      assert(a.embedding.toSeq == b.embedding.toSeq && a.meta == b.meta)
    }
  }

  test("sampleFrames: one row per frame, deterministic slices, videos only") {
    val media = Multimodal.mediaTable(spark, 30, seed = 8L)
    val frames = Multimodal.sampleFrames(media, framesPerVideo = 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame_bytes"))
    val nVideos = media.filter(col("kind") === "video").count()
    assert(frames.count() == nVideos * 4)
    val perVideo = frames.groupBy("media_id").count().collect()
    perVideo.foreach(r => assert(r.getLong(1) == 4L))
  }

  test("AVI codec: encode -> demux recovers every frame, deterministic, sampling evenly spaced") {
    val bytes = Multimodal.Codecs.encodeAvi(width = 6, height = 4, fps = 12, nFrames = 7, seed = 99L)
    val frames = Multimodal.Codecs.demuxAviFrames(bytes)
    assert(frames.length == 7, s"demuxed ${frames.length} frames")
    val rowSize = ((6 * 3 + 3) / 4) * 4
    frames.foreach(f => assert(f.length == rowSize * 4, s"frame size ${f.length}"))
    // frames carry distinct pixel content and demux is deterministic
    assert(frames.map(_.toSeq).distinct.length == 7)
    val again = Multimodal.Codecs.demuxAviFrames(
      Multimodal.Codecs.encodeAvi(6, 4, 12, 7, 99L))
    frames.zip(again).foreach { case (a, b) => assert(a.sameElements(b)) }
    // sampling 3 of 7: evenly spaced REAL frames (indices 0, 2, 4)
    val sampled = Multimodal.Codecs.sampleAviFrames(bytes, 3)
    assert(sampled.length == 3)
    assert(sampled(0).sameElements(frames(0)) && sampled(1).sameElements(frames(2)) &&
      sampled(2).sameElements(frames(4)))
    // header round trip
    val meta = Multimodal.Codecs.decodeAviMeta(bytes)
    assert(meta.width == 6 && meta.height == 4 && meta.channels == 3)
    assert(meta.durationMs == (1000000 / 12).toLong * 7 / 1000)
  }

  test("resizeImages: real BMP pixel resample — dims, pixel identity, pass-through") {
    val media = Multimodal.mediaTable(spark, 36, seed = 3L, parts = 4)
    val resized = Multimodal.resizeImages(media, 16, 12).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))).sortBy(_._1)
    val orig = media.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))).sortBy(_._1)
    resized.zip(orig).foreach { case ((id, kind, out), (_, _, in)) =>
      if (kind == "image") {
        val m = Multimodal.Codecs.decodeBmpMeta(out)
        assert(m.width == 16 && m.height == 12 && m.channels == 3, s"id=$id $m")
        // nearest-neighbor identity: dst pixel (x,y) must equal the mapped
        // src pixel, byte for byte (bottom-up rows, 4-byte-aligned strides)
        val sm = Multimodal.Codecs.decodeBmpMeta(in)
        val srcRow = ((sm.width * 3 + 3) / 4) * 4
        val dstRow = ((16 * 3 + 3) / 4) * 4
        val srcOff = java.nio.ByteBuffer.wrap(in)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(10)
        for (x <- Seq(0, 7, 15); y <- Seq(0, 5, 11)) {
          val sx = x.toLong * sm.width / 16
          val sy = y.toLong * sm.height / 12
          val s = srcOff + sy.toInt * srcRow + sx.toInt * 3
          val d = 54 + y * dstRow + x * 3
          assert(out(d) == in(s) && out(d + 1) == in(s + 1) && out(d + 2) == in(s + 2),
            s"pixel mismatch id=$id at ($x,$y)")
        }
      } else assert(out.sameElements(in), s"non-image $id must pass through")
    }
  }

  test("ContentCodec: near-identical media cosine-close, dissimilar content far") {
    import graft.operators.Multimodal.{Codecs, ContentCodec}
    def cos(a: Array[Float], b: Array[Float]): Double = { // inputs unit-norm
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    // structured images: a dark frame, the same frame with ~0.7% of bytes
    // edited (near-identical), and a bright frame (different content)
    val dark = Codecs.encodeBmp(40, 30, 1L)
    java.util.Arrays.fill(dark, 54, dark.length, 20.toByte)
    val darkEdit = dark.clone()
    var i = 54
    while (i < darkEdit.length) { darkEdit(i) = 200.toByte; i += 150 }
    val bright = Codecs.encodeBmp(40, 30, 1L)
    java.util.Arrays.fill(bright, 54, bright.length, 230.toByte)
    val eDark = ContentCodec.embed("image", dark, 64)
    val eEdit = ContentCodec.embed("image", darkEdit, 64)
    val eBright = ContentCodec.embed("image", bright, 64)
    assert(cos(eDark, eEdit) > 0.9, s"edited copy drifted: ${cos(eDark, eEdit)}")
    assert(cos(eDark, eBright) < 0.5, s"unrelated content too close: ${cos(eDark, eBright)}")
    // structured audio: near-silence vs the same with a tiny dropout edit
    // vs full-scale alternating samples
    import java.nio.{ByteBuffer, ByteOrder}
    def pcm(fill: Int => Short): Array[Byte] = {
      val a = Codecs.encodeWav(8000, 2000, 3L)
      val bb = ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
      (0 until 2000).foreach(s => bb.putShort(44 + 2 * s, fill(s)))
      a
    }
    val quiet = pcm(_ => 100)
    val quietEdit = pcm(s => if (s % 100 == 0) 0 else 100)
    val loud = pcm(s => if (s % 2 == 0) 30000 else -30000)
    val eQ = ContentCodec.embed("audio", quiet, 64)
    val eQE = ContentCodec.embed("audio", quietEdit, 64)
    val eL = ContentCodec.embed("audio", loud, 64)
    assert(cos(eQ, eQE) > 0.9, s"edited audio drifted: ${cos(eQ, eQE)}")
    assert(cos(eQ, eL) < 0.5, s"unrelated audio too close: ${cos(eQ, eL)}")
  }

  test("embedding near-dup composes with media features (ANN over content embeddings)") {
    val media = Multimodal.mediaTable(spark, 60, seed = 2L)
    val feats = Multimodal.featurize(media, dim = 16).toDF()
      .select(col("media_id").as("vec_id"), col("embedding"))
    val topk = graft.operators.AnnSearch.bruteForceTopK(
      feats, feats.limit(3), "vec_id", "embedding", k = 2)
    assert(topk.count() == 6)
  }
}
