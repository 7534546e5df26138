package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.WarcIO
import java.nio.charset.StandardCharsets.UTF_8

/** WARC source: record framing round trip (including payloads that contain
  * record-delimiter byte strings — the parser must trust Content-Length,
  * never scan payload bytes), non-response skipping, corruption loudness,
  * and the Spark write/read surface's partitioning invariance. */
class WarcIOSpec extends AnyFunSuite with SparkSuiteBase {
  import spark.implicits._

  test("single record round trip preserves url, timestamp, status, payload bytes") {
    val payload = "<html><body>héllo &amp; bytes</body></html>".getBytes(UTF_8)
    // sub-second timestamp: WARC 1.1 fractional dates must round-trip micros
    val rec = WarcIO.record("https://example.com/a?x=1", 1700000000123456L, payload)
    val rows = WarcIO.parseFile(rec)
    assert(rows.size == 1)
    val r = rows.head
    assert(r.url == "https://example.com/a?x=1")
    assert(r.tsUs == 1700000000123456L)
    assert(r.status == 200)
    assert(java.util.Arrays.equals(r.payload, payload))
  }

  test("payload containing WARC header byte strings does not confuse the splitter") {
    // a page QUOTING warc syntax — the framing must come from
    // Content-Length, not from searching for delimiter bytes
    val evil = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n" +
      "HTTP/1.1 200 OK\r\n\r\nfake inner record\r\n\r\n").getBytes(UTF_8)
    val after = "<p>real second page</p>".getBytes(UTF_8)
    val f = WarcIO.file(Seq(
      WarcIO.record("https://a.example/evil", 1000000L, evil),
      WarcIO.record("https://a.example/next", 2000000L, after)))
    val rows = WarcIO.parseFile(f)
    assert(rows.map(_.url) == Seq("https://a.example/evil", "https://a.example/next"))
    assert(java.util.Arrays.equals(rows.head.payload, evil))
    assert(java.util.Arrays.equals(rows(1).payload, after))
  }

  test("non-response records are skipped; responses keep file order") {
    val warcinfo = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\n" +
      "info body\r\n\r\n").getBytes(UTF_8)
    val f = WarcIO.file(Seq(
      warcinfo,
      WarcIO.record("https://b.example/1", 1000000L, "one".getBytes(UTF_8)),
      warcinfo,
      WarcIO.record("https://b.example/2", 2000000L, "two".getBytes(UTF_8))))
    assert(WarcIO.parseFile(f).map(_.url) ==
      Seq("https://b.example/1", "https://b.example/2"))
  }

  test("truncated / corrupt segments fail loudly") {
    val rec = WarcIO.record("https://c.example/x", 1000000L, "abcdef".getBytes(UTF_8))
    intercept[IllegalArgumentException] {
      WarcIO.parseFile(java.util.Arrays.copyOfRange(rec, 0, rec.length - 6))
    }
    val noTerm = java.util.Arrays.copyOf(rec, rec.length)
    noTerm(rec.length - 1) = 'X'
    intercept[IllegalArgumentException] { WarcIO.parseFile(noTerm) }
  }

  test("gzip member-per-record segments parse identically to plain segments") {
    val recs = (0 until 7).map(i =>
      WarcIO.record(s"https://gz.example/$i", 1000000L * (i + 1),
        s"<p>page $i ${"y" * (i * 13 % 17)}</p>".getBytes(UTF_8)))
    val plain = WarcIO.file(recs)
    val gz = WarcIO.file(recs, gzipPerRecord = true)
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b, "expected gzip magic")
    assert(gz.length != plain.length)
    val a = WarcIO.parseFile(plain).map(r => (r.url, r.tsUs, new String(r.payload, UTF_8)))
    val b = WarcIO.parseFile(gz).map(r => (r.url, r.tsUs, new String(r.payload, UTF_8)))
    assert(a == b && a.size == 7)
  }

  test("warc ingestion is streamable: parsed stream rows == batch parse") {
    // segments arrive as a stream of binary blobs (the production shape:
    // a file-watch source over landing warc.gz objects); warc_parse is
    // map-only, so it runs unchanged under structured streaming
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val segs: Seq[Array[Byte]] = (0 until 3).map { f =>
      WarcIO.file((0 until 5).map { i =>
        WarcIO.record(s"https://stream.example/$f/$i", 1000000L * (f * 5 + i + 1),
          s"<p>seg $f page $i</p>".getBytes(UTF_8))
      }, gzipPerRecord = f % 2 == 0) // mixed plain/gzip segments
    }
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Array[Byte]]
    val q = WarcIO.readFiles(input.toDF().toDF("bytes"), "bytes")
      .writeStream.format("memory").queryName("warc_stream").outputMode("append").start()
    try {
      input.addData(segs.head); q.processAllAvailable()
      input.addData(segs.tail: _*); q.processAllAvailable()
      val got = sq.sql("SELECT url, ts_us FROM warc_stream").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val batch = segs.flatMap(WarcIO.parseFile).map(r => (r.url, r.tsUs)).toSet
      assert(got == batch && got.size == 15)
    } finally q.stop()
  }

  test("spark write/read round trip; segment bytes invariant under partitioning") {
    val rows = (0 until 57).map { i =>
      (s"https://site${i % 7}.example/p/$i", 1600000000000000L + i * 1000000L,
        s"<html><body>doc $i body ${"x" * (i % 11)}</body></html>".getBytes(UTF_8), i.toLong)
    }
    val df = rows.toDF("url", "ts_us", "payload", "ord")
    val files1 = WarcIO.writeFiles(df.repartition(1), "url", "ts_us", "payload", "ord", 10)
    val files8 = WarcIO.writeFiles(df.repartition(8), "url", "ts_us", "payload", "ord", 10)
    val b1 = files1.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val b8 = files8.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    assert(b1.keySet == (0 until 6).map(_.toLong).toSet)
    assert(b1.keySet == b8.keySet)
    b1.keySet.foreach(k => assert(java.util.Arrays.equals(b1(k), b8(k)),
      s"segment $k bytes differ across partitioning"))

    val back = WarcIO.readFiles(files8, "bytes")
      .select("url", "ts_us", "payload").collect()
      .map(r => (r.getString(0), r.getLong(1), new String(r.getAs[Array[Byte]](2), UTF_8)))
      .toSet
    assert(back == rows.map(r => (r._1, r._2, new String(r._3, UTF_8))).toSet)
  }
}
