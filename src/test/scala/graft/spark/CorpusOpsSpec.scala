package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GlobalShuffle, Vocab}
import org.apache.spark.sql.functions._

/** Vocabulary build/encode vs in-test truth, and the two-phase global
  * shuffle's positions vs the window definition — including partitioning
  * invariance (the whole point of deterministic md5 keying). */
class CorpusOpsSpec extends AnyFunSuite with SparkSuiteBase {
  import spark.implicits._

  private val vocabArr = Array("spark", "table", "scan", "join", "agg", "row", "key", "rare")
  private val docs: Seq[(Long, String)] = (0 until 80).map { i =>
    val toks = (0 until 6 + i % 7).map(j => vocabArr((i + j * j) % (if (i % 9 == 0) 8 else 7)))
    (i.toLong, toks.mkString(" "))
  }

  private def counts: Map[String, Long] =
    docs.flatMap(_._2.split(" ")).groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("vocab build: top-V by (count desc, token asc), contiguous ids") {
    val v = 5
    val truth = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(v)
    val got = Vocab.build(docs.toDF("doc_id", "text"), "text", v)
      .orderBy("id").collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.map(_._2).toSeq == (0 until v))
    assert(got.map(r => (r._1, r._3)).toSeq == truth)
  }

  test("encode: in-order ids, OOV dropped and counted") {
    val vocabDf = Vocab.build(docs.toDF("doc_id", "text"), "text", 5)
    val idOf = vocabDf.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val got = Vocab.encode(docs.toDF("doc_id", "text"), "doc_id", "text", vocabDf)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getSeq[Int](3).toList))).toMap
    docs.foreach { case (id, t) =>
      val toks = t.split(" ").toList
      val ids = toks.flatMap(idOf.get)
      assert(got(id) == ((toks.size.toLong, (toks.size - ids.size).toLong, ids)),
        s"doc $id")
    }
  }

  test("global shuffle: positions == row_number over (md5(id), id); partition-invariant") {
    val df = docs.toDF("doc_id", "text")
    val truth = docs.map(_._1)
      .map(id => id -> java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .sortBy { case (id, h) => (h, id) }.map(_._1).zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    Seq(1, 7).foreach { p =>
      val got = GlobalShuffle.withPositions(df.repartition(p), "doc_id")
        .select("doc_id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == truth, s"at input partitioning $p")
    }
  }

  test("global shuffle: positions are a contiguous 0..n-1 permutation and text survives") {
    val out = GlobalShuffle.withPositions(docs.toDF("doc_id", "text"), "doc_id")
    assert(out.columns.toSeq == Seq("doc_id", "text", "pos"))
    val rows = out.collect()
    assert(rows.map(_.getLong(2)).sorted.toSeq == (0L until docs.size.toLong))
    val byId = docs.toMap
    rows.foreach(r => assert(r.getString(1) == byId(r.getLong(0))))
  }

  test("corpus mix: weighted epochs interleave == md5 window truth; copies exact") {
    import spark.implicits._
    import java.security.MessageDigest
    val a = (0 until 40).map(i => (i.toLong, s"a$i")).toDF("doc_id", "text")
    val b = (100 until 160).map(i => (i.toLong, s"b$i")).toDF("doc_id", "text")
    val got = graft.operators.CorpusMix.mix(
        Seq(("hi", a, 2), ("lo", b, 1)), "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // exact copy structure: every 'hi' doc twice (epochs 0,1), 'lo' once
    assert(got.count(_._1 == "hi") == 80 && got.count(_._1 == "lo") == 60)
    assert(got.filter(_._1 == "hi").groupBy(_._3).forall {
      case (_, g) => g.map(_._2).sorted.toSeq == Seq(0, 1) })
    // contiguous permutation in (md5(mixid), mixid) order
    val md = MessageDigest.getInstance("MD5")
    def m(s: String) = { val d = md.digest(s.getBytes("UTF-8")); md.reset()
      d.map(x => f"${x & 0xff}%02x").mkString }
    val want = got.map { case (s, e, id, _) => (s, e, id, s"$s:$e:$id") }
      .sortBy { case (_, _, _, k) => (m(k), k) }
      .zipWithIndex.map { case ((s, e, id, _), i) => (s, e, id, i.toLong) }.toSet
    assert(got.toSet == want)
    assert(got.map(_._4).sorted.toSeq == (0L until 140L))
  }
}
