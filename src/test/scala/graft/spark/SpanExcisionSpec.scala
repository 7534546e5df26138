package graft.spark

import graft.operators.SpanExcision
import org.scalatest.funsuite.AnyFunSuite

/** Duplicated-span excision (the Lee-et-al rewrite tier of substring
  * dedup). Truth here is a character-level brute force: position c of doc d
  * is removed iff some L-gram of d covering c occurs verbatim in another
  * doc — exactly the semantics the driver's DuckDB oracle recomputes with
  * literal grams at L = 200. Small L keeps fixtures readable. */
class SpanExcisionSpec extends AnyFunSuite with SparkSuiteBase {

  /** Brute-force (clean_text, removed) per doc at span length L. */
  private def brute(docs: Seq[(Long, String)], L: Int): Map[Long, (String, Long)] =
    docs.map { case (id, t) =>
      val others = docs.filter(_._1 != id).map(_._2)
      val covered = new Array[Boolean](t.length)
      var p = 0
      while (p + L <= t.length) {
        val gram = t.substring(p, p + L)
        if (others.exists(_.contains(gram))) {
          var c = p
          while (c < p + L) { covered(c) = true; c += 1 }
        }
        p += 1
      }
      val clean = t.zipWithIndex.collect { case (ch, i) if !covered(i) => ch }.mkString
      id -> ((clean, covered.count(identity).toLong))
    }.toMap

  private def run(docs: Seq[(Long, String)], L: Int): Map[Long, (String, Long)] = {
    import spark.implicits._
    SpanExcision.excise(docs.toDF("doc_id", "text"), "doc_id", "text", L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
  }

  test("engineered cases: shared span excised, within-doc repeat kept, short doc unchanged") {
    val shared = "ABCDEFGHIJ" // L = 10
    val docs = Seq(
      (1L, s"xxx${shared}yyy"),                  // shares `shared` with doc 2
      (2L, s"${shared}tail of document two"),    // at position 0
      (3L, s"one${shared.toLowerCase}two"),      // different case: no match
      (4L, "repeatrepeatXrepeatrepeat"),         // within-doc repeat only
      (5L, "short"))                             // shorter than L
    val got = run(docs, 10)
    val want = brute(docs, 10)
    assert(got === want)
    assert(got(1L) === (("xxxyyy", 10L)))
    assert(got(2L)._2 === 10L)
    assert(got(3L)._2 === 0L)
    assert(got(4L)._2 === 0L) // cross-document only
    assert(got(5L) === (("short", 0L)))
  }

  test("overlapping and adjacent spans union before cutting") {
    // doc 1 carries two overlapping duplicated 10-grams (an 11-char run
    // shared with doc 2) plus a disjoint 10-char run shared with doc 3
    val run11 = "ABCDEFGHIJK"
    val run10 = "0123456789"
    val docs = Seq(
      (1L, s"aa${run11}bb${run10}cc"),
      (2L, s"prefix $run11 suffix"),
      (3L, s"$run10 elsewhere"))
    val got = run(docs, 10)
    assert(got === brute(docs, 10))
    assert(got(1L)._1 === "aabbcc")
    assert(got(1L)._2 === 21L)
  }

  test("randomized corpus equals character-level brute force") {
    // tiny alphabet + seeded splices force genuine shared spans at many
    // offsets, including doc-boundary and full-doc-covered cases
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val base = (0 until 12).map(i => (i.toLong, randStr(30 + rnd.nextInt(60))))
    val spliced = base.map { case (id, t) =>
      if (id % 3 == 0 && t.length > 15) {
        val donor = base((id.toInt + 1) % base.size)._2
        val take = math.min(12 + rnd.nextInt(10), donor.length)
        val at = rnd.nextInt(t.length)
        (id + 100L, t.substring(0, at) + donor.substring(0, take) + t.substring(at))
      } else (id + 100L, t)
    }
    val docs = base ++ spliced
    assert(run(docs, 12) === brute(docs, 12))
  }

  test("topSpans ranks by distinct-doc count with canonical example locations") {
    import spark.implicits._
    val tri = "TRIPLICATE" // in docs 1,2,3
    val duo = "0123456789" // in docs 4,5
    val docs = Seq(
      (1L, s"aa${tri}bb"), (2L, s"$tri zz"), (3L, s"cc dd $tri"),
      (4L, s"xx${duo}"), (5L, s"${duo}yy"),
      (6L, "nothing shared here"))
    val got = SpanExcision.topSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        spanLen = 10, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.head === ((tri, 3L, 1L, 3L))) // min (doc,pos): doc 1, 0-based 2 -> 1-based 3
    assert(got.contains((duo, 2L, 4L, 3L)))
    // only duplicated grams appear
    assert(got.forall(_._2 >= 2))
    // brute-force full equality: per literal gram, distinct docs + min rep
    val all = for { (id, t) <- docs; p <- 0 to t.length - 10 }
      yield (t.substring(p, p + 10), id, p)
    val truth = all.groupBy(_._1).toSeq
      .map { case (g, occ) =>
        val rep = occ.map(o => (o._2, o._3)).min
        (g, occ.map(_._2).distinct.size.toLong, rep._1, rep._2 + 1L) }
      .filter(_._2 >= 2)
      .sortBy { case (_, n, d, p) => (-n, d, p) }
    assert(got.toSeq === truth)
  }

  test("exciseAgainstIndex: batch chars covered by corpus-held spans removed, batch-internal dups kept") {
    import spark.implicits._
    val L = 10
    val corpus = Seq((1L, "the corpus holds ABCDEFGHIJ and 0123456789 spans"),
                     (2L, "another corpus document entirely"))
    // batch: b1 carries a corpus span; b2 and b3 share a span ONLY with
    // each other (batch-internal — must survive); b4 is novel
    val batch = Seq(
      (10L, "xxABCDEFGHIJyy"),
      (11L, "front BATCHSHARED! end"),
      (12L, "BATCHSHARED! elsewhere"),
      (13L, "completely novel text"))
    val idx = SpanExcision.keyIndex(corpus.toDF("doc_id", "text"), "text", L)
    val got = SpanExcision.exciseAgainstIndex(idx, batch.toDF("doc_id", "text"),
        "doc_id", "text", L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // brute force: batch char covered iff an L-gram over it occurs in ANY corpus doc
    val want = batch.map { case (id, t) =>
      val covered = new Array[Boolean](t.length)
      var p = 0
      while (p + L <= t.length) {
        val g = t.substring(p, p + L)
        if (corpus.exists(_._2.contains(g))) (p until p + L).foreach(covered(_) = true)
        p += 1
      }
      id -> ((t.zipWithIndex.collect { case (c, i) if !covered(i) => c }.mkString,
        covered.count(identity).toLong))
    }.toMap
    assert(got === want)
    assert(got(10L) === (("xxyy", 10L)))
    assert(got(11L)._2 === 0L) // batch-internal share: kept by this face
    assert(got(12L)._2 === 0L)
    assert(got(13L)._2 === 0L)
  }

  test("cut unions intervals and counts removed chars") {
    assert(SpanExcision.cut("0123456789", Seq(2, 4), 3) ===
      SpanExcision.Excised("01789", 5L))
    assert(SpanExcision.cut("0123456789", Seq(0, 7), 3) ===
      SpanExcision.Excised("3456", 6L))
    assert(SpanExcision.cut("abc", Seq.empty, 3) === SpanExcision.Excised("abc", 0L))
    assert(SpanExcision.cut("abc", Seq(0), 3) === SpanExcision.Excised("", 3L))
  }

  test("gramKeys: equal grams share keys, rolling matches direct") {
    val t = "abcabcabcXabcabc"
    val ks = SpanExcision.gramKeys(t, 3)
    assert(ks.length === t.length - 2)
    // direct (non-rolled) recompute of each gram's keys must agree with the
    // rolled values: position p's keys equal gramKeys(substring, L)(0)
    for (k <- ks) {
      val direct = SpanExcision.gramKeys(t.substring(k.i, k.i + 3), 3)(0)
      assert((k.h1, k.h2) === ((direct.h1, direct.h2)), s"at ${k.i}")
    }
    // equal content -> equal keys at every occurrence
    val abc = ks.filter(k => t.substring(k.i, k.i + 3) == "abc").map(k => (k.h1, k.h2)).toSet
    assert(abc.size === 1)
  }
}
