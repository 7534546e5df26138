package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SearchIndex

/** Inverted index + conjunctive search vs an in-test brute force:
  * postings exactness, ALL-terms coverage semantics, bounded top-k with
  * the (score desc, doc_id asc) tie rule, duplicate-term collapsing, and
  * no rows for unsatisfiable queries. */
class SearchIndexSpec extends AnyFunSuite with SparkSuiteBase {
  import spark.implicits._

  private val vocab = Array("spark", "table", "scan", "join", "agg", "row", "key")
  private val docs: Seq[(Long, String)] = (0 until 60).map { i =>
    val toks = (0 until 8 + i % 9).map(j => vocab((i * 3 + j * j) % vocab.length))
    (i.toLong, toks.mkString(" "))
  }

  private def toks(t: String): Seq[String] =
    t.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  test("postings == per-doc token counts") {
    val truth = docs.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (w, g) => (w, id, g.size.toLong) }
    }.toSet
    val got = SearchIndex.postings(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth)
  }

  test("conjunctive search == brute force, top-k by (tf desc, id asc)") {
    val queries = Seq(
      (0L, Seq("spark", "join")),
      (1L, Seq("table")),
      (2L, Seq("key", "row", "agg")),
      (3L, Seq("spark", "spark", "scan")), // duplicate term collapses
      (4L, Seq("spark", "zebra")))         // unsatisfiable: zebra nowhere
    val k = 5
    val truth = queries.flatMap { case (qid, terms) =>
      val ts = terms.distinct
      docs.flatMap { case (id, t) =>
        val cnt = toks(t).groupBy(identity).view.mapValues(_.size.toLong).toMap
        if (ts.forall(cnt.contains)) Some((qid, id, ts.map(cnt).sum)) else None
      }.sortBy { case (_, id, s) => (-s, id) }.take(k)
    }.toSet
    assert(truth.nonEmpty && truth.exists(_._1 == 3L))
    assert(!truth.exists(_._1 == 4L))

    val p = SearchIndex.postings(docs.toDF("doc_id", "text"), "doc_id", "text")
    val got = SearchIndex.searchAll(p, queries.toDF("query_id", "terms"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth)
  }

  // the searchRanked fixed-point weight, recomputed independently
  private def bm25ishScores(corpus: Seq[(Long, String)], terms: Seq[String],
                            scale: Long = 100000L): Map[Long, Long] = {
    val counts = corpus.map { case (id, t) =>
      id -> toks(t).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val nonEmpty = counts.filter(_._2.nonEmpty)
    val bigA = nonEmpty.values.map(_.values.sum).sum
    val bigN = nonEmpty.size.toLong
    val dfm = terms.distinct.map(t => t -> nonEmpty.count(_._2.contains(t)).toLong).toMap
    nonEmpty.flatMap { case (id, cnt) =>
      val dl = cnt.values.sum
      val score = terms.distinct.flatMap { t =>
        val tf = cnt.getOrElse(t, 0L)
        if (tf == 0) None
        else {
          val df = dfm(t)
          val tfpart = (scale * 44L * bigA * tf) / (20L * bigA * tf + 6L * bigA + 18L * dl * bigN)
          Some(((2L * (bigN - df) + 1L) * tfpart) / (2L * df + 1L))
        }
      }.sum
      if (score > 0) Some(id -> score) else None
    }
  }

  test("ranked search == brute force of the same integer formula") {
    val queries = Seq(
      (0L, Seq("spark", "join")),
      (1L, Seq("table", "table", "key")), // dup term collapses
      (2L, Seq("zebra")),                 // no hits anywhere
      (3L, Seq("agg")))
    val k = 7
    val truth = queries.flatMap { case (qid, terms) =>
      bm25ishScores(docs, terms).toSeq
        .sortBy { case (id, s) => (-s, id) }.take(k)
        .map { case (id, s) => (qid, id, s) }
    }.toSet
    assert(truth.nonEmpty && !truth.exists(_._1 == 2L))
    val p = SearchIndex.postings(docs.toDF("doc_id", "text"), "doc_id", "text")
    val got = SearchIndex.searchRanked(p, queries.toDF("query_id", "terms"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth)
  }

  test("ranked search up-weights rare terms over frequent ones") {
    // 'rare' appears in 1 doc, 'common' in every doc; a doc matching only
    // 'rare' must outrank docs matching only 'common' for the 2-term query
    val corpus: Seq[(Long, String)] =
      (0L, "rare alpha beta") +: (1 until 20).map(i => (i.toLong, "common alpha beta"))
    val p = SearchIndex.postings(corpus.toDF("doc_id", "text"), "doc_id", "text")
    val got = SearchIndex.searchRanked(
      p, Seq((0L, Seq("rare", "common"))).toDF("query_id", "terms"), 3)
      .orderBy($"score".desc, $"doc_id").collect()
    assert(got.head.getLong(1) == 0L, s"rare-term doc should rank first: ${got.toSeq}")
    assert(got.head.getLong(2) > got(1).getLong(2))
  }

  test("phrase search == positional brute force (overlaps, duplicate terms, k=1)") {
    val corpus: Seq[(Long, String)] = docs ++ Seq(
      (500L, "spark table spark table spark"), // overlapping bigram hits
      (501L, "key key key key"),               // self-overlapping dup-term phrase
      (502L, ""))
    val phrases = Seq(
      (0L, Seq("spark", "table")),
      (1L, Seq("key", "key")),
      (2L, Seq("table", "spark", "table")),
      (3L, Seq("agg")),           // k = 1
      (4L, Seq("zebra", "agg")))  // no hits
    val truth = (for {
      (pid, ph) <- phrases
      (id, t) <- corpus
      n = toks(t).sliding(ph.size).count(_ == ph) if n > 0
    } yield (pid, id, n)).toSet
    assert(truth.exists(_._1 == 1L) && truth.exists(p => p._1 == 0L && p._3 >= 2))
    assert(!truth.exists(_._1 == 4L))
    val pp = SearchIndex.positionalPostings(corpus.toDF("doc_id", "text"), "doc_id", "text")
    val got = SearchIndex.phraseSearch(pp, phrases.toDF("phrase_id", "terms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == truth)
  }

  test("k larger than the hit count returns every hit") {
    val p = SearchIndex.postings(docs.toDF("doc_id", "text"), "doc_id", "text")
    val all = SearchIndex.searchAll(p, Seq((9L, Seq("join"))).toDF("query_id", "terms"), 10000)
      .collect().map(_.getLong(1)).toSet
    val truth = docs.filter { case (_, t) => toks(t).contains("join") }.map(_._1).toSet
    assert(all == truth)
  }
}
