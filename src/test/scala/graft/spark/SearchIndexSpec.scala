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

  test("k larger than the hit count returns every hit") {
    val p = SearchIndex.postings(docs.toDF("doc_id", "text"), "doc_id", "text")
    val all = SearchIndex.searchAll(p, Seq((9L, Seq("join"))).toDF("query_id", "terms"), 10000)
      .collect().map(_.getLong(1)).toSet
    val truth = docs.filter { case (_, t) => toks(t).contains("join") }.map(_._1).toSet
    assert(all == truth)
  }
}
