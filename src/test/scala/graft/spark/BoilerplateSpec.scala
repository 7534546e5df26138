package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Boilerplate

/** Host-scoped template stripping vs an in-test brute force over the CDC
  * chunk definition: flag parity, clean-text reassembly, host scoping. */
class BoilerplateSpec extends AnyFunSuite with SparkSuiteBase {
  import spark.implicits._

  private def sentence(seed: Int, len: Int): String =
    (0 until len).map(i => s"w${(seed * 31 + i * 7) % 997}").mkString(" ")

  // 2 hosts x 6 docs; every doc of a host shares that host's 60-token
  // header and 40-token footer around unique content
  private def corpus: Seq[(Long, String, String)] = {
    def header(h: Int) = (0 until 60).map(j => s"hdr${h}x$j").mkString(" ")
    def footer(h: Int) = (0 until 40).map(j => s"ftr${h}x$j").mkString(" ")
    for (h <- 0 until 2; d <- 0 until 6) yield
      ((h * 100 + d).toLong, s"host$h",
        header(h) + " " + sentence(h * 50 + d, 30 + d) + " " + footer(h))
  }

  // brute force: CDC chunks per doc (via the production kernel on a
  // 1-doc DataFrame — the chunk DEFINITION is pinned elsewhere), then
  // host-df flags computed independently in Scala
  private def truth(docs: Seq[(Long, String, String)], minDf: Int)
      : Map[Long, (Long, Long, String)] = {
    val chunks: Seq[(Long, String, Int, String)] = {
      val df = docs.map { case (id, h, t) => (id, t) }.toDF("doc_id", "text")
      graft.operators.DocChunker.cdcChunks(df, "doc_id", "text", 4, 16)
        .collect().map { r =>
          val id = r.getLong(0)
          val host = docs.find(_._1 == id).get._2
          (id, host, r.getInt(1), r.getString(3))
        }.toSeq
    }
    val dfc = chunks.map { case (id, h, _, t) => (h, t, id) }.distinct
      .groupBy { case (h, t, _) => (h, t) }.view.mapValues(_.size).toMap
    docs.map { case (id, host, _) =>
      val mine = chunks.filter(_._1 == id).sortBy(_._3)
      val flags = mine.map { case (_, h, _, t) => dfc((h, t)) >= minDf }
      val clean = mine.zip(flags).collect { case ((_, _, _, t), false) => t }.mkString(" ")
      id -> ((mine.size.toLong, flags.count(identity).toLong, clean))
    }.toMap
  }

  test("strip == brute force; headers/footers flagged, content kept") {
    val docs = corpus
    val got = Boilerplate.strip(docs.toDF("doc_id", "host", "text"),
        "doc_id", "host", "text", 4, 16, minDf = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val want = truth(docs, 3)
    assert(got == want)
    // non-vacuous: every doc lost at least one template chunk and kept
    // its unique content tokens (content words start with 'w')
    docs.foreach { case (id, _, text) =>
      assert(got(id)._2 >= 1, s"doc $id: no boilerplate flagged")
      val contentToks = text.split(" ").filter(_.startsWith("w")).toSet
      val keptToks = got(id)._3.split(" ").toSet
      assert(contentToks.subsetOf(keptToks), s"doc $id: content chunk dropped")
    }
  }

  test("template detection is host-scoped: same chunk on 2 docs of different hosts survives") {
    // the shared 30-token block appears once per host — df within each
    // host is 1+1 (two docs of hostA), below minDf=3 on hostB
    val block = (0 until 30).map(j => s"shared$j").mkString(" ")
    val docs = Seq(
      (1L, "a", block + " " + sentence(1, 25)),
      (2L, "a", block + " " + sentence(2, 25)),
      (3L, "b", block + " " + sentence(3, 25)))
    val got = Boilerplate.strip(docs.toDF("doc_id", "host", "text"),
        "doc_id", "host", "text", 4, 16, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // minDf=2: the block IS template on host a (2 docs), NOT on host b
    assert(got(1L) >= 1 && got(2L) >= 1)
    assert(got(3L) == 0, "cross-host df leaked into host b")
  }
}
