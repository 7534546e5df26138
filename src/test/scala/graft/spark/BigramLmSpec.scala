package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BigramLm

/** Bigram-LM fixed-point scoring vs an in-test brute force of the same
  * integer formula, plus the filter semantics the operator exists for:
  * corpus-typical transitions outscore gibberish. */
class BigramLmSpec extends AnyFunSuite with SparkSuiteBase {
  import spark.implicits._

  private def toks(t: String): Seq[String] =
    t.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  private def truthScores(corpus: Seq[(Long, String)],
                          scale: Long = 1000000L): Map[Long, (Long, Long, Long)] = {
    val allToks = corpus.flatMap { case (_, t) => toks(t) }
    val cu = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = cu.size.toLong
    val cb = corpus.flatMap { case (_, t) => toks(t).sliding(2).filter(_.size == 2) }
      .map(p => (p(0), p(1))).groupBy(identity).view.mapValues(_.size.toLong).toMap
    corpus.map { case (id, t) =>
      val bgs = toks(t).sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      val s = bgs.map { case (w1, w2) =>
        (scale * (cb.getOrElse((w1, w2), 0L) + 1L)) / (cu.getOrElse(w1, 0L) + v)
      }.sum
      val n = bgs.size.toLong
      (id, (n, s, if (n == 0) 0L else s / n))
    }.toMap
  }

  test("score == brute force of the same integer formula; short docs zero") {
    val vocab = Array("the", "cat", "sat", "on", "mat", "dog", "ran", "far")
    val corpus: Seq[(Long, String)] = (0 until 40).map { i =>
      (i.toLong, (0 until 5 + i % 7).map(j => vocab((i * 5 + j * 3) % vocab.length)).mkString(" "))
    } ++ Seq((100L, "single"), (101L, "   "), (102L, ""))
    val df = corpus.toDF("doc_id", "text")
    val uni = BigramLm.unigramCounts(df, "text")
    val bi = BigramLm.bigramCounts(df, "doc_id", "text")
    val got = BigramLm.score(df, "doc_id", "text", uni, bi)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == truthScores(corpus))
    assert(got(100L) == ((0L, 0L, 0L)) && got(101L) == ((0L, 0L, 0L)))
    assert(got.size == corpus.size)
  }

  test("corpus-typical text outscores gibberish (the filter semantics)") {
    // 30 docs share the same phrasing; one doc is unique-transition noise
    val typical = (0 until 30).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val noise = Seq((99L, (0 until 9).map(j => s"zz$j").mkString(" ")))
    val df = (typical ++ noise).toDF("doc_id", "text")
    val uni = BigramLm.unigramCounts(df, "text")
    val bi = BigramLm.bigramCounts(df, "doc_id", "text")
    val avg = BigramLm.score(df, "doc_id", "text", uni, bi)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // with a 17-word vocab the add-one floor is ~S/18 per noise bigram,
    // so the separation is ~5x, not orders of magnitude — assert 4x
    assert(avg(0L) > 4L * avg(99L),
      s"typical=${avg(0L)} must dwarf noise=${avg(99L)}")
  }

  test("interpolated trigram score == brute force of the three divisions") {
    val vocab = Array("the", "cat", "sat", "on", "mat", "dog", "ran")
    val corpus: Seq[(Long, String)] = (0 until 30).map { i =>
      (i.toLong, (0 until 4 + i % 8).map(j => vocab((i * 5 + j * 3) % vocab.length)).mkString(" "))
    } ++ Seq((100L, "two words"), (101L, ""))
    val df = corpus.toDF("doc_id", "text")
    val uni = BigramLm.unigramCounts(df, "text")
    val bi = BigramLm.bigramCounts(df, "doc_id", "text")
    val tri = BigramLm.trigramCounts(df, "doc_id", "text")
    val got = BigramLm.scoreInterpolated(df, "doc_id", "text", uni, bi, tri)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // local truth
    val allT = corpus.flatMap { case (_, t) => toks(t) }
    val cu = allT.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = cu.size.toLong
    val tTot = allT.size.toLong
    def grams(n: Int) = corpus.flatMap { case (_, t) =>
      toks(t).sliding(n).filter(_.size == n).map(_.toList) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cb = grams(2)
    val ct = grams(3)
    val s = 1000000L
    val want = corpus.map { case (id, t) =>
      val tg = toks(t).sliding(3).filter(_.size == 3).map(_.toList).toSeq
      val sc = tg.map { g =>
        (6L * s * (ct.getOrElse(g, 0L) + 1L)) / (10L * (cb.getOrElse(g.take(2), 0L) + v)) +
          (3L * s * (cb.getOrElse(g.drop(1), 0L) + 1L)) / (10L * (cu.getOrElse(g(1), 0L) + v)) +
          (1L * s * (cu.getOrElse(g(2), 0L) + 1L)) / (10L * (tTot + v))
      }.sum
      val n = tg.size.toLong
      (id, (n, sc, if (n == 0) 0L else sc / n))
    }.toMap
    assert(got == want)
    assert(got(100L) == ((0L, 0L, 0L)) && got(101L) == ((0L, 0L, 0L)))
  }

  test("unseen transitions at score time take the add-one floor, not a crash") {
    val train = Seq((0L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val uni = BigramLm.unigramCounts(train, "text")
    val bi = BigramLm.bigramCounts(train, "doc_id", "text")
    // 'delta' is OOV; 'gamma beta' is an unseen transition of seen tokens
    val eval = Seq((7L, "gamma beta delta")).toDF("doc_id", "text")
    val r = BigramLm.score(eval, "doc_id", "text", uni, bi).collect().head
    val v = 3L // alpha, beta, gamma
    val expected = (1000000L * 1L) / (1L + v) + (1000000L * 1L) / (2L + v)
    assert((r.getLong(1), r.getLong(2)) == ((2L, expected)))
  }
}
