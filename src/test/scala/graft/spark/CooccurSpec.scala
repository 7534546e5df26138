package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cooccur

/** Windowed co-occurrence vs an in-test positional brute force, including
  * unordered-pair canonicalization, same-token pairs, window edges, and
  * the top-k tie rule. */
class CooccurSpec extends AnyFunSuite with SparkSuiteBase {
  import spark.implicits._

  private val docs: Seq[(Long, String)] = Seq(
    (0L, "a b a c b"),
    (1L, "b b b"),
    (2L, "x"),
    (3L, ""),
    (4L, "c a x a c a"))

  private def truth(window: Int): Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    docs.foreach { case (_, t) =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      for (i <- toks.indices; j <- (i + 1) to math.min(i + window, toks.length - 1)) {
        val p = if (toks(i) <= toks(j)) (toks(i), toks(j)) else (toks(j), toks(i))
        m(p) += 1
      }
    }
    m.toMap
  }

  test("pairs == positional brute force (window 2)") {
    val got = Cooccur.pairs(docs.toDF("doc_id", "text"), "text", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == truth(2))
    assert(got.contains(("b", "b")), "repeated tokens must pair with themselves")
  }

  test("window 1 is adjacent-only; blank and single-token docs contribute nothing") {
    val got = Cooccur.pairs(docs.toDF("doc_id", "text"), "text", window = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == truth(1))
  }

  test("top-k: (cnt desc, tok_a, tok_b) prefix of the full ranking") {
    val full = truth(3).toSeq.sortBy { case ((a, b), c) => (-c, a, b) }
    val got = Cooccur.top(docs.toDF("doc_id", "text"), "text", window = 3, k = 4)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toSeq
    assert(got == full.take(4))
  }
}
