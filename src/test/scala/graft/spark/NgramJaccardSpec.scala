package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NgramJaccard

/** Exact n-gram Jaccard lane: prefix-filter candidate soundness and
  * pair-for-pair equality with the brute-force oracle. */
class NgramJaccardSpec extends AnyFunSuite with SparkSuiteBase {

  // deterministic corpus with planted near-dups: 40 base docs, every 4th
  // re-appears with a small edit (high 3-gram Jaccard), plus unrelated text
  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    def sentence(seed: Int, len: Int): String =
      (0 until len).map(i => s"w${(seed * 31 + i * 7) % 97}").mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, sentence(i, 30 + i % 20)))
    val dups = base.collect { case (id, t) if id % 4 == 0 =>
      val toks = t.split(" ")
      toks(rnd.nextInt(toks.length)) = "EDITED"
      (id + 1000L, toks.mkString(" "))
    }
    base ++ dups ++ Seq((5000L, ""), (5001L, "one two")) // edge: empty + short
  }

  test("pairs == brute force at t=0.5, n=3") {
    val docs = corpus
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val got = NgramJaccard.pairs(df, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = NgramJaccard.bruteForcePairs(docs, 3, 0.5)
    assert(want.nonEmpty, "oracle must be non-vacuous")
    assert(got == want)
  }

  test("candidates are a superset of true pairs (prefix lemma)") {
    val docs = corpus
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.6, 0.9)) {
      val cands = NgramJaccard.candidatePairs(df, "doc_id", "text", 3, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = NgramJaccard.bruteForcePairs(docs, 3, t)
      assert(truth.subsetOf(cands), s"prefix filter lost pairs at t=$t")
    }
  }

  test("overlapStats is exact on knowns") {
    val (i1, a1, b1) = NgramJaccard.overlapStats("a b c d", "a b c d", 3)
    assert((i1, a1, b1) == (2, 2, 2)) // grams: "a b c","b c d"
    val (i2, a2, b2) = NgramJaccard.overlapStats("a b c d", "x y z", 3)
    assert(i2 == 0 && a2 == 2 && b2 == 1)
    val (i3, _, _) = NgramJaccard.overlapStats("", "a b c", 3)
    assert(i3 == 0)
  }
}
