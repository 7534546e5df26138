package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.TextOps

/** Windowed token co-occurrence counts — the corpus statistic under
  * word-association / PMI analysis and embedding training prep (skip-gram
  * pair extraction IS this operator with sampling bolted on).
  *
  * Pair semantics: for token positions i < j with j - i <= window, count
  * the UNORDERED pair (min(t_i, t_j), max(t_i, t_j)); a repeated token at
  * two positions counts as a (t, t) pair. All counts are integers →
  * byte-identical across engines, and the DuckDB oracle expresses exactly
  * the same definition as a positional self-join.
  *
  * Scale shape: pairs are generated MAP-ONLY per document (a compiled UDF
  * sliding a bounded window — never a positional self-join, which would
  * shuffle corpus×window position rows); only (pair → partial count)
  * rows reach the exchange, upper-bounded by min(doc_pairs, vocab²) per
  * partition after map-side combine. Top-k selection is a distributed
  * TakeOrdered, bounded by k, not by the pair space.
  */
object Cooccur {

  /** (tok_a, tok_b, cnt) for every co-occurring pair. */
  def pairs(docs: DataFrame, textCol: String, window: Int): DataFrame = {
    require(window >= 1, s"bad window $window")
    val gen = udf { (t: String) =>
      val toks = TextOps.tokenize(t)
      val out = new scala.collection.mutable.ArrayBuffer[(String, String)](
        toks.length * window)
      var i = 0
      while (i < toks.length) {
        var j = i + 1
        val hi = math.min(i + window, toks.length - 1)
        while (j <= hi) {
          val a = toks(i); val b = toks(j)
          out += (if (a <= b) (a, b) else (b, a))
          j += 1
        }
        i += 1
      }
      out.toSeq
    }
    docs
      .select(explode(gen(col(textCol))).as("p"))
      .select(col("p._1").as("tok_a"), col("p._2").as("tok_b"))
      .groupBy("tok_a", "tok_b")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Top-k pairs by (cnt desc, tok_a asc, tok_b asc). */
  def top(docs: DataFrame, textCol: String, window: Int, k: Int): DataFrame =
    pairs(docs, textCol, window)
      .orderBy(col("cnt").desc, col("tok_a").asc, col("tok_b").asc)
      .limit(k)
}
