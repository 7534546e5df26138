package graft.core

/** Suffix array (prefix-doubling, O(n log^2 n)) + Kasai LCP, used by the
  * exact long-substring dedup lane (north rule: "a suffix-array pass for
  * exact long-substring dedup"). Pure Scala, no Spark dependency — runs
  * inside the verify stage on candidate pairs only, never on the corpus.
  */
object SuffixArray {

  /** Suffix array of `s`: indices of suffixes in lexicographic order. */
  def build(s: CharSequence): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.empty
    var rank = new Array[Int](n)
    var tmp = new Array[Int](n)
    val sa = Array.tabulate(n)(identity)
    var i = 0
    while (i < n) { rank(i) = s.charAt(i).toInt; i += 1 }
    var k = 1
    val boxed = sa.map(Integer.valueOf) // sort with comparator without boxing churn per pass
    while (k < n) {
      val cmp = new java.util.Comparator[Integer] {
        def compare(a: Integer, b: Integer): Int = {
          val ia = a.intValue; val ib = b.intValue
          if (rank(ia) != rank(ib)) return Integer.compare(rank(ia), rank(ib))
          val ra = if (ia + k < n) rank(ia + k) else -1
          val rb = if (ib + k < n) rank(ib + k) else -1
          Integer.compare(ra, rb)
        }
      }
      java.util.Arrays.sort(boxed, cmp)
      tmp(boxed(0)) = 0
      i = 1
      while (i < n) {
        tmp(boxed(i)) = tmp(boxed(i - 1)) + (if (cmp.compare(boxed(i - 1), boxed(i)) < 0) 1 else 0)
        i += 1
      }
      val t = rank; rank = tmp; tmp = t
      if (rank(boxed(n - 1)) == n - 1) k = n // fully distinct ranks: done
      else k <<= 1
    }
    i = 0
    while (i < n) { sa(i) = boxed(i).intValue; i += 1 }
    sa
  }

  /** Kasai LCP array: lcp(i) = longest common prefix of sa(i) and sa(i-1). */
  def lcp(s: CharSequence, sa: Array[Int]): Array[Int] = {
    val n = s.length
    val out = new Array[Int](n)
    if (n == 0) return out
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s.charAt(i + h) == s.charAt(j + h)) h += 1
        out(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    out
  }

  /** Longest common substring length of `a` and `b` via the generalized
    * suffix array of `a + NUL + b` — O((|a|+|b|) log^2). Matches are
    * capped at the sentinel position, so the answer is exact even if the
    * sentinel char appeared in text. */
  def longestCommonSubstring(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val s = a + "\u0000" + b
    val split = a.length
    val sa = build(s)
    val l = lcp(s, sa)
    var best = 0
    var i = 1
    while (i < sa.length) {
      val p = sa(i - 1); val q = sa(i)
      // suffixes from different source strings (sentinel position excluded)
      if ((p < split) != (q < split) && p != split && q != split) {
        // cap at distance to sentinel so the match can't span it
        val cap = math.min(
          if (sa(i - 1) < split) split - sa(i - 1) else Int.MaxValue,
          if (sa(i) < split) split - sa(i) else Int.MaxValue)
        val v = math.min(l(i), cap)
        if (v > best) best = v
      }
      i += 1
    }
    best
  }
}
