package graft.core

import scala.collection.mutable

/** Deterministic text primitives shared by the Spark functions
  * (graft.spark.GraftFunctions) and the Scala-side brute-force oracles in
  * tests. Everything here is pure, allocation-light, and has no Spark
  * dependency, mirroring how the reference keeps all algorithmic kernels
  * below the aggregation boundary (SURVEY.md §1.2).
  *
  * Configuration matches the north rule (`BASELINE.json`): 5-gram shingles,
  * 128-permutation MinHash, 16 bands x 8 rows LSH, 64-bit SimHash.
  */
object TextOps {

  val ShingleSize = 5
  val NumPerms = 128
  val NumBands = 16
  val RowsPerBand = 8
  require(NumBands * RowsPerBand == NumPerms)

  /** Per-permutation seed table, fixed for the pipeline's lifetime so
    * signatures are comparable across jobs and parallelism levels. */
  private val permSeeds: Array[Long] = {
    val a = new Array[Long](NumPerms)
    var st = 0x5EEDFACE5EEDFACEL
    var i = 0
    while (i < NumPerms) { st = SplitMix64.next(st); a(i) = SplitMix64.mix(st); i += 1 }
    a
  }

  /** Whitespace tokenization (the `documents` corpus is single-space
    * separated; `\s+` keeps SQL-oracle parity with regexp splits). */
  def tokenize(text: String): Array[String] = {
    val t = text.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  def tokenCount(text: String): Int = tokenize(text).length

  def hashToken(tok: String): Long = ThetaSketch.hashBytes(tok.getBytes("UTF-8"))

  /** Distinct hashes of k-token shingles. A document shorter than k tokens
    * contributes its single full-token-sequence shingle. */
  def shingleHashes(text: String, k: Int = ShingleSize): Array[Long] = {
    val toks = tokenize(text)
    if (toks.isEmpty) return Array.empty
    val n = math.max(1, toks.length - k + 1)
    val set = new mutable.HashSet[Long]
    var i = 0
    while (i < n) {
      var h = 0x9E3779B97F4A7C15L
      var j = i
      val end = math.min(i + k, toks.length)
      while (j < end) { h = SplitMix64.mix(h ^ hashToken(toks(j))); j += 1 }
      set.add(h)
      i += 1
    }
    set.toArray
  }

  /** Classic 128-perm MinHash over a shingle-hash set: sig(i) =
    * min over shingles of mix(shingle ^ permSeed(i)). Empty docs get
    * Long.MaxValue lanes (never collide with non-empty docs). */
  def minHashSignature(shingles: Array[Long], numPerms: Int = NumPerms): Array[Long] = {
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val sh = shingles(s)
      var i = 0
      while (i < numPerms) {
        val h = SplitMix64.mix(sh ^ permSeeds(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  def minHash(text: String): Array[Long] = minHashSignature(shingleHashes(text))

  /** LSH band keys: hash of each contiguous `RowsPerBand` slice of the
    * signature. Pairs that agree on any band are candidates. */
  def bandHashes(sig: Array[Long], bands: Int = NumBands, rows: Int = RowsPerBand): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xC2B2AE3D27D4EB4FL ^ b
      var r = 0
      while (r < rows) { h = SplitMix64.mix(h ^ sig(b * rows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** Exact Jaccard similarity of the two documents' shingle sets (the
    * verify lane that decides pairs — SURVEY.md §7 hard part 2). */
  def jaccardShingles(a: String, b: String): Double = {
    val sa = shingleHashes(a)
    val sb = shingleHashes(b)
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    val set = new mutable.HashSet[Long]
    sa.foreach(set.add)
    var inter = 0
    val seen = new mutable.HashSet[Long]
    sb.foreach { h => if (seen.add(h) && set.contains(h)) inter += 1 }
    inter.toDouble / (sa.length + sb.length - inter)
  }

  /** Estimated Jaccard from two MinHash signatures (lane agreement rate). */
  def estimatedJaccard(sigA: Array[Long], sigB: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < sigA.length) { if (sigA(i) == sigB(i)) eq += 1; i += 1 }
    eq.toDouble / sigA.length
  }

  /** 64-bit SimHash: token-count-weighted bit votes over token hashes. */
  def simHash64(text: String): Long = {
    val votes = new Array[Int](64)
    val toks = tokenize(text)
    var i = 0
    while (i < toks.length) {
      val h = hashToken(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash Hamming-ball probe keys: split the 64-bit hash into
    * `maxDist+1` blocks; two hashes within Hamming distance maxDist must
    * agree exactly on at least one block (pigeonhole). Key = (blockIdx,
    * blockValue) packed into one long. */
  def simHashProbeKeys(sim: Long, maxDist: Int): Array[Long] = {
    val blocks = maxDist + 1
    val out = new Array[Long](blocks)
    val width = 64 / blocks
    var i = 0
    while (i < blocks) {
      val lo = i * width
      val hi = if (i == blocks - 1) 64 else lo + width
      val mask = if (hi - lo == 64) -1L else ((1L << (hi - lo)) - 1)
      val v = (sim >>> lo) & mask
      out(i) = SplitMix64.mix(v ^ (0xA5A5A5A5L * (i + 1)))
      i += 1
    }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Rolling Karp-Rabin char-level fingerprints with winnowing (Schleimer
    * et al., "Winnowing: Local Algorithms for Document Fingerprinting"):
    * hash every `gramLen`-char gram, keep the minimum in each `window` —
    * candidates for the exact-long-substring dedup lane. */
  def winnowedFingerprints(text: String, gramLen: Int = 32, window: Int = 16): Array[Long] = {
    val n = text.length
    if (n < gramLen) {
      return if (n == 0) Array.empty else Array(ThetaSketch.hashBytes(text.getBytes("UTF-8")))
    }
    val numGrams = n - gramLen + 1
    val grams = new Array[Long](numGrams)
    // polynomial rolling hash base 257 mod 2^64, then mixed
    val B = 257L
    var pow = 1L
    var i = 0
    while (i < gramLen - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < gramLen) { h = h * B + text.charAt(i); i += 1 }
    grams(0) = SplitMix64.mix(h)
    i = 1
    while (i < numGrams) {
      h = (h - text.charAt(i - 1) * pow) * B + text.charAt(i + gramLen - 1)
      grams(i) = SplitMix64.mix(h)
      i += 1
    }
    // winnow: min of each window, deduped consecutively
    val out = new mutable.ArrayBuffer[Long]
    var last = 0L
    var hasLast = false
    i = 0
    val numWindows = math.max(1, numGrams - window + 1)
    while (i < numWindows) {
      var min = Long.MaxValue
      var j = i
      val end = math.min(i + window, numGrams)
      while (j < end) { if (grams(j) < min) min = grams(j); j += 1 }
      if (!hasLast || min != last) { out += min; last = min; hasLast = true }
      i += 1
    }
    out.distinct.toArray
  }

  /** Longest common substring length of two strings (dynamic programming on
    * the shorter dimension; used only to verify the few fingerprint-join
    * candidates, never on the full corpus). */
  def longestCommonSubstring(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = new Array[Int](s.length + 1)
    var cur = new Array[Int](s.length + 1)
    var best = 0
    var i = 1
    while (i <= t.length) {
      var j = 1
      val tc = t.charAt(i - 1)
      while (j <= s.length) {
        cur(j) = if (tc == s.charAt(j - 1)) prev(j - 1) + 1 else 0
        if (cur(j) > best) best = cur(j)
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    best
  }

  // ---------------------------------------------------------------- text QA

  /** Language markers for the 5-corpus languages. The heuristic is
    * deliberately simple enough to express identically in ANSI SQL (the
    * DuckDB oracle mirrors it term for term). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " que ", " los "),
    "zh" -> Seq("的", "是", "了")
  )

  /** Count non-overlapping occurrences of a marker in the padded text. */
  def markerCount(text: String, marker: String): Int = {
    val padded = " " + text + " "
    var count = 0
    var idx = padded.indexOf(marker)
    while (idx >= 0) { count += 1; idx = padded.indexOf(marker, idx + marker.length) }
    count
  }

  /** n-gram-heuristic language ID: language with the highest marker count;
    * "und" (undetermined) when no marker fires. */
  def langId(text: String): String = {
    var best = "und"
    var bestCount = 0
    LangMarkers.foreach { case (lang, markers) =>
      val c = markers.map(m => markerCount(text, m)).sum
      if (c > bestCount) { best = lang; bestCount = c }
    }
    best
  }

  val StopWords: Set[String] = Set("the", "a", "an", "and", "or", "of", "in",
    "to", "is", "it", "that", "for", "on", "with", "as")

  /** Quality components: (nChars, nTokens, stopwordCount, punctCount,
    * meanTokenLen). All integer or exactly-computable — SQL-oracle safe. */
  def qualityComponents(text: String): (Int, Int, Int, Int, Double) = {
    val toks = tokenize(text)
    val nTok = toks.length
    val stop = toks.count(t => StopWords.contains(t.toLowerCase))
    var punct = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!Character.isLetterOrDigit(c) && !Character.isWhitespace(c)) punct += 1
      i += 1
    }
    val meanLen = if (nTok == 0) 0.0 else toks.map(_.length).sum.toDouble / nTok
    (text.length, nTok, stop, punct, meanLen)
  }

  /** Composite quality score in [0,1]: favors mid-length docs with a sane
    * stopword ratio and low punctuation density. */
  def qualityScore(text: String): Double = {
    val (nc, nt, stop, punct, _) = qualityComponents(text)
    if (nt == 0) return 0.0
    val lenScore = math.min(1.0, nt / 50.0) * math.min(1.0, 1000.0 / math.max(nc, 1))
    val stopRatio = stop.toDouble / nt
    val stopScore = if (stopRatio > 0.05 && stopRatio < 0.6) 1.0 else 0.5
    val punctScore = math.max(0.0, 1.0 - 5.0 * punct.toDouble / math.max(nc, 1))
    lenScore * stopScore * punctScore
  }
}
