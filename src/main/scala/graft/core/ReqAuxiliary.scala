package graft.core

/** Immutable query-time index over a REQ sketch: sorted items with
  * cumulative weights, deduplicated keeping the highest cumulative weight of
  * each run of equal items.
  *
  * Semantics per the reference Auxiliary
  * (`/root/reference/data-sketches-core/.../Internal/Auxiliary.hs:31-189`):
  * weighted merge of all level buffers (weight 2^lgWeight, `Auxiliary.hs:65-66`)
  * → prefix-sum (`Auxiliary.hs:95-116`, asserts last == N) → dedup keeping
  * max cumulative weight (`Auxiliary.hs:118-150`).
  */
final class ReqAuxiliary private (val items: Array[Double], val cumWeights: Array[Long], val totalN: Long) {

  /** Quantile lookup (`Auxiliary.hs:79-93`): binary-search cumWeights for
    * floor(r * N) with GT (criterion `<`) or GE (criterion `<=`); clamp to
    * the last item when the search runs off the end. */
  def getQuantile(normRank: Double, inclusive: Boolean): Double = {
    val n = cumWeights.length
    if (n == 0) return Double.NaN
    val rank = (normRank * totalN).toLong
    val mode = if (inclusive) InequalitySearch.GE else InequalitySearch.GT
    val idx = InequalitySearch.findLong(cumWeights, 0, n - 1, rank, mode)
    if (idx == -1) items(n - 1) else items(idx)
  }
}

object ReqAuxiliary {

  def build(compactors: collection.Seq[ReqCompactor], totalN: Long, retainedItems: Int): ReqAuxiliary = {
    val items = new Array[Double](retainedItems)
    val weights = new Array[Long](retainedItems)
    var auxCount = 0
    // weighted merge of each level's sorted buffer into the growing prefix
    compactors.foreach { c =>
      c.buffer.sort()
      val (arr, start, cnt) = c.buffer.active
      auxCount = mergeSortIn(items, weights, auxCount, arr, start, cnt, 1L << c.lgWeight)
    }
    // prefix-sum weights → cumulative; invariant: last == totalN
    var i = 0
    var sum = 0L
    while (i < auxCount) { sum += weights(i); weights(i) = sum; i += 1 }
    assert(auxCount == 0 || weights(auxCount - 1) == totalN,
      s"cumulative weight ${if (auxCount > 0) weights(auxCount - 1) else 0} != totalN $totalN")
    // dedup: collapse runs of equal items keeping the HIGHEST cumulative
    // weight (`Auxiliary.hs:118-150`) — required for <=-criterion quantile
    // correctness with repeated values (SURVEY.md §8.6).
    var read = 0
    var write = -1
    while (read < auxCount) {
      if (write >= 0 && items(read) == items(write)) {
        weights(write) = weights(read) // keep highest cumulative
      } else {
        write += 1
        items(write) = items(read)
        weights(write) = weights(read)
      }
      read += 1
    }
    val len = write + 1
    new ReqAuxiliary(java.util.Arrays.copyOf(items, len), java.util.Arrays.copyOf(weights, len), totalN)
  }

  /** Merge sorted src[srcStart, srcStart+srcCnt) with per-item weight into
    * the sorted prefix dst[0, dstCnt); returns new count
    * (`Auxiliary.hs:152-189`). Merges from the high end downward, in place. */
  private def mergeSortIn(dstItems: Array[Double], dstWeights: Array[Long], dstCnt: Int,
                          src: Array[Double], srcStart: Int, srcCnt: Int, weight: Long): Int = {
    var i = dstCnt - 1
    var j = srcStart + srcCnt - 1
    var k = dstCnt + srcCnt - 1
    while (j >= srcStart) {
      if (i >= 0 && dstItems(i) > src(j)) {
        dstItems(k) = dstItems(i); dstWeights(k) = dstWeights(i); i -= 1
      } else {
        dstItems(k) = src(j); dstWeights(k) = weight; j -= 1
      }
      k -= 1
    }
    dstCnt + srcCnt
  }
}
