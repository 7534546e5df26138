package graft.core

/** Generalized binary search over a sorted array *with duplicates*.
  *
  * Semantics per the inequality-search spec of the reference
  * (`/root/reference/data-sketches-core/src/DataSketches/Quantiles/RelativeErrorQuantile/Internal/InequalitySearch.hs:28-43`),
  * which itself follows Apache DataSketches Java `InequalitySearch`:
  *
  *  - LT: highest index i in [lo,hi] with arr(i) <  v, else -1
  *  - LE: highest index i in [lo,hi] with arr(i) <= v, else -1
  *  - GT: lowest  index i in [lo,hi] with arr(i) >  v, else -1
  *  - GE: lowest  index i in [lo,hi] with arr(i) >= v, else -1
  *
  * Implemented as clean predicate-partition binary searches (the reference's
  * adjacent-pair formulation is an implementation detail, not the contract).
  */
object InequalitySearch {
  sealed trait Mode
  case object LT extends Mode
  case object LE extends Mode
  case object GT extends Mode
  case object GE extends Mode

  /** Search doubles in sorted arr[lo..hi] inclusive. Returns -1 when no
    * element satisfies the inequality. */
  def find(arr: Array[Double], lo: Int, hi: Int, v: Double, mode: Mode): Int =
    mode match {
      case LT => highest(arr, lo, hi, x => x < v)
      case LE => highest(arr, lo, hi, x => x <= v)
      case GT => lowest(arr, lo, hi, x => x > v)
      case GE => lowest(arr, lo, hi, x => x >= v)
    }

  /** Search longs (cumulative weights) in sorted arr[lo..hi] inclusive. */
  def findLong(arr: Array[Long], lo: Int, hi: Int, v: Long, mode: Mode): Int =
    mode match {
      case LT => highestL(arr, lo, hi, x => x < v)
      case LE => highestL(arr, lo, hi, x => x <= v)
      case GT => lowestL(arr, lo, hi, x => x > v)
      case GE => lowestL(arr, lo, hi, x => x >= v)
    }

  // Highest index satisfying p (prefix of array satisfies p), or -1.
  private def highest(arr: Array[Double], lo0: Int, hi0: Int, p: Double => Boolean): Int = {
    var lo = lo0; var hi = hi0; var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (p(arr(mid))) { res = mid; lo = mid + 1 } else hi = mid - 1
    }
    res
  }
  // Lowest index satisfying p (suffix of array satisfies p), or -1.
  private def lowest(arr: Array[Double], lo0: Int, hi0: Int, p: Double => Boolean): Int = {
    var lo = lo0; var hi = hi0; var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (p(arr(mid))) { res = mid; hi = mid - 1 } else lo = mid + 1
    }
    res
  }
  private def highestL(arr: Array[Long], lo0: Int, hi0: Int, p: Long => Boolean): Int = {
    var lo = lo0; var hi = hi0; var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (p(arr(mid))) { res = mid; lo = mid + 1 } else hi = mid - 1
    }
    res
  }
  private def lowestL(arr: Array[Long], lo0: Int, hi0: Int, p: Long => Boolean): Int = {
    var lo = lo0; var hi = hi0; var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (p(arr(mid))) { res = mid; hi = mid - 1 } else lo = mid + 1
    }
    res
  }
}
