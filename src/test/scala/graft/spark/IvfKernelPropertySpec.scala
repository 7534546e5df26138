package graft.spark

import graft.core.SplitMix64
import graft.operators.IvfIndex
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side kernel properties for the IVF quantizer (no Spark session):
  * the probe list must be consistent with the single-cell assignment, or
  * the stored index and the search path silently disagree. Deterministic
  * seeded cases, repo property-test style (CappedIdsPropertySpec). */
class IvfKernelPropertySpec extends AnyFunSuite {

  private def vec(seed: Long, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      val h = SplitMix64.mix(seed ^ (i.toLong * 0x9E3779B97F4A7C15L))
      (h >>> 11).toDouble / 9007199254740992.0 - 0.5
    }

  private def cases(n: Int): Seq[(Long, Int, Int)] =
    (0 until n).map { c =>
      val s = SplitMix64.mix(0xABCDEF0L + c)
      val dim = 2 + (SplitMix64.mix(s + 1) >>> 33).toInt % 47
      val k = 1 + (SplitMix64.mix(s + 2) >>> 33).toInt % 24
      (s, dim, k)
    }

  test("nearestCells head equals nearestCell; probe list distinct, cosine-descending") {
    for ((seed, dim, k) <- cases(200)) {
      val cents = Array.tabulate(k)(c => vec(seed ^ (c + 1).toLong, dim))
      val v = vec(seed ^ 0x5DEECE66DL, dim)
      val best = IvfIndex.nearestCell(v, cents)
      val probes = IvfIndex.nearestCells(v, cents, math.min(4, k))
      assert(probes.head == best, s"case ($seed,$dim,$k)")
      assert(probes.distinct.length == probes.length)
      val cos = probes.map(c => graft.operators.AnnSearch.cosineKernel(v, cents(c)))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b },
        s"probe cosines not descending for ($seed,$dim,$k): ${cos.mkString(",")}")
    }
  }

  test("nearestCells(n >= k) enumerates every cell") {
    for ((seed, dim, k) <- cases(100)) {
      val cents = Array.tabulate(k)(c => vec(seed ^ (c + 7).toLong, dim))
      val v = vec(seed, dim)
      assert(IvfIndex.nearestCells(v, cents, k + 3).sorted.toSeq == (0 until k))
    }
  }
}
