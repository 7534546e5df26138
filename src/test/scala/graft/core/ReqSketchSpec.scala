package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference test suite
  * (`/root/reference/data-sketches/test/RelativeErrorQuantileSpec.hs`,
  * `DoubleBufferSpec.hs`, `AuxiliarySpec.hs`, `CompactorSpec.hs`,
  * `ProofCheckSpec.hs`) — same inputs, same expected vectors — plus the two
  * properties the reference declares but stubs (SURVEY.md §5): epsilon-bounded
  * quantiles and merge ≡ single-sketch. Property streams are deterministic
  * (SplitMix64-seeded) so the suite never flakes.
  */
class ReqSketchSpec extends AnyFunSuite {

  /** Deterministic pseudo-random finite-double streams (property inputs). */
  private def randomStreams(numStreams: Int, maxLen: Int, seed0: Long): Seq[List[Double]] = {
    var st = seed0
    def nextLong(): Long = { st = SplitMix64.next(st); SplitMix64.mix(st) }
    (1 to numStreams).map { _ =>
      val n = 1 + (math.abs(nextLong()) % maxLen).toInt
      List.fill(n)((nextLong() % 2000001L).toDouble / 2.0)
    }
  }

  private def sketchOf(vs: Seq[Double], k: Int = 6, hra: Boolean = true): ReqSketch = {
    val s = ReqSketch(k, hra)
    vs.foreach(s.update)
    s
  }

  // --- RelativeErrorQuantileSpec.hs:53-82: exact rank vectors, 10 values ---
  val simpleVals: Seq[Double] = Seq(5, 5, 5, 6, 6, 6, 7, 8, 8, 8).map(_.toDouble)
  val lessThanRs = Seq(0, 0, 0, .3, .3, .3, .6, .7, .7, .7)
  val lessThanEqRs = Seq(.3, .3, .3, .6, .6, .6, .7, 1, 1, 1)

  test("exact ranks, < criterion (RelativeErrorQuantileSpec.hs:53-70)") {
    val s = sketchOf(simpleVals)
    assert(!s.isEstimationMode)
    simpleVals.zip(lessThanRs).foreach { case (v, r) =>
      assert(math.abs(s.rank(v, inclusive = false) - r) < 1e-12, s"rank($v)")
    }
  }

  test("exact ranks, <= criterion (RelativeErrorQuantileSpec.hs:71-82)") {
    val s = sketchOf(simpleVals)
    simpleVals.zip(lessThanEqRs).foreach { case (v, r) =>
      assert(math.abs(s.rank(v, inclusive = true) - r) < 1e-12, s"rank<=($v)")
    }
  }

  test("exact aggregates: count/sum/min/max (REQ:219-242)") {
    val s = sketchOf(simpleVals)
    assert(s.count == 10)
    assert(s.sum == simpleVals.sum)
    assert(s.minimum == 5.0)
    assert(s.maximum == 8.0)
    assert(!s.isEmpty)
  }

  // --- RelativeErrorQuantileSpec.hs:22-35: NaN / infinity edge cases ---
  test("NaN insert is ignored (REQ:481)") {
    val s = sketchOf(Seq(1.0, Double.NaN, 2.0))
    assert(s.count == 2)
  }
  test("empty sketch: NaN answers") {
    val s = ReqSketch(6)
    assert(s.rank(1.0).isNaN)
    assert(s.minimum.isNaN && s.maximum.isNaN)
    assert(s.cdf(Seq(1.0)).isEmpty)
  }
  test("infinite probe throws (DoubleBuffer.hs:152)") {
    val s = sketchOf(simpleVals)
    intercept[IllegalArgumentException](s.rank(Double.PositiveInfinity))
  }
  test("NaN split throws (REQ:136-143)") {
    val s = sketchOf(simpleVals)
    intercept[IllegalArgumentException](s.cdf(Seq(Double.NaN)))
    intercept[IllegalArgumentException](s.cdf(Seq(2.0, 1.0)))
    intercept[IllegalArgumentException](s.cdf(Seq.empty))
  }

  // --- RelativeErrorQuantileSpec.hs:60-63: compaction stress ---
  test("10k repeated value compaction stress") {
    val s = sketchOf(Seq.fill(10000)(1.0))
    assert(s.count == 10000)
    assert(s.isEstimationMode)
    assert(s.quantile(0.5) == 1.0)
    assert(s.rank(1.0, inclusive = true) == 1.0)
    assert(s.rank(1.0, inclusive = false) == 0.0)
    assert(s.retainedItemCount < 10000 / 4, "must have compacted")
  }

  // --- RelativeErrorQuantileSpec.hs:36-48,133-145: merge conservation ---
  test("merge count conservation") {
    val a = sketchOf((5 to 10).map(_.toDouble))
    val b = sketchOf((1 to 15).map(_.toDouble))
    val c = sketchOf((16 to 300).map(_.toDouble))
    a.merge(b).merge(c)
    assert(a.count == 6 + 15 + 285)
    assert(a.minimum == 1.0 && a.maximum == 300.0)
    assert(math.abs(a.sum - ((5 to 10).sum + (1 to 15).sum + (16 to 300).sum)) < 1e-9)
  }

  test("merge max-value correctness (reference bug §8.1 fixed)") {
    val a = sketchOf(Seq(1.0, 100.0))
    val b = sketchOf(Seq(2.0, 3.0))
    a.merge(b) // other max (3) < this max (100): max must stay 100
    assert(a.maximum == 100.0)
    assert(a.minimum == 1.0)
  }

  test("merge requires same rank accuracy (REQ:438-439)") {
    intercept[IllegalArgumentException] {
      sketchOf(Seq(1.0), hra = true).merge(sketchOf(Seq(2.0), hra = false))
    }
  }

  // --- bigTest grid (RelativeErrorQuantileSpec.hs:91-94,108-128,156-203) ---
  for {
    hra <- Seq(true, false)
    inclusive <- Seq(false, true)
    (dirName, stream) <- Seq("asc" -> (1 to 200).map(_.toDouble),
                             "desc" -> (200 to 1 by -1).map(_.toDouble))
  } test(s"bigTest hra=$hra inclusive=$inclusive $dirName: monotone ranks/quantiles, CDF/PMF well-formed") {
    val s = sketchOf(stream, k = 6, hra = hra)
    assert(s.count == 200)
    // rank monotone nondecreasing in v
    val ranks = (1 to 200).map(v => s.rank(v.toDouble, inclusive))
    assert(ranks.sliding(2).forall(p => p(0) <= p(1)), "ranks must be monotone")
    assert(ranks.forall(r => r >= 0.0 && r <= 1.0))
    // quantiles monotone nondecreasing in r
    val rs = (0 to 20).map(_ / 20.0)
    val qs = rs.map(s.quantile(_, inclusive))
    assert(qs.sliding(2).forall(p => p(0) <= p(1)), "quantiles must be monotone")
    assert(qs.head >= 1.0 && qs.last <= 200.0)
    // CDF nondecreasing ending at 1; PMF sums to 1
    val splits = Seq(50.0, 100.0, 150.0)
    val cdf = s.cdf(splits, inclusive).get
    assert(cdf.sliding(2).forall(p => p(0) <= p(1)))
    assert(cdf.last == 1.0)
    val pmf = s.pmf(splits, inclusive).get
    assert(math.abs(pmf.sum - 1.0) < 1e-9)
    assert(pmf.forall(_ >= 0.0))
  }

  test("degenerate quantile (RelativeErrorQuantileSpec.hs:98-105)") {
    val s = sketchOf(Seq(1.0))
    assert(s.quantile(0.0) == 1.0)
    assert(s.quantile(1.0) == 1.0)
    intercept[IllegalArgumentException](s.quantile(1.5))
  }

  // --- ProofCheckSpec.hs:43-55: 3-sigma rank bound property ---
  test("property: estimated rank within 3-sigma bounds of true rank (ProofCheckSpec.hs:43-55)") {
    randomStreams(30, 2000, 0xA11CE5L).foreach { xs =>
      val s = sketchOf(xs, k = 12, hra = true)
      val sorted = xs.sorted
      val n = xs.length
      (1 to 19).foreach { i =>
        val r = i / 20.0
        val v = sorted(math.min(n - 1, (r * n).toInt))
        val trueRank = sorted.count(_ < v).toDouble / n
        val est = s.rank(v)
        val lb = ReqBounds.rankLB(12, s.numLevels, est, 3, true, n)
        val ub = ReqBounds.rankUB(12, s.numLevels, est, 3, true, n)
        assert(trueRank >= lb - 1e-9 && trueRank <= ub + 1e-9,
          s"true=$trueRank est=$est lb=$lb ub=$ub n=$n")
      }
    }
  }

  // --- stubbed-in-reference property #1: merge ≡ single sketch ± eps ---
  test("property: N-way partitioned merge matches single sketch within bounds (PCS:57-73 stub, implemented)") {
    randomStreams(20, 3000, 0xB0B5L).zipWithIndex.foreach { case (xs, i) =>
      val parts = 2 + i % 7
      val single = sketchOf(xs, k = 12)
      val merged = xs.grouped(math.max(1, xs.length / parts))
        .map(g => sketchOf(g, k = 12))
        .reduce((a, b) => a.merge(b))
      assert(merged.count == single.count)
      assert(merged.minimum == single.minimum && merged.maximum == single.maximum)
      val sorted = xs.sorted
      val n = xs.length
      Seq(0.25, 0.5, 0.75).foreach { r =>
        val v = sorted(math.min(n - 1, (r * n).toInt))
        val trueRank = sorted.count(_ < v).toDouble / n
        Seq(single, merged).foreach { s =>
          val est = s.rank(v)
          val lb = ReqBounds.rankLB(12, s.numLevels, est, 3, true, n)
          val ub = ReqBounds.rankUB(12, s.numLevels, est, 3, true, n)
          assert(trueRank >= lb - 1e-9 && trueRank <= ub + 1e-9)
        }
      }
    }
  }

  // --- stubbed-in-reference property #2: eps-bounded quantiles ---
  test("property: quantile of rank r has true rank near r (RQS:49-51 stub, implemented)") {
    randomStreams(20, 2000, 0xC0FFEEL).filter(_.length >= 10).foreach { xs =>
      val s = sketchOf(xs, k = 12, hra = true)
      val sorted = xs.sorted
      val n = xs.length
      Seq(0.1, 0.5, 0.9, 0.99).foreach { r =>
        val q = s.quantile(r)
        val trueRankLo = sorted.count(_ < q).toDouble / n
        val trueRankHi = sorted.count(_ <= q).toDouble / n
        val lb = ReqBounds.rankLB(12, s.numLevels, r, 3, true, n) - 1.0 / n - 1e-9
        val ub = ReqBounds.rankUB(12, s.numLevels, r, 3, true, n) + 1.0 / n + 1e-9
        assert(trueRankHi >= lb && trueRankLo <= ub,
          s"r=$r q=$q trueRank=[$trueRankLo,$trueRankHi] bounds=[$lb,$ub] n=$n")
      }
    }
  }

  test("serialization round-trip preserves all query answers") {
    val xs = (1 to 5000).map(i => (i * 2654435761L % 10007).toDouble)
    val s = sketchOf(xs, k = 8)
    val r = ReqSketch.deserialize(s.serialize())
    assert(r.count == s.count && r.sum == s.sum)
    assert(r.minimum == s.minimum && r.maximum == s.maximum)
    assert(r.retainedItemCount == s.retainedItemCount)
    Seq(0.0, 0.1, 0.5, 0.9, 1.0).foreach { q =>
      assert(r.quantile(q) == s.quantile(q))
    }
    xs.take(50).foreach(v => assert(r.rank(v) == s.rank(v)))
    // merged deserialized sketches still work
    val other = sketchOf((1 to 100).map(_.toDouble), k = 8)
    assert(r.merge(other).count == s.count + 100)
  }

  test("determinism: same stream, same seed => identical serialized state") {
    val xs = (1 to 20000).map(i => (i * 48271L % 65537).toDouble)
    val a = sketchOf(xs, k = 6)
    val b = sketchOf(xs, k = 6)
    assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
  }

  test("exact until first compaction (SURVEY.md §8.7)") {
    val s = ReqSketch(12, hra = true)
    (1 to 30).foreach(i => s.update(i.toDouble))
    assert(!s.isEstimationMode)
    assert(s.rank(15.0) == 14.0 / 30.0)
    assert(s.quantile(0.5, inclusive = true) == 15.0)
  }
}

class DoubleBufferSpec extends AnyFunSuite {
  // DoubleBufferSpec.hs:12-25: merge-sort both directions vs sort oracle
  for (sab <- Seq(true, false)) test(s"mergeSortIn spaceAtBottom=$sab matches sorted-union oracle (DoubleBufferSpec.hs:12-25)") {
    val xs = (0 to 31).map(_.toDouble).toArray
    val a = DoubleBuffer.fromArray(xs, sab)
    val b = DoubleBuffer.fromArray(xs, sab)
    a.sort(); b.sort()
    a.mergeSortIn(b)
    val expect = (xs ++ xs).sorted
    assert(a.toArray.toSeq == expect.toSeq)
    assert(a.count == 64)
  }

  test("evens/odds parity (DoubleBufferSpec.hs:39-48)") {
    val b = DoubleBuffer.fromArray((1 to 8).map(_.toDouble).toArray, false)
    assert(b.getEvensOrOdds(0, 8, odds = false).toSeq == Seq(1.0, 3.0, 5.0, 7.0))
    assert(b.getEvensOrOdds(0, 8, odds = true).toSeq == Seq(2.0, 4.0, 6.0, 8.0))
  }

  test("append/space/capacity (DoubleBufferSpec.hs:50-98)") {
    val b = DoubleBuffer(4, 4, spaceAtBottom = true)
    (1 to 20).foreach(i => b.append(i.toDouble))
    assert(b.count == 20)
    assert(b.capacity >= 20)
    assert(b.toArray.sorted.toSeq == (1 to 20).map(_.toDouble))
  }

  test("criterion counting with duplicate merges (DoubleBufferSpec.hs:100-116)") {
    val xs = (1 to 7).map(_.toDouble).toArray
    val b = DoubleBuffer.fromArray(xs, false)
    val c = DoubleBuffer.fromArray(xs, false)
    b.sort(); c.sort()
    b.mergeSortIn(c) // two copies of 1..7
    assert(b.countWithCriterion(2.5, inclusive = false) == 4)  // 1,1,2,2
    assert(b.countWithCriterion(4.0, inclusive = false) == 6)  // 1,1,2,2,3,3
    assert(b.countWithCriterion(7.0, inclusive = true) == 14)
  }

  test("trimCount keeps accurate end per direction") {
    // HRA (spaceAtBottom): trim removes logical-LOW items
    val h = DoubleBuffer.fromArray((1 to 8).map(_.toDouble).toArray, true)
    h.sort(); h.trimCount(4)
    assert(h.toArray.toSeq == Seq(5.0, 6.0, 7.0, 8.0))
    // LRA: trim removes logical-HIGH items
    val l = DoubleBuffer.fromArray((1 to 8).map(_.toDouble).toArray, false)
    l.sort(); l.trimCount(4)
    assert(l.toArray.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }
}

class CompactorSpec extends AnyFunSuite {
  test("nearestEven half-to-even (CompactorSpec.hs:7-9)") {
    assert(ReqCompactor.nearestEven(-0.9) == 0)
    assert(ReqCompactor.nearestEven(1.0) == 0 || ReqCompactor.nearestEven(1.0) == 2) // rint(0.5)=0 → 0
    assert(ReqCompactor.nearestEven(1.0) == 0) // banker's: rint(0.5) = 0
    assert(ReqCompactor.nearestEven(3.0) == 4) // rint(1.5) = 2 → 4
    assert(ReqCompactor.nearestEven(4.9) == 4)
    assert(ReqCompactor.nearestEven(5.1) == 6)
  }
}

class AuxiliarySpec extends AnyFunSuite {
  test("weighted merge equals sorted union with cumulative weights (AuxiliarySpec.hs:18-39)") {
    // odds [1,3..11] at weight 1 (lgWeight 0), evens [2,4..12] at weight 2 (lgWeight 1)
    val seed = 42L
    val c0 = ReqCompactor(0, hra = false, k = 4, seed)
    Seq(1.0, 3.0, 5.0, 7.0, 9.0, 11.0).foreach(c0.buffer.append)
    val c1 = ReqCompactor(1, hra = false, k = 4, seed)
    Seq(2.0, 4.0, 6.0, 8.0, 10.0, 12.0).foreach(c1.buffer.append)
    val totalN = 6L * 1 + 6L * 2
    val aux = ReqAuxiliary.build(IndexedSeq(c0, c1), totalN, 12)
    assert(aux.items.toSeq == (1 to 12).map(_.toDouble))
    // cumulative weights: 1,3,4,6,7,9,10,12,13,15,16,18
    assert(aux.cumWeights.toSeq == Seq(1L, 3, 4, 6, 7, 9, 10, 12, 13, 15, 16, 18))
  }
}
