package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** KLL accuracy discipline mirrors the reference's REQ property tests
  * (ProofCheckSpec.hs:43-55): estimated ranks stay within the a-priori
  * normalized error bound; merge of partitioned streams answers like a
  * single sketch; weight (N) is conserved exactly through compaction. */
class KllSketchSpec extends AnyFunSuite {

  private def stream(n: Int, seed: Long): Array[Double] = {
    var st = seed
    Array.fill(n) { st = SplitMix64.next(st); (SplitMix64.mix(st) >>> 11).toDouble }
  }

  test("count/min/max exact through compactions; N conserved in weights") {
    val sk = KllSketch()
    val vs = stream(100000, 1L)
    vs.foreach(sk.update)
    assert(sk.count == vs.length)
    assert(sk.minimum == vs.min && sk.maximum == vs.max)
    // total weight across levels == N
    var w = 0L
    for (h <- 0 until sk.numLevels) w += sk.levelCount(h) * (1L << h)
    assert(w == vs.length, s"weight $w != N ${vs.length}")
    assert(sk.retained < 3000, s"retained ${sk.retained} not bounded")
  }

  test("rank error within 3x normalized bound on uniform stream") {
    val sk = KllSketch()
    val vs = stream(200000, 7L)
    vs.foreach(sk.update)
    val sorted = vs.sorted
    val eps = sk.normalizedRankError
    for (r <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val q = sk.quantile(r)
      val trueRank = {
        var lo = 0; var hi = sorted.length
        while (lo < hi) { val m = (lo + hi) >>> 1; if (sorted(m) < q) lo = m + 1 else hi = m }
        lo.toDouble / sorted.length
      }
      assert(math.abs(trueRank - r) <= 3 * eps + 1e-9,
        s"r=$r trueRank=$trueRank eps=$eps")
    }
  }

  test("merge of 8 partitioned sketches answers like a single sketch") {
    val vs = stream(160000, 3L)
    val single = KllSketch()
    vs.foreach(single.update)
    val parts = vs.grouped(20000).map { chunk =>
      val s = KllSketch(); chunk.foreach(s.update); s
    }.toSeq
    val merged = parts.reduce(_ merge _)
    assert(merged.count == vs.length)
    val eps = merged.normalizedRankError
    for (r <- Seq(0.1, 0.5, 0.9)) {
      val d = math.abs(merged.rank(single.quantile(r)) - r)
      assert(d <= 4 * eps, s"merged-vs-single rank drift $d at r=$r")
    }
  }

  test("serialization round-trip preserves answers") {
    val sk = KllSketch(128)
    stream(50000, 9L).foreach(sk.update)
    val bytes = sk.serialize()
    // versioned wire format (same discipline as REQ/Theta/HLL): leading
    // version byte, unknown versions rejected
    assert(bytes(0) == KllSketch.SerVersion.toByte)
    val bad = bytes.clone(); bad(0) = 99.toByte
    intercept[IllegalArgumentException] { KllSketch.deserialize(bad) }
    val back = KllSketch.deserialize(bytes)
    assert(back.count == sk.count)
    for (r <- Seq(0.05, 0.5, 0.95)) assert(back.quantile(r) == sk.quantile(r))
  }

  test("determinism: same stream -> identical serialized state") {
    val a = KllSketch(); val b = KllSketch()
    val vs = stream(70000, 11L)
    vs.foreach(a.update); vs.foreach(b.update)
    assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
  }

  test("NaN ignored; empty sketch returns NaN quantile") {
    val sk = KllSketch()
    sk.update(Double.NaN)
    assert(sk.count == 0)
    assert(sk.quantile(0.5).isNaN)
  }
}
