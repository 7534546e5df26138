package graft.core

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic Misra–Gries guarantees, pinned against brute-force counts
  * on skewed streams and under arbitrary partition/merge schedules — the
  * properties `q_freq_tokens` pins in-plan, plus the heavy-hitter
  * containment and exact-topK claims that need a skewed stream to be
  * non-vacuous (the driver corpus is near-uniform). */
class FreqSketchSpec extends AnyFunSuite {

  /** Zipf-ish stream: item i drawn with weight ~ 1/(i+1). */
  private def zipfStream(n: Int, nItems: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    val weights = (0 until nItems).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail.toArray
    val total = cum.last
    (0 until n).map { _ =>
      val x = rnd.nextDouble() * total
      val idx = cum.indexWhere(_ >= x)
      s"item-$idx"
    }
  }

  private def exactCounts(stream: Seq[String]): Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("exact when distinct items fit the map: topK == true histogram") {
    val stream = zipfStream(20000, 40, seed = 1)
    val sk = FreqSketch(64)
    stream.foreach(sk.update(_))
    val exact = exactCounts(stream)
    assert(sk.maxError == 0)
    assert(sk.streamWeight == stream.length)
    val top = sk.topK(40)
    assert(top.length == exact.size)
    top.foreach { fi =>
      assert(fi.est == exact(fi.item) && fi.lb == fi.est && fi.ub == fi.est)
    }
    // descending by estimate, ties by item
    assert(top.map(fi => (-fi.est, fi.item)).toSeq == top.map(fi => (-fi.est, fi.item)).sortBy(identity).toSeq)
  }

  test("bounds + a-priori error + no-false-negative on a skewed over-capacity stream") {
    val stream = zipfStream(50000, 5000, seed = 2)
    val m = 64
    val sk = FreqSketch(m)
    stream.foreach(sk.update(_))
    val exact = exactCounts(stream)
    val w = stream.length.toLong
    assert(sk.maxError > 0, "stream must overflow the map or the test is vacuous")
    assert(sk.maxError * (m + 1) <= 2 * w, s"a-priori bound: ${sk.maxError} > 2*$w/${m + 1}")
    assert(sk.retainedItems <= m)
    // bounds hold for every item in the universe, tracked or not
    (exact.keys ++ Seq("never-seen")).foreach { item =>
      val t = exact.getOrElse(item, 0L)
      assert(sk.lowerBound(item) <= t, s"$item lb ${sk.lowerBound(item)} > true $t")
      assert(t <= sk.upperBound(item), s"$item ub ${sk.upperBound(item)} < true $t")
      // estimate is the ub for tracked items, 0 (not offset) for untracked
      assert(sk.estimate(item) == (if (sk.contains(item)) sk.upperBound(item) else 0L))
    }
    // no false negatives above the error
    exact.foreach { case (item, t) =>
      if (t > sk.maxError) assert(sk.contains(item), s"heavy $item (count $t > err ${sk.maxError}) evicted")
    }
    // the true top-5 are heavy enough under Zipf(5000) (count ~ W/(H·i),
    // i.e. >= ~1100 > err <= 2W/65 ~= 1538 actual ~600) to be guaranteed present
    val trueTop = exact.toSeq.sortBy(-_._2).take(5)
    trueTop.foreach { case (item, t) => assert(t > sk.maxError && sk.contains(item)) }
  }

  test("merge of arbitrary partitions preserves every guarantee and weight") {
    val stream = zipfStream(40000, 3000, seed = 3)
    val exact = exactCounts(stream)
    val m = 48
    for (parts <- Seq(2, 7, 32); seed <- Seq(11L, 12L)) {
      val rnd = new Random(seed)
      val sketches = stream.groupBy(_ => rnd.nextInt(parts)).values.map { slice =>
        val s = FreqSketch(m)
        slice.foreach(s.update(_))
        s
      }
      // fold in randomized order, like Spark's nondeterministic combine
      val merged = rnd.shuffle(sketches.toList).reduce(_ merge _)
      assert(merged.streamWeight == stream.length)
      assert(merged.maxError * (m + 1) <= 2 * stream.length.toLong)
      assert(merged.retainedItems <= m)
      exact.foreach { case (item, t) =>
        assert(merged.lowerBound(item) <= t && t <= merged.upperBound(item),
          s"parts=$parts $item true=$t not in [${merged.lowerBound(item)}, ${merged.upperBound(item)}]")
        if (t > merged.maxError) assert(merged.contains(item))
      }
    }
  }

  test("serialization round-trips state and is deterministic for equal maps") {
    val stream = zipfStream(10000, 500, seed = 4)
    val sk = FreqSketch(32)
    stream.foreach(sk.update(_))
    val bytes = sk.serialize()
    val back = FreqSketch.deserialize(bytes)
    assert(back.maxMapSize == sk.maxMapSize)
    assert(back.maxError == sk.maxError)
    assert(back.streamWeight == sk.streamWeight)
    assert(back.topK(32).toSeq == sk.topK(32).toSeq)
    assert(java.util.Arrays.equals(back.serialize(), bytes))
  }

  test("weighted update and guards") {
    val sk = FreqSketch(8)
    sk.update("a", 100)
    sk.update("b", 5)
    assert(sk.estimate("a") == 100 && sk.streamWeight == 105)
    assertThrows[IllegalArgumentException](sk.update("x", 0))
    assertThrows[IllegalArgumentException](FreqSketch(1))
    assertThrows[IllegalArgumentException](sk.merge(FreqSketch(16)))
  }
}
