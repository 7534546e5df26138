package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CmsSketchSpec extends AnyFunSuite {

  private def zipf(n: Int, distinct: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    // skewed stream: item k with weight ~ 1/(k+1)
    val weights = (0 until distinct).map(k => 1.0 / (k + 1))
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    (0 until n).map { _ =>
      val u = rnd.nextDouble()
      s"tok${cum.indexWhere(u <= _)}"
    }
  }

  test("estimate never under-counts; untracked items estimate >= 0") {
    val items = zipf(20000, 500, 1L)
    val sk = CmsSketch(depth = 4, width = 64) // narrow: collisions guaranteed
    items.foreach(sk.update(_))
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (item, c) =>
      assert(sk.estimate(item) >= c, s"under-count for $item")
    }
    assert(sk.estimate("never-seen") >= 0L)
    assert(sk.streamWeight == items.size.toLong)
  }

  test("every row conserves the stream weight") {
    val items = zipf(5000, 200, 2L)
    val sk = CmsSketch(depth = 5, width = 32)
    items.foreach(sk.update(_))
    assert(sk.rowsConserved)
  }

  test("linearity: any partition + merge schedule == single-pass, byte-identical") {
    val items = zipf(8000, 300, 3L)
    val single = CmsSketch(depth = 4, width = 128)
    items.foreach(single.update(_))
    // 7 partials merged in a skewed tree shape
    val parts = items.grouped(1143).toSeq.map { chunk =>
      val p = CmsSketch(depth = 4, width = 128)
      chunk.foreach(p.update(_))
      p
    }
    val left = parts.reduceLeft(_.merge(_))
    assert(java.util.Arrays.equals(left.serialize(), single.serialize()))
    // different shape: pairwise tree
    val parts2 = items.grouped(1143).toSeq.map { chunk =>
      val p = CmsSketch(depth = 4, width = 128)
      chunk.foreach(p.update(_))
      p
    }
    def tree(ps: Seq[CmsSketch]): CmsSketch =
      if (ps.size == 1) ps.head
      else tree(ps.grouped(2).map(g => if (g.size == 2) g(0).merge(g(1)) else g(0)).toSeq)
    assert(java.util.Arrays.equals(tree(parts2).serialize(), single.serialize()))
  }

  test("error stays within the a-priori scale at reasonable width (probabilistic, generous)") {
    val items = zipf(50000, 1000, 4L)
    val sk = CmsSketch(depth = 5, width = 1024)
    items.foreach(sk.update(_))
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // e/width * W with depth 5 rows: per-item failure prob e^-5 ~ 0.7%;
    // assert with 3x headroom that NO item of the 1000 blows 3x the scale
    val bound = 3.0 * sk.errorScale
    truth.foreach { case (item, c) =>
      assert(sk.estimate(item) - c <= bound, s"estimate error blew 3x eps*W for $item")
    }
  }

  test("serialize round trip preserves estimates, weight, config") {
    val items = zipf(3000, 100, 5L)
    val sk = CmsSketch(depth = 3, width = 64)
    items.foreach(sk.update(_))
    val back = CmsSketch.deserialize(sk.serialize())
    assert(back.depth == 3 && back.width == 64)
    assert(back.streamWeight == sk.streamWeight)
    items.distinct.foreach(i => assert(back.estimate(i) == sk.estimate(i)))
    assert(java.util.Arrays.equals(back.serialize(), sk.serialize()))
  }

  test("merge rejects mismatched dims; weighted updates supported") {
    val a = CmsSketch(depth = 4, width = 64)
    val b = CmsSketch(depth = 4, width = 128)
    intercept[IllegalArgumentException] { a.merge(b) }
    val c = CmsSketch(depth = 4, width = 64)
    c.update("x", 5L)
    c.update("x", 2L)
    assert(c.estimate("x") >= 7L)
    assert(c.streamWeight == 7L)
    intercept[IllegalArgumentException] { c.update("x", 0L) }
  }
}
