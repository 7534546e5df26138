package graft.spark

import org.scalatest.funsuite.AnyFunSuite

/** Distributed-correctness property of the capped bucket buffer: for ANY
  * partitioning of a bucket's members into slices and ANY merge order over
  * them (Spark chooses both at runtime), the merged buffer must agree with
  * a single sequential buffer on (n, hub, overflow, kept-member SET when
  * not overflowed) — the same merge <-> single discipline the REQ sketch
  * ports from the reference's property tests. Deterministic seeded cases,
  * repo property-test style (ReqSketchSpec). */
class CappedIdsPropertySpec extends AnyFunSuite {

  private def single(cap: Int, ids: Seq[Long]): CappedIds = {
    val b = new CappedIds(cap)
    ids.foreach(b.add)
    b
  }

  private def randomCase(rng: java.util.Random): (Int, Seq[Long], Seq[Seq[Long]]) = {
    val cap = 2 + rng.nextInt(39)
    val n = rng.nextInt(121)
    val ids = Seq.fill(n)(rng.nextLong() % 1000)
    // random partition into slices (possibly empty)
    val nSlices = 1 + rng.nextInt(8)
    val assign = ids.map(_ => rng.nextInt(nSlices))
    val slices = (0 until nSlices).map(s => ids.zip(assign).collect { case (id, a) if a == s => id })
    (cap, ids, slices)
  }

  test("property: any slice partitioning + serde round trips == sequential buffer") {
    val rng = new java.util.Random(20260816L)
    for (_ <- 1 to 500) {
      val (cap, ids, slices) = randomCase(rng)
      val expected = single(cap, ids)
      val merged = slices
        .map(s => CappedIds.deserialize(single(cap, s).serialize(), cap))
        .foldLeft(new CappedIds(cap)) { (acc, s) => acc.merge(s); acc }
      assert(merged.n == expected.n)
      if (merged.n > 0) assert(merged.hub == expected.hub)
      assert(merged.overflowed == expected.overflowed, s"cap=$cap n=${ids.length}")
      if (!expected.overflowed)
        assert(merged.kept.sorted.toSeq == expected.kept.sorted.toSeq)
    }
  }

  test("property: merge order does not change the reported stats") {
    val rng = new java.util.Random(77L)
    for (_ <- 1 to 500) {
      val (cap, _, slices) = randomCase(rng)
      def fold(ss: Seq[Seq[Long]]): CappedIds =
        ss.map(single(cap, _)).foldLeft(new CappedIds(cap)) { (a, s) => a.merge(s); a }
      val fwd = fold(slices)
      val rev = fold(slices.reverse)
      assert(fwd.n == rev.n)
      assert(fwd.overflowed == rev.overflowed)
      if (fwd.n > 0) assert(fwd.hub == rev.hub)
      if (!fwd.overflowed) assert(fwd.kept.sorted.toSeq == rev.kept.sorted.toSeq)
    }
  }
}
