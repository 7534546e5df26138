package graft.core

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite

/** Counting Bloom guarantees: no false negatives for members (including
  * after removes/subtract of other members), merge byte-identity under any
  * schedule, subtract == per-key removes, loud contract violations, and
  * probe-compatibility of the (n, fpp) sizing with the bitset twin. */
class CountingBloomSpec extends AnyFunSuite {

  test("no false negatives; fpp near target; delete keeps members intact") {
    val rnd = new Random(11)
    val n = 50000
    val inserted = Array.fill(n)(rnd.nextLong()).distinct
    val cf = CountingBloomFilter(inserted.length.toLong, 0.01)
    inserted.foreach(cf.update)
    inserted.foreach(k => assert(cf.mightContain(k), s"false negative for $k"))
    // retire a random half — every REMAINING member must still test true
    // (the property the bitset filter cannot provide at all)
    val (retired, kept) = inserted.splitAt(inserted.length / 2)
    retired.foreach(cf.remove)
    kept.foreach(k => assert(cf.mightContain(k), s"false negative for kept $k after retire"))
    assert(cf.itemsAdded == kept.length)
    // fp probe against keys never inserted: load HALVED by the retirement,
    // so the observed rate must sit at-or-below the full-filter target
    val all = inserted.toSet
    var fp = 0
    val probes = 100000
    var i = 0
    while (i < probes) {
      val k = rnd.nextLong()
      if (!all.contains(k) && cf.mightContain(k)) fp += 1
      i += 1
    }
    assert(fp.toDouble / probes < 0.01, s"post-retire fpp ${fp.toDouble / probes} above full-filter target")
  }

  test("merge across arbitrary partitions == single build (byte-identical)") {
    val rnd = new Random(12)
    val keys = Array.fill(20000)(rnd.nextLong())
    val single = CountingBloomFilter(20000, 0.01)
    keys.foreach(single.update)
    for (parts <- Seq(2, 9, 32)) {
      val r2 = new Random(parts)
      val slices = keys.groupBy(_ => r2.nextInt(parts)).values.toList
      val partials = slices.map { s =>
        val f = CountingBloomFilter(20000, 0.01)
        s.foreach(f.update)
        f
      }
      val merged = r2.shuffle(partials).reduce(_ merge _)
      assert(java.util.Arrays.equals(merged.serialize(), single.serialize()),
        s"parts=$parts merged filter differs from single build")
    }
  }

  test("subtract of a deletes filter == sequential removes (byte-identical)") {
    val rnd = new Random(13)
    val keys = Array.fill(5000)(rnd.nextLong()).distinct
    val (retired, _) = keys.splitAt(1500)
    // path A: per-key removes
    val a = CountingBloomFilter(keys.length.toLong, 0.01)
    keys.foreach(a.update)
    retired.foreach(a.remove)
    // path B: one deletes filter with the SAME geometry, subtracted
    val b = CountingBloomFilter(keys.length.toLong, 0.01)
    keys.foreach(b.update)
    val del = CountingBloomFilter.withConfig(b.numCells, b.numHashes)
    retired.foreach(del.update)
    b.subtract(del)
    assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
    assert(b.itemsAdded == keys.length - retired.length)
  }

  test("contract violations are loud: unknown-key remove, geometry, underflow") {
    val cf = CountingBloomFilter(1000, 0.01)
    (1L to 100L).foreach(cf.update)
    // a key far outside the inserted set: with 1000-item sizing the chance
    // all k cells collide is ~fpp^1 — pick one that tests absent first
    val absent = Iterator.iterate(999999L)(_ + 1).find(!cf.mightContain(_)).get
    assertThrows[IllegalArgumentException](cf.remove(absent))
    assertThrows[IllegalArgumentException](
      cf.merge(CountingBloomFilter.withConfig(64, 1)))
    // deletes filter carrying MORE of a key than was inserted underflows
    val del = CountingBloomFilter.withConfig(cf.numCells, cf.numHashes)
    del.update(1L); del.update(1L)
    assertThrows[IllegalArgumentException](cf.subtract(del))
  }

  test("serialization round-trips; sizing matches the bitset twin's probes") {
    val cf = CountingBloomFilter(1000, 0.05)
    (1L to 500L).foreach(cf.update)
    val back = CountingBloomFilter.deserialize(cf.serialize())
    assert(back.numCells == cf.numCells && back.numHashes == cf.numHashes)
    assert(back.itemsAdded == 500)
    (1L to 500L).foreach(k => assert(back.mightContain(k)))
    assert(java.util.Arrays.equals(back.serialize(), cf.serialize()))
    // same (n, fpp) => same geometry and same probe arithmetic as the
    // bitset filter: membership answers agree EXACTLY on every probe
    val bf = BloomFilter(1000, 0.05)
    (1L to 500L).foreach(bf.update)
    assert(bf.numBits == cf.numCells && bf.numHashes == cf.numHashes)
    val rnd = new Random(14)
    (1 to 20000).foreach { _ =>
      val k = rnd.nextLong()
      assert(bf.mightContain(k) == cf.mightContain(k), s"probe disagreement on $k")
    }
  }

  test("saturation: counters pin at 255 and subtract refuses") {
    val cf = CountingBloomFilter.withConfig(64, 1)
    (1 to 300).foreach(_ => cf.update(7L))
    assert(cf.maxCell == 255)
    assert(cf.mightContain(7L))
    val del = CountingBloomFilter.withConfig(64, 1)
    del.update(7L)
    assertThrows[IllegalArgumentException](cf.subtract(del))
    // remove on a saturated cell leaves it (can only cause fp, never fn)
    cf.remove(7L)
    assert(cf.mightContain(7L))
  }

  test("failed remove/subtract leave the filter byte-identical (no partial decrement)") {
    val cf = CountingBloomFilter.withConfig(1 << 12, 7)
    (0L until 500L).foreach(cf.update)
    val before = cf.serialize().toSeq
    // a never-inserted key whose early probe cells overlap members: the
    // violation must abort BEFORE any cell is touched, or members sharing
    // those cells would read as definitely-absent afterwards
    val bogus = (100000L to 110000L).find(k => !cf.mightContain(k)).get
    assertThrows[IllegalArgumentException](cf.remove(bogus))
    assert(cf.serialize().toSeq == before, "partial decrement after failed remove")
    val del = CountingBloomFilter.withConfig(1 << 12, 7)
    del.update(1L); del.update(bogus) // bogus was never in cf -> underflow
    assertThrows[IllegalArgumentException](cf.subtract(del))
    assert(cf.serialize().toSeq == before, "partial decrement after failed subtract")
    (0L until 500L).foreach(k => assert(cf.mightContain(k)))
  }

  test("colliding probe cells (non-coprime geometry): update/remove round-trips exactly") {
    // 65 = 5*13 cells: a key whose probe step shares a factor with the
    // cell count can hit one cell twice — update then gives that cell 2,
    // and remove must account for the multiplicity (a per-probe decrement
    // that rechecks >0 per step, or a multiset-blind validation, both
    // corrupt this case)
    val key = (0L to 100000L).find { k =>
      val f = CountingBloomFilter.withConfig(65, 7)
      f.update(k)
      f.maxCell == 2
    }
    assert(key.nonEmpty, "no colliding key found in range — geometry changed?")
    val f = CountingBloomFilter.withConfig(65, 7)
    val empty = f.serialize().toSeq
    f.update(key.get)
    assert(f.maxCell == 2)
    f.remove(key.get)
    assert(f.serialize().toSeq == empty, "collision-cell remove must restore the empty filter")
    // removing it AGAIN is the violation and must leave the filter intact
    f.update(key.get)
    val one = f.serialize().toSeq
    f.remove(key.get)
    assertThrows[IllegalArgumentException](f.remove(key.get))
    assert(f.serialize().toSeq == empty)
    f.update(key.get)
    assert(f.serialize().toSeq == one, "filter must stay usable after the refused remove")
  }
}
