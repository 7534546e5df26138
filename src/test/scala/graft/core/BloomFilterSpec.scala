package graft.core

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite

/** Bloom filter guarantees: no false negatives through any merge schedule,
  * false-positive rate near the sizing target, byte-stable serialization. */
class BloomFilterSpec extends AnyFunSuite {

  test("no false negatives; fpp near target on a random key set") {
    val rnd = new Random(1)
    val n = 50000
    val inserted = Array.fill(n)(rnd.nextLong())
    val bf = BloomFilter(n, 0.01)
    inserted.foreach(bf.update)
    inserted.foreach(k => assert(bf.mightContain(k), s"false negative for $k"))
    // probe disjoint keys: observed fpp within 3x of the 1% target
    val insertedSet = inserted.toSet
    var fp = 0
    val probes = 100000
    var i = 0
    while (i < probes) {
      val k = rnd.nextLong()
      if (!insertedSet.contains(k) && bf.mightContain(k)) fp += 1
      i += 1
    }
    val observed = fp.toDouble / probes
    assert(observed < 0.03, s"observed fpp $observed >> 0.01 target")
    assert(math.abs(bf.expectedFpp - observed) < 0.02)
    assert(bf.itemsAdded == n)
  }

  test("merge across arbitrary partitions == single build (byte-identical)") {
    val rnd = new Random(2)
    val keys = Array.fill(20000)(rnd.nextLong())
    val single = BloomFilter(20000, 0.01)
    keys.foreach(single.update)
    for (parts <- Seq(2, 9, 32)) {
      val r2 = new Random(parts)
      val slices = keys.groupBy(_ => r2.nextInt(parts)).values.toList
      val partials = slices.map { s =>
        val f = BloomFilter(20000, 0.01)
        s.foreach(f.update)
        f
      }
      val merged = r2.shuffle(partials).reduce(_ merge _)
      assert(java.util.Arrays.equals(merged.serialize(), single.serialize()),
        s"parts=$parts merged filter differs from single build")
    }
  }

  test("serialization round-trips; config guards") {
    val bf = BloomFilter(1000, 0.05)
    (1L to 500L).foreach(bf.update)
    val back = BloomFilter.deserialize(bf.serialize())
    assert(back.numBits == bf.numBits && back.numHashes == bf.numHashes)
    assert(back.itemsAdded == 500)
    (1L to 500L).foreach(k => assert(back.mightContain(k)))
    assert(java.util.Arrays.equals(back.serialize(), bf.serialize()))
    assertThrows[IllegalArgumentException](bf.merge(BloomFilter(10, 0.05)))
    assertThrows[IllegalArgumentException](BloomFilter(0, 0.01))
    assertThrows[IllegalArgumentException](BloomFilter(10, 1.5))
  }

  test("sizing formulas match the standard optima") {
    // n=10^6, p=0.01 -> m ~ 9.585e6 bits, k ~ 7
    val m = BloomFilter.optimalNumBits(1000000, 0.01)
    assert(m > 9500000 && m < 9700000, s"m=$m")
    assert(BloomFilter.optimalNumHashes(1000000, m) == 7)
  }
}
