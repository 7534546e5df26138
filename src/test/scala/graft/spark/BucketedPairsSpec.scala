package graft.spark

import graft.operators.{BucketedPairs, ExactDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted, size-capped bucket -> candidate-edge collection: semantics
  * (all-pairs below cap, star above) must be exact, and no aggregation
  * buffer may ever hold a hot bucket. */
class BucketedPairsSpec extends AnyFunSuite with SparkSuiteBase {

  import graft.spark.{CappedIds => CI}

  private def edgesOf(members: Seq[(Long, Long)], cap: Int, salt: Int = 16): Set[(Long, Long)] = {
    import spark.implicits._
    BucketedPairs.edges(members.toDF("k", "id"), Seq("k"), "id", cap, salt)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("all-pairs semantics below cap, across salt slices") {
    // buckets of sizes 1..9 (all below cap) scattered over keys; salting
    // must not lose cross-slice pairs
    val members = for {
      k <- 0L until 40L
      i <- 0L until (k % 10)
    } yield (k, k * 1000 + i)
    val expected = members.groupBy(_._1).values.flatMap { m =>
      val ids = m.map(_._2).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
    }.toSet
    assert(edgesOf(members, cap = 64) == expected)
    assert(edgesOf(members, cap = 64, salt = 1) == expected)
    assert(edgesOf(members, cap = 64, salt = 3) == expected)
  }

  test("hot bucket (kept-list regime, cap < n <= salt*cap) emits exactly the star") {
    // 300 members with cap 64, salt 16: slices stay under the slice cap, so
    // the star comes straight from the merged kept list — no join-back scan
    val hot = (0L until 300L).map(i => (7L, 100000L + i))
    val small = Seq((8L, 1L), (8L, 2L))
    val got = edgesOf(hot ++ small, cap = 64)
    val star = (1L until 300L).map(i => (100000L, 100000L + i)).toSet
    assert(got == star + ((1L, 2L)), s"got ${got.size} edges")
  }

  test("monster bucket (n > salt*cap, kept list overflows) emits exactly the star via join") {
    val hot = (0L until 10000L).map(i => (7L, 100000L + i))
    val small = Seq((8L, 1L), (8L, 2L))
    val got = edgesOf(hot ++ small, cap = 64)
    val star = (1L until 10000L).map(i => (100000L, 100000L + i)).toSet
    assert(got == star + ((1L, 2L)), s"got ${got.size} edges")
  }

  test("boundary: bucket of exactly cap members still emits all pairs") {
    val members = (0L until 64L).map(i => (1L, i))
    val got = edgesOf(members, cap = 64)
    assert(got.size == 64 * 63 / 2)
  }

  test("CappedIds buffer never stores more than cap+1 ids and merges exactly") {
    val cap = 8
    val a = new CI(cap); val b = new CI(cap)
    (1L to 4L).foreach(a.add); (5L to 8L).foreach(b.add)
    a.merge(b)
    assert(a.n == 8 && a.hub == 1 && !a.overflowed)
    assert(a.kept.sorted.toSeq == (1L to 8L))
    // push over the cap: count/min stay exact, list drops
    (9L to 100L).foreach(a.add)
    assert(a.n == 100 && a.hub == 1 && a.overflowed)
    // serialization round-trip of an overflowed buffer keeps (n, hub, overflow)
    val rt = CI.deserialize(a.serialize(), cap)
    assert(rt.n == 100 && rt.hub == 1 && rt.overflowed)
    // merging an overflowed slice poisons the member list but not the stats
    val c = new CI(cap); c.add(200L)
    c.merge(rt)
    assert(c.n == 101 && c.hub == 1 && c.overflowed)
  }

  test("ExactDedup.starEdges: 10^4-member exact-dup group yields O(g) edges") {
    import spark.implicits._
    val docs = ((0L until 10000L).map(i => (i, "the same boilerplate page")) ++
      Seq((20000L, "unique a"), (20001L, "unique b"), (20002L, "unique b")))
      .toDF("doc_id", "text")
    val edges = ExactDedup.starEdges(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.length == 9999 + 1)
    assert(edges.count(_._1 == 0L) == 9999) // hub = min id of the big group
    assert(edges.contains((20001L, 20002L)))
  }
}
