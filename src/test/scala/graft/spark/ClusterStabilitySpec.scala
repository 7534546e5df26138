package graft.spark

import graft.operators.ClusterStability
import org.scalatest.funsuite.AnyFunSuite

/** Cluster-drift transition report: statuses, argmax tie-breaks, and the
  * self-comparison identity are pinned on hand-built assignments where the
  * truth is checkable by eye. */
class ClusterStabilitySpec extends AnyFunSuite with SparkSuiteBase {

  import spark.implicits._

  // clustering A: {1,2,3} as 1, {4,5} as 4, {6} as 6
  private def a = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
    (6L, 6L)).toDF("id", "cluster")
  // clustering B: splits 1 into {1,2}/{3}, merges {4,5} with {6}
  private def b = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 4L),
    (6L, 4L)).toDF("id", "cluster")

  test("statuses: split, grown, stable in both directions") {
    val refine = ClusterStability.transitions(a, b)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    // cluster 1 (size 3) scatters over B:{1,3} -> split, best = B:1 (ov 2)
    assert(refine(1L) == (3L, 1L, 2L, 2L, "split"))
    // cluster 4 (size 2) fully inside B:4 (size 3) -> grown
    assert(refine(4L) == (2L, 4L, 2L, 3L, "grown"))
    // singleton 6 absorbed into B:4 -> grown
    assert(refine(6L) == (1L, 4L, 1L, 3L, "grown"))

    val coarsen = ClusterStability.transitions(b, a)
      .collect().map(r => (r.getLong(0), r.getString(5))).toMap
    // B:1 = {1,2} strictly inside A:1 (size 3) -> grown; B:3 singleton
    // inside A:1 -> grown; B:4 = {4,5,6} scatters over A:{4,6} -> split
    assert(coarsen == Map(1L -> "grown", 3L -> "grown", 4L -> "split"))
  }

  test("argmax tie breaks to the smallest target label") {
    // source {1,2} splits evenly over targets 10 and 20
    val f = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster")
    val t = Seq((1L, 20L), (2L, 10L)).toDF("id", "cluster")
    val r = ClusterStability.transitions(f, t).collect()
    assert(r.length == 1)
    assert(r.head.getLong(2) == 10L && r.head.getString(5) == "split")
  }

  test("a clustering compared with itself is all stable, both directions") {
    val rows = ClusterStability.bidirectional(a, a).collect()
    assert(rows.length == 6) // 3 clusters x 2 directions
    assert(rows.forall(_.getString(6) == "stable"))
    assert(rows.forall(r => r.getLong(2) == r.getLong(4) &&
      r.getLong(2) == r.getLong(5)))
  }
}
