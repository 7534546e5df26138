package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HostRank

/** Integer PageRank: the DataFrame iterate vs an independent in-test
  * sequential implementation of the same integer recurrence, partitioning
  * invariance (integer sums are order-free), and structural sanity. */
class HostRankSpec extends AnyFunSuite with SparkSuiteBase {
  import spark.implicits._

  /** Sequential reference of the exact recurrence in HostRank's doc. */
  private def seqRank(edges: Seq[(String, String)], iters: Int,
                      scale: Long = 1000000000000L): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val r0 = scale / nodes.size
    val base = (15L * r0) / 100L
    var r = nodes.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = nodes.map(n => n -> (base + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private val graph: Seq[(String, String)] = (0 until 40).flatMap { i =>
    Seq((s"h${i % 13}", s"h${(i * 7) % 13}"), (s"h${i % 13}", s"h${(i * 5 + 3) % 17}"))
  }.filter { case (a, b) => a != b }

  test("DataFrame iterate == sequential integer recurrence") {
    val truth = seqRank(graph, iters = 4)
    val got = HostRank.run(graph.toDF("src", "dst"), "src", "dst", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == truth)
  }

  test("byte-identical under partitioning (integer sums are order-free)") {
    val df1 = HostRank.run(graph.toDF("src", "dst").repartition(1), "src", "dst", 3)
    val df8 = HostRank.run(graph.toDF("src", "dst").repartition(8), "src", "dst", 3)
    val a = df1.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val b = df8.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("star graph: the hub out-ranks every spoke; dangling-safe") {
    // spokes -> hub only; the hub has NO outlinks (dangling) and every
    // spoke has no inlinks — exercises both left-join branches
    val star = (1 to 9).map(i => (s"s$i", "hub"))
    val ranks = HostRank.run(star.toDF("src", "dst"), "src", "dst", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks.size == 10)
    val spoke = ranks("s1")
    assert((2 to 9).forall(i => ranks(s"s$i") == spoke), "symmetric spokes must tie")
    assert(ranks("hub") > spoke)
    assert(ranks == seqRank(star, 2))
  }

  test("oracle SQL text unrolls the requested iteration count") {
    val sql = HostRank.oracleSql("WITH edges AS (SELECT 'a' src, 'b' dst)", 4)
    assert((1 to 4).forall(k => sql.contains(s"r$k AS")))
    assert(sql.contains("FROM r4 ORDER BY host"))
    assert(!sql.contains("r5"))
  }
}
