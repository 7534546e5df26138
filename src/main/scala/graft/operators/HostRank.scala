package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-graph PageRank as iterative DataFrame self-joins — the link-quality
  * signal a web-scale training-data pipeline weights documents by (e.g.
  * host-rank-bucketed sampling à la C4/CCNet quality tiers), and the same
  * iterative-join pattern the north star names for clustering.
  *
  * ALL-INTEGER arithmetic: ranks are carried as int64 fixed-point at
  * `scale`. Integer sums are order-free and integer division is identical
  * on every engine, so the fixpoint iterate is byte-identical under any
  * partitioning, any merge order, and across Spark/DuckDB — which makes a
  * 4-iteration run exactly SQL-oracle-checkable (q_host_rank unrolls the
  * same iterate as chained CTEs). Float PageRank would differ at the ulp
  * per aggregation order and be un-hashable across engines.
  *
  * The iterate (damping d = 85/100, N = |nodes appearing in edges|):
  *   r0        = scale div N
  *   base      = (15 * r0) div 100
  *   r_{k+1}(v)= base + (85 * sum_{u->v} (r_k(u) div outdeg(u))) div 100
  * Dangling mass (nodes with no outlinks) is dropped, the common
  * simplification — mirrored exactly in the oracle.
  *
  * Scale shape (10^8-host graph from a 10^12-doc crawl):
  *  - `edges` is distinct (src,dst) — narrow string pairs; outdeg is one
  *    groupBy over it, computed once.
  *  - Each iteration is one shuffle-on-src join (rank × edges) + one
  *    shuffle-on-dst sum. In production the edge table is bucketed by src
  *    so the join side of every iteration is exchange-free; ranks (the
  *    small, changing side) alone shuffle per round.
  *  - `localCheckpoint` truncates lineage each round: without it,
  *    iteration k replans/re-executes all k-1 predecessors and the plan
  *    tree grows exponentially in optimizer time.
  *  - The only driver-side values are scalar counts (N), never rows.
  */
object HostRank {

  /** Rebuild-from-RDD materialization (NOT bare `localCheckpoint`): in an
    * iterative loop Spark 4's LogicalRDD propagates originStats and
    * planning cost blows up round over round — same pattern as
    * `ConnectedComponents.materialize`. */
  private def materialize(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.localCheckpoint(true).rdd, df.schema)

  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = materialize(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val nodes = materialize(
      e.select(col("src").as("host")).union(e.select(col("dst").as("host"))).distinct())
    val n = nodes.count()
    require(n > 0, "empty graph")
    val r0 = scale / n
    val base = (15L * r0) / 100L
    val outdeg = materialize(e.groupBy("src").agg(count(lit(1)).as("deg")))
    var ranks = nodes.withColumn("rank", lit(r0))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.join(outdeg, col("host") === col("src")).select(
          col("host").as("u"), expr("rank div deg").as("c")),
          col("src") === col("u"))
        .groupBy(col("dst").as("host")).agg(sum("c").as("s"))
      ranks = materialize(nodes
        .join(contrib, Seq("host"), "left")
        .select(col("host"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank")))
    }
    ranks
  }

  /** The same iterate as DuckDB SQL: `edgesCte` must OPEN the WITH block
    * and define `edges(src, dst)` already distinct — e.g.
    * `WITH edges AS (SELECT DISTINCT ...)`. Chained CTEs r1..rK unroll the
    * loop — integer-exact, so the driver hash compare is strict equality.
    * Every sum is cast back to BIGINT (DuckDB widens sum(BIGINT) to
    * HUGEINT, which would change the compared schema). */
  def oracleSql(edgesCte: String, iters: Int, scale: Long = 1000000000000L): String = {
    val pre =
      s"""$edgesCte,
         |nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
         |consts AS (SELECT ($scale // count(*)) AS r0,
         |                  (15 * ($scale // count(*))) // 100 AS base FROM nodes),
         |outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |r0 AS (SELECT host, (SELECT r0 FROM consts) AS rank FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.host,
         |         CAST((SELECT base FROM consts)
         |           + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS host, CAST(sum(r.rank // d.deg) AS BIGINT) AS s
         |    FROM edges e
         |    JOIN r${k - 1} r ON r.host = e.src
         |    JOIN outdeg d ON d.src = e.src
         |    GROUP BY e.dst) s ON s.host = n.host)""".stripMargin
    }
    (pre +: rounds).mkString(",\n") +
      s"\nSELECT host, rank FROM r$iters ORDER BY host"
  }
}
