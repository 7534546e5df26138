package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list via iterative
  * min-label propagation DataFrame self-joins (the north rule's
  * "connected-components clustering via iterative DataFrame self-joins").
  * Converges in O(cluster diameter) rounds — dedup edge sets are near-clique
  * per duplicate group, so diameter is tiny (1-3); for general graphs with
  * long chains swap in the large-star/small-star rewrite (Kiveris et al.,
  * SOCC'14), which this structure accommodates.
  *
  * Each iteration is two narrow (id, label) shuffles; convergence is
  * detected by an aggregate checksum instead of a full diff (one cheap
  * action per round). `localCheckpoint` truncates lineage so plans stay
  * O(1) per iteration instead of growing exponentially — on a real cluster
  * with a checkpoint dir, swap for `checkpoint()` (reliable) to also get
  * executor-failure resilience.
  */
object ConnectedComponents {

  /** @param edges DataFrame with two long columns (src, dst)
    * @return (id, component) — component = min id reachable */
  def run(edges: DataFrame, srcCol: String = "id_a", dstCol: String = "id_b",
          maxIterations: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // undirected symmetric closure; self-loops dropped, narrow (long, long)
    val e0 = edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter($"u" =!= $"v")
    var labels = e0.select($"u".as("id"), $"v".as("nbr"))
      .union(e0.select($"v".as("id"), $"u".as("nbr")))
      .groupBy("id").agg(least(min("nbr"), first("id")).as("label"))
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // propagate: label(id) <- min(label(id), min over neighbors of label(nbr))
      val viaEdges = e0
        .join(labels.withColumnRenamed("id", "u").withColumnRenamed("label", "lu"), "u")
        .join(labels.withColumnRenamed("id", "v").withColumnRenamed("label", "lv"), "v")
      val candidates = viaEdges.select($"u".as("id"), least($"lu", $"lv").as("cand"))
        .union(viaEdges.select($"v".as("id"), least($"lu", $"lv").as("cand")))
      val next = labels.join(candidates.groupBy("id").agg(min("cand").as("cand")), Seq("id"), "left")
        .select($"id", least($"label", coalesce($"cand", $"label")).as("label"),
          ($"cand" < $"label").cast("int").as("changed"))
        .localCheckpoint(true)

      // labels only decrease; fixpoint when no row improved this round.
      // (count of changed rows — overflow-free, one action per iteration)
      val changed = next.agg(coalesce(sum($"changed"), lit(0L))).first().getLong(0)
      converged = changed == 0L
      labels = next.select("id", "label")
      iter += 1
    }
    labels.withColumnRenamed("label", "component")
  }

  /** Convenience: cluster assignment including singleton docs.
    * @return (id, component) for every id in `allIds` */
  def clustersWithSingletons(allIds: DataFrame, idCol: String, edges: DataFrame,
                             srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    val comps = run(edges, srcCol, dstCol)
    allIds.select(col(idCol).cast("long").as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }
}
