package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-assignment drift metrics between two clusterings of the same
  * document universe — the data-quality monitor for a dedup corpus whose
  * cluster table evolves (incremental folds via
  * [[ConnectedComponents.incrementalAssign]], threshold retunes, kernel
  * upgrades). A silent mass-merge (threshold too loose → training data
  * over-pruned) or mass-split (index corruption → dup leakage) shows up
  * here as a step change in the `grown`/`split` row counts long before a
  * downstream eval would catch it.
  *
  * Scale design (10^12 docs): the member join is `(id, label)` × 2 — the
  * narrowest possible corpus-wide rows; the (from, to) overlap table is a
  * map-side-combinable groupBy whose cardinality is bounded by the number
  * of cluster fragments, not members; the per-source argmax is a
  * `min(struct)` aggregate (never a corpus-wide window); sizes join on
  * label keys (cluster-count cardinality). Nothing in the plan holds a
  * cluster's member list in one buffer.
  */
object ClusterStability {

  /** Per-source-cluster transition report from clustering `from` to
    * clustering `to`: both are `(idCol, clusterCol)` assignments over the
    * same id universe (labels need not be related across the two).
    *
    * One row per source cluster:
    *  - `best_to`: the target cluster with the largest member overlap
    *    (ties broken to the smallest target label — deterministic),
    *  - `overlap`, `size_from`, `size_to`: exact member counts,
    *  - `status`: `stable` (identical member sets), `grown` (source fully
    *    contained in a strictly larger target — a merge event), `split`
    *    (source members scattered over more than one target).
    */
  def transitions(from: DataFrame, to: DataFrame, idCol: String = "id",
                  clusterCol: String = "cluster"): DataFrame = {
    val f = from.select(col(idCol).cast("long").as("id"),
      col(clusterCol).cast("long").as("cf"))
    val t = to.select(col(idCol).cast("long").as("id"),
      col(clusterCol).cast("long").as("ct"))
    val overlap = f.join(t, "id")
      .groupBy("cf", "ct").agg(count(lit(1)).as("ov"))
    val best = overlap.groupBy("cf")
      .agg(min(struct((-col("ov")).as("no"), col("ct").as("ct"))).as("b"))
      .select(col("cf"), col("b.ct").as("best_to"), (-col("b.no")).as("overlap"))
    val sizeFrom = f.groupBy("cf").agg(count(lit(1)).as("size_from"))
    val sizeTo = t.groupBy("ct").agg(count(lit(1)).as("size_to"))
      .withColumnRenamed("ct", "best_to")
    best.join(sizeFrom, "cf").join(sizeTo, "best_to")
      .select(col("cf").as("cluster_from"), col("size_from"),
        col("best_to"), col("overlap"), col("size_to"),
        when(col("overlap") === col("size_from") &&
             col("size_to") === col("size_from"), "stable")
          .when(col("overlap") === col("size_from"), "grown")
          .otherwise("split").as("status"))
  }

  /** Both directions at once — `refine` (from → to) and `coarsen`
    * (to → from) — so merges surface as `grown` rows in one direction and
    * `split` rows in the other; a clustering compared with itself is all
    * `stable` in both. */
  def bidirectional(a: DataFrame, b: DataFrame, idCol: String = "id",
                    clusterCol: String = "cluster"): DataFrame =
    transitions(a, b, idCol, clusterCol)
      .withColumn("direction", lit("refine"))
      .unionByName(transitions(b, a, idCol, clusterCol)
        .withColumn("direction", lit("coarsen")))
      .select("direction", "cluster_from", "size_from", "best_to",
        "overlap", "size_to", "status")
}
