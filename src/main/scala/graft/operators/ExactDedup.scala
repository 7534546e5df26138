package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact deduplication by content hash — the linear lane that also covers
  * whatever the LSH lane's hot-bucket cap drops (template/boilerplate
  * clusters). `xxhash64` is Spark-codegen'd; grouping on the 8-byte hash
  * instead of the full text keeps shuffle rows narrow, and the full text is
  * only compared within a hash bucket (collision safety) when `paranoid`.
  */
object ExactDedup {

  /** One row per duplicate cluster: canonical id (min), cluster size. */
  def clusters(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(col(textCol).as("t"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("cluster_size"))
      .filter(col("cluster_size") > 1)
      .select("canonical_id", "cluster_size")

  /** All duplicate pairs (a<b) with identical text. Narrow shuffle: rows are
    * (hash, id); texts never shuffle. */
  def pairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.operators.PairGen.register(docs.sparkSession)
    val hashed = docs.select(xxhash64(col(textCol)).as("h"), col(idCol).as("id"))
    val grouped = hashed.groupBy("h").agg(collect_list("id").as("ids"))
      .filter(size(col("ids")) > 1)
    // full C(n,2) semantics (no star cap): this operator's contract is the
    // complete duplicate-pair list, SQL-oracle-checked
    grouped
      .select(explode(expr(s"pair_combos(ids, ${Int.MaxValue})")).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
  }

  /** Star edges (hub = min id per duplicate group) — the clustering lane's
    * edge generator. Web corpora have 10^5..10^6-way exact-dup groups
    * (empty pages, soft-404 boilerplate); connected components only needs
    * the group connected, so one hub-star per group emits O(group) edges
    * where `pairs` would emit O(group^2). Fully distributed: a narrow
    * (hash -> hub) aggregate joined back to the (hash, id) rows — no
    * aggregation buffer ever holds a group's member list. */
  def starEdges(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    starEdgesFromHashes(
      docs.select(xxhash64(col(textCol)).as("h"), col(idCol).as("id")), "h", "id")

  /** Star edges over precomputed content hashes (the pipeline's one-pass
    * feature projection supplies these — the corpus text is not rescanned). */
  def starEdgesFromHashes(hashed0: DataFrame, hashCol: String, idCol: String): DataFrame = {
    val hashed = hashed0.select(col(hashCol).as("h"), col(idCol).as("id"))
    val hubs = hashed.groupBy("h")
      .agg(min(col("id")).as("hub"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select("h", "hub")
    hashed.join(hubs, "h")
      .filter(col("id") =!= col("hub"))
      .select(col("hub").as("id_a"), col("id").as("id_b"))
  }

  /** Survivors: keep the minimum id per distinct text (the keep-one-copy
    * dedup a training-data pipeline applies before tokenization). Narrow:
    * only (hash, id) rows reach the survivor-selection shuffle; the full
    * documents join back LEFT SEMI against the small survivor-id set (a
    * window over the text-hash partitioning would shuffle every full row
    * instead). */
  def survivors(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = docs
      .select(xxhash64(col(textCol)).as("h"), col(idCol).as("_sid"))
      .groupBy("h").agg(min("_sid").as("_sid"))
      .select("_sid")
    docs.join(keep, docs(idCol) === keep("_sid"), "left_semi")
  }
}
