package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-dup lane (north rule lane 2): 64-bit token-weighted
  * SimHash, candidate generation by Hamming-ball block probing, verified by
  * `bit_count(a ^ b) <= maxDist` (Spark's codegen'd `bit_count` — the
  * "built-in suffices" mapping of SURVEY.md §2.3 scalar functions).
  *
  * Probing uses the pigeonhole block scheme: the 64-bit hash is split into
  * `maxDist + 1` blocks, so any pair within Hamming distance `maxDist`
  * agrees exactly on >= 1 block. Join key is (block idx, block value) — the
  * same narrow-row groupBy-bucket pattern as the MinHash lane, no
  * signatures in flight.
  */
object SimHashDedup {

  /** Pairs (id_a < id_b) with Hamming distance <= maxDist. Includes the
    * simhashes and distance. */
  def pairs(docs: DataFrame, idCol: String, textCol: String, maxDist: Int = 3,
            maxBucketSize: Int = 128): DataFrame = {
    val spark = docs.sparkSession
    graft.spark.GraftFunctions.register(spark)

    // materialized once (16 bytes/doc): consumed by probe generation, by
    // BucketedPairs' monster branch (this lane's 16-bit probe blocks DO
    // produce over-cap buckets on real corpora), and by both verify joins —
    // without this, the simhash kernel re-runs over the full corpus in
    // every consumer
    val hashed = org.apache.spark.sql.GraftBridge.materialize(
      docs.select(col(idCol).as("id"), expr(s"simhash64($textCol)").as("sim")))
    pairsFromHashes(hashed, maxDist, maxBucketSize)
  }

  /** Pairs from precomputed `(id, sim)` rows (the pipeline's one-pass
    * feature projection supplies these, already persisted — no text
    * rescan, no extra materialization). */
  def pairsFromHashes(hashed: DataFrame, maxDist: Int, maxBucketSize: Int): DataFrame = {
    graft.spark.GraftFunctions.register(hashed.sparkSession)
    val probes = hashed.select(col("id"),
      explode(expr(s"simhash_probes(sim, $maxDist)")).as("probe"))

    // salted, size-capped bucket collection per probe key; hot buckets
    // (boilerplate — near-identical simhashes) emit star pairs
    // (BucketedPairs). The verify join pulls the two 8-byte simhashes back
    // in for the candidate set only — narrow rows, AQE-skew-handled.
    val cands = BucketedPairs.edges(probes, Seq("probe"), "id", maxBucketSize)
      .distinct()
    cands
      .join(hashed.select(col("id").as("id_a"), col("sim").as("sim_a")), "id_a")
      .join(hashed.select(col("id").as("id_b"), col("sim").as("sim_b")), "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }
}
