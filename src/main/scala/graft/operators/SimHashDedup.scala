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

    val hashed = docs.select(col(idCol).as("id"), expr(s"simhash64($textCol)").as("sim"))

    val probes = hashed.select(col("id"), col("sim"),
      explode(expr(s"simhash_probes(sim, $maxDist)")).as("probe"))

    // members sorted by id (array_sort on struct orders by first field);
    // hot buckets (boilerplate — near-identical simhashes) emit star pairs
    val buckets = probes
      .groupBy("probe")
      .agg(collect_list(struct(col("id"), col("sim"))).as("members"))
      .filter(size(col("members")) >= 2)

    buckets
      .select(explode(expr(s"pair_combos_sim(members, $maxBucketSize)")).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.sim_a"), col("p.sim_b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxDist && col("id_a") =!= col("id_b"))
      .select("id_a", "id_b", "hamming")
      .distinct()
  }
}
