package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * - `bruteForceTopK` — exact cosine top-k: broadcast the (small) query set
  *   against the corpus; one corpus scan, no shuffle of vectors, map-side
  *   scoring with codegen'd higher-order functions (`zip_with`/`aggregate`
  *   — no UDF in the hot path), then a per-query top-k window over only the
  *   scored (query_id, neighbor_id, cos) narrow rows.
  * - `lshBucketedTopK` — the scale path: random-hyperplane (sign) LSH
  *   buckets the corpus once; each query probes buckets within Hamming
  *   distance `probeDist` of its own signature (multi-probe), restricting
  *   scoring to a small candidate slice. Recall tunable via bits/probeDist.
  */
object AnnSearch {

  /** Codegen'd sequential dot product (deterministic summation order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector.
    * @param corpus  (idCol, vecCol) — the full embedding table
    * @param queries (idCol, vecCol) — small query set (broadcast)
    * @return (query_id, neighbor_id, cos, rnk) with rnk in 1..k */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv").cast("array<double>"), col("cv").cast("array<double>")))
      .select("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** All pairs with cosine >= threshold (embedding near-dup lane). Brute
    * O(n^2) within blocks: LSH-bucket first, verify within buckets. */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, planes: Int = 12, probeDist: Int = 2,
                   seed: Long = 0x9E377L): DataFrame = {
    val spark = corpus.sparkSession
    registerVectorFns(spark, planes, seed)
    val sigs = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("sig", expr("rh_signature(v)"))
    // multi-probe: each vector also lands in all buckets within Hamming
    // distance probeDist of its signature (pigeonhole-free, recall-oriented)
    graft.operators.PairGen.register(spark)
    val probed = sigs.withColumn("probe", explode(expr(s"hamming_ball(sig, $probeDist)")))
    val buckets = probed.groupBy("probe")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
    val cands = buckets
      .select(explode(expr(s"pair_combos(ids, ${Int.MaxValue})")).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
    // join vectors back only for the (small) candidate set
    val vecs = sigs.select(col("id"), col("v"))
    cands
      .join(vecs.withColumnRenamed("id", "id_a").withColumnRenamed("v", "va"), "id_a")
      .join(vecs.withColumnRenamed("id", "id_b").withColumnRenamed("v", "vb"), "id_b")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Deterministic random hyperplanes for sign-LSH; registered as UDFs. */
  private def registerVectorFns(spark: org.apache.spark.sql.SparkSession,
                                planes: Int, seed: Long): Unit = {
    import graft.core.SplitMix64
    spark.udf.register("rh_signature", (v: Seq[Double]) => {
      var sig = 0
      var p = 0
      while (p < planes) {
        var acc = 0.0
        var i = 0
        while (i < v.length) {
          // deterministic pseudo-gaussian-ish plane coefficient in [-1, 1)
          val h = SplitMix64.mix(seed ^ (p * 0x9E3779B97F4A7C15L) ^ (i * 0xC2B2AE3D27D4EB4FL))
          acc += v(i) * (h.toDouble / Long.MaxValue.toDouble)
          i += 1
        }
        if (acc >= 0) sig |= (1 << p)
        p += 1
      }
      sig
    })
    spark.udf.register("hamming_ball", (sig: Int, dist: Int) => {
      // all signatures within Hamming distance `dist` of sig (planes bits)
      val out = scala.collection.mutable.ArrayBuffer[Int](sig)
      if (dist >= 1) (0 until planes).foreach(i => out += (sig ^ (1 << i)))
      if (dist >= 2)
        for (i <- 0 until planes; j <- (i + 1) until planes) out += (sig ^ (1 << i) ^ (1 << j))
      out.toArray
    })
  }
}
