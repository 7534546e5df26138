package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact long-substring dedup lane (north rule: "a suffix-array pass for
  * exact long-substring dedup").
  *
  * Candidate generation is winnowed Karp-Rabin fingerprints (Schleimer et
  * al., SIGMOD'03): every common substring of length >= gramLen + window - 1
  * (= 47 chars, far below `minLen`) is *guaranteed* to share at least one
  * fingerprint, so the prefilter is lossless for the target span length.
  * Verification builds a generalized suffix array over each candidate pair
  * (graft.core.SuffixArray) and keeps pairs with LCS >= `minLen` chars.
  *
  * Scale shape: fingerprints are (id, fp) narrow rows — texts are never
  * shuffled for candidate generation; only the (small) verified candidate
  * set joins back to texts, and that join is the AQE-skew-handled point.
  * Hot fingerprints (boilerplate spans) are capped like hot LSH buckets;
  * whatever the cap drops is template text caught by the exact/minhash
  * lanes.
  */
object SubstringDedup {

  /** Pairs (id_a < id_b) sharing an exact substring of >= minLen chars.
    * Returns (id_a, id_b, lcs_len). */
  def pairs(docs: DataFrame, idCol: String, textCol: String, minLen: Int = 200,
            maxBucketSize: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    graft.spark.GraftFunctions.register(spark)

    val fps = docs.select(col(idCol).as("id"),
      explode(expr(s"winnow_fps($textCol)")).as("fp"))

    val buckets = fps.groupBy("fp")
      .agg(collect_set(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucketSize))

    val cands = buckets
      .select(explode(expr(
        """flatten(transform(array_sort(ids), (x, i) ->
          |  transform(slice(array_sort(ids), i + 2, size(ids)), y ->
          |    struct(x as id_a, y as id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

    val texts = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    cands
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("t", "t_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("t", "t_b"), "id_b")
      .withColumn("lcs_len", expr("sa_lcs(t_a, t_b)"))
      .filter(col("lcs_len") >= minLen)
      .select("id_a", "id_b", "lcs_len")
  }
}
