package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.TextOps

/** MinHash + LSH near-duplicate detection (north-rule lane 1:
  * 5-gram shingles → 128-perm MinHash → 16x8 banding → bucket candidate
  * generation → exact-Jaccard verify).
  *
  * Scale design (10^12 docs):
  *  - Signatures are NEVER shuffled: band keys are computed in the same
  *    projection as the signature, so the only wide dataset in flight is
  *    `(id, band, band_hash)` at 16 rows x ~24 bytes per doc.
  *  - Candidate pairs come from `groupBy(band, band_hash)` + per-bucket
  *    combination generation — half the shuffle volume of the equivalent
  *    band self-join, with map-side size capping.
  *  - Hot buckets (boilerplate templates, SURVEY.md §7 hard part 3) are
  *    capped at `maxBucketSize`: a bucket of a million identical pages would
  *    otherwise generate ~10^12 quadratic pairs. Docs in capped buckets are
  *    exact/near-identical template pages and are still caught by the
  *    exact-hash lane (`ExactDedup`), which is linear. Dropped-bucket counts
  *    are reported in the returned metrics.
  *  - The verify join (pairs back to texts) is the skew point — a hub doc in
  *    many pairs — handled by AQE skew-join splitting (enabled in session
  *    conf) rather than manual salting, since pair multiplicity is bounded
  *    by the bucket cap.
  *
  * The verify lane decides pairs (exact Jaccard over shingle sets), so
  * sketch-level ±eps never affects pair recall (SURVEY.md §7 hard part 2).
  */
object MinHashLSH {

  /** Candidate pairs (idA < idB) from LSH banding over `textCol`. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     maxBucketSize: Int = 1000): DataFrame = {
    graft.spark.GraftFunctions.register(docs.sparkSession)
    // id + 16 band keys per doc, signatures never materialized to a shuffle
    candidatePairsFromBands(
      docs.select(col(idCol).as("id"),
        expr(s"band_hashes(minhash128($textCol))").as("bands")),
      maxBucketSize)
  }

  /** Candidate pairs from precomputed band-key arrays `(id, bands)` (the
    * pipeline's one-pass feature projection supplies these). */
  def candidatePairsFromBands(bandArrays: DataFrame, maxBucketSize: Int): DataFrame = {
    val bands = bandArrays.select(col("id"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    // salted, size-capped bucket collection per (band, band_hash); hot
    // buckets (boilerplate) fall back to star pairs — linear, keeps the
    // bucket connected for clustering, and no aggregation buffer ever holds
    // more than maxBucketSize+1 ids (BucketedPairs)
    BucketedPairs.edges(bands, Seq("band", "bh"), "id", maxBucketSize)
      .distinct()
  }

  /** Exact shingle-Jaccard verify join: candidates back to texts; decides
    * pairs so LSH can only lose recall, never create false positives. */
  def verifyPairs(cands: DataFrame, texts0: DataFrame, idCol: String,
                  textCol: String, threshold: Double): DataFrame = {
    graft.spark.GraftFunctions.register(texts0.sparkSession)
    val texts = texts0.select(col(idCol).as("id"), col(textCol).as("t"))
    cands
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("t", "t_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("t", "t_b"), "id_b")
      .withColumn("jaccard", expr("jaccard_shingles(t_a, t_b)"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Near-dup pairs with exact shingle-Jaccard >= threshold. Returns
    * (id_a, id_b, jaccard). */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, maxBucketSize: Int = 1000): DataFrame =
    verifyPairs(candidatePairs(docs, idCol, textCol, maxBucketSize),
      docs, idCol, textCol, threshold)

  /** Brute-force oracle (tests only — O(n^2), small n). */
  def bruteForcePairs(docs: Seq[(Long, String)], threshold: Double): Set[(Long, Long)] = {
    val shingled = docs.map { case (id, t) => (id, TextOps.shingleHashes(t)) }
    (for {
      (ia, sa) <- shingled
      (ib, sb) <- shingled
      if ia < ib
      if TextOps.sortedJaccard(sa, sb) >= threshold
    } yield (ia, ib)).toSet
  }
}
