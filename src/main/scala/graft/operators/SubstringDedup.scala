package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact long-substring dedup lane (north rule: "a suffix-array pass for
  * exact long-substring dedup").
  *
  * Candidate generation is winnowed Karp-Rabin fingerprints (Schleimer et
  * al., SIGMOD'03): every common substring of length >= gramLen + window - 1
  * (= 175 chars at the defaults, below `minLen` = 200) is *guaranteed* to
  * share at least one selected fingerprint, so the prefilter is lossless for
  * the target span length while emitting only ~n/64 fingerprints per doc.
  * Verification is an exact Rabin-Karp threshold decision per pair.
  *
  * Scale shape: fingerprints are (id, fp) narrow rows — texts are never
  * shuffled for candidate generation; only the (small) verified candidate
  * set joins back to texts, and that join is the AQE-skew-handled point.
  * Hot fingerprints (boilerplate spans) are capped like hot LSH buckets;
  * whatever the cap drops is template text caught by the exact/minhash
  * lanes.
  */
object SubstringDedup {

  /** Pairs (id_a < id_b) sharing an exact substring of >= minLen chars. */
  /** Winnowing params behind the `winnow_fps` UDF (TextOps defaults); the
    * prefilter is lossless only for spans >= gramLen + window - 1. */
  private val GramLen = 48
  private val Window = 128
  val LosslessMinLen: Int = GramLen + Window - 1

  def pairs(docs: DataFrame, idCol: String, textCol: String, minLen: Int = 200,
            maxBucketSize: Int = 1000): DataFrame = {
    graft.spark.GraftFunctions.register(docs.sparkSession)
    pairsFromFingerprints(
      docs.select(col(idCol).as("id"), expr(s"winnow_fps($textCol)").as("fps")),
      docs, idCol, textCol, minLen, maxBucketSize)
  }

  // ------------------------------------------------------------------
  // Incremental probe tier: new batch vs a STORED fingerprint index
  // ------------------------------------------------------------------

  /** Stored winnowed-fingerprint index: `(id, fp)` — ~n/64 narrow rows per
    * doc. The substring twin of `MinHashLSH.bandIndex` /
    * `SimHashDedup.probeIndex`: persist once (TableIO, partitioned or
    * bucketed by fp), probe each batch against it, append the admitted
    * batch's rows — corpus text is only read for verify candidates. */
  def fpIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.spark.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol).cast("long").as("id"), expr(s"winnow_fps($textCol)").as("fps"))
      .select(col("id"), explode(col("fps")).as("fp"))
  }

  /** Incremental pairs `(new_id, corpus_id)` of a batch against a stored
    * [[fpIndex]]: batch docs sharing an exact substring of >= minLen chars
    * with a corpus doc. Same touched-bucket semi-join pruning + shared
    * salted capped collection + hub degradation as the other two
    * incremental tiers; the winnowing guarantee (every common span >=
    * [[LosslessMinLen]] shares a selected fingerprint) makes the prefilter
    * lossless below the cap, and the Rabin-Karp verify is exact. */
  def incrementalPairs(index: DataFrame, corpusTexts: DataFrame,
                       incoming: DataFrame, idCol: String, textCol: String,
                       minLen: Int = 200, maxPostings: Int = 1000): DataFrame = {
    require(minLen >= LosslessMinLen,
      s"minLen=$minLen below the winnowing guarantee ($LosslessMinLen)")
    graft.spark.GraftFunctions.register(incoming.sparkSession)
    BucketedPairs.probeCandidates(index,
        fpIndex(incoming, idCol, textCol).withColumnRenamed("id", "new_id"),
        Seq("fp"), "id", "new_id", maxPostings)
      .join(corpusTexts.select(col(idCol).cast("long").as("corpus_id"),
        col(textCol).as("t_c")), "corpus_id")
      .join(incoming.select(col(idCol).cast("long").as("new_id"),
        col(textCol).as("t_n")), "new_id")
      .filter(expr(s"common_substring_atleast(t_n, t_c, $minLen)"))
      .select("new_id", "corpus_id")
  }

  /** Pairs from precomputed winnowed-fingerprint arrays `(id, fps)` plus a
    * texts frame for the exact verify join (the pipeline's one-pass
    * feature projection supplies the fingerprints). */
  def pairsFromFingerprints(fpArrays: DataFrame, texts1: DataFrame, idCol: String,
                            textCol: String, minLen: Int,
                            maxBucketSize: Int): DataFrame = {
    val texts0 = texts1.select(col(idCol).as("id"), col(textCol).as("t"))
    require(minLen >= LosslessMinLen,
      s"minLen=$minLen below the winnowing guarantee ($LosslessMinLen = " +
        s"gramLen $GramLen + window $Window - 1): the prefilter would silently lose recall")
    // idempotent: standalone callers need the verify kernel registered
    graft.spark.GraftFunctions.register(fpArrays.sparkSession)

    val fps = fpArrays.select(col("id"), explode(col("fps")).as("fp"))

    // salted, size-capped bucket collection per fingerprint (winnowed fps
    // are already distinct per doc, so (fp, id) rows are unique); hot
    // fingerprints (boilerplate spans) emit star pairs (BucketedPairs)
    val cands = BucketedPairs.edges(fps, Seq("fp"), "id", maxBucketSize)
      .distinct()

    // verify: exact Rabin-Karp decision at the threshold, O(|a|+|b|) per
    // pair (the O(n log^2 n) suffix-array LCS stays available as sa_lcs for
    // exact-length queries; the lane only needs the boolean)
    val texts = texts0
    cands
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("t", "t_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("t", "t_b"), "id_b")
      .filter(expr(s"common_substring_atleast(t_a, t_b, $minLen)"))
      .select("id_a", "id_b")
  }
}
