package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * r3 postmortem: the driver's verify subprocess was cut off mid-loop and —
  * because the loop iterated an UNORDERED Map — the surviving rows were an
  * arbitrary hash-order subset (14 of 40, including heavy queries but
  * missing sub-second ones). r4 hardening:
  *  - deterministic CHEAPEST-FIRST order (hard-coded tier list from the
  *    measured per-query costs, heavy pipeline queries last) so a cut-off
  *    run still attests the maximum query count;
  *  - a GLOBAL wall budget (SPARK_GRAFT_VERIFY_BUDGET_SEC, default 1200):
  *    once exceeded, remaining queries are skipped loudly — a `.SKIPPED`
  *    marker file per query instead of a silent missing row;
  *  - verify gets the whole box by default (availableProcessors, was 4 —
  *    the bench always had 32; if the driver budget binds, parallelism is
  *    the cheapest lever).
  */
object Verify {

  /** Cheapest-first execution order, from the measured warm sf0.1 medians
    * (BENCH_r03). Two constraints override raw cost: `q_pages_pipeline`
    * must precede `q_pages_recall` (the recall gate resumes the committed
    * pipeline run from the shared workDir — see SparkEntry), and the five
    * heaviest queries go last so a budget cut loses the fewest rows.
    * Queries not listed (future additions) run between the cheap tier and
    * the heavy tier, ordered by name. */
  private val cheapFirst: Seq[String] = Seq(
    "q_media_features", "q_repetition", "q_lang_id", "q_mojibake_fix",
    "q_script_profile", "q_robots_gate", "q_quality",
    "q_fingerprint", "q_frame_sample", "q_extract_text", "q_theta_distinct",
    "q4_topk", "q_req_stats", "q_token_count", "q_hll_distinct",
    "q_theta_jaccard", "q_embed_quantize", "q_corpus_report", "q6_rollup",
    "q_url_normalize", "q_pii_redact", "q_outlinks", "q_head_meta",
    "q_canonical_dedup", "q_host_graph",
    "q_gopher_filter", "q_admission",
    "q_warc_roundtrip", "q_search_conjunctive", "q_search_ranked",
    "q_phrase_search", "q_boilerplate_strip", "q_global_shuffle",
    "q_table_compact", "q_table_upsert", "q_vocab_encode", "q_corpus_mix",
    "q_paragraph_dedup",
    "q_cooccur", "q_anchor_text", "q_classifier_margin", "q_snapshot_diff",
    "q_sessionize", "q_attribution",
    "q_sample_stratified", "q_pack_sequences", "q_decontaminate",
    "q_media_resize", "q_cluster_survivors", "q_domain_cap", "q_domain_best",
    "q_chunk_docs",
    "q_cdc_chunks", "q_cdc_dedup",
    "q_bpe_tokens", "q_sample_bottomk", "q_cms_tokens", "q_lm_score",
    "q_lm_trigram",
    "q_host_rank",
    "q_incremental_dedup", "q_req_quantiles", "q_kll_quantiles",
    "q_embed_neardup", "q1_agg", "q_freq_tokens", "q2_join_agg",
    "q_exact_dedup", "q_ann_topk", "q_exact_dup_pairs", "q_theta_set_ops",
    "q_exact_survivors", "q5_setops", "q_incremental_bloom", "q3_window",
    "q_training_prep", "q_substring_dedup", "q_simhash_complete",
    "q_ann_ivf", "q_incremental_bloom_sharded", "q_semantic_dedup",
    "q_containment")
  private val heavyLast: Seq[String] = Seq(
    "q_simhash_neardup", "q_pages_pipeline", "q_pages_recall",
    "q_minhash_neardup", "q_ngram_jaccard", "q_ngram_jaccard_df",
    "q_cc_clusters", "q_embed_neardup_lsh")

  private[graft] def orderedQueryNames(all: Iterable[String]): Seq[String] = {
    val known = (cheapFirst ++ heavyLast).toSet
    val unknown = all.toSeq.filterNot(known).sorted
    (cheapFirst ++ unknown ++ heavyLast).filter(all.toSet)
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter, for cheap
    // single-query rehearsals while iterating (the driver passes 2 args)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // shuffle scratch on tmpfs: shuffle index commits serialize on a
      // JVM-global lock around small-file IO; the sandbox ext4 makes that
      // lock hot enough to flatline multi-core scaling (thread dumps showed
      // executors blocked in IndexShuffleBlockResolver). A real cluster
      // would use local NVMe.
      .config("spark.local.dir", graft.spark.Scratch.localDir)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", graft.spark.Scratch.fairPoolsXml)
      .config("spark.file.transferTo", "false")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.spark.Scratch.warmBlockManager(spark)
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // written BEFORE the query loop: if a query wedges the session, the
    // driver still gets the oracle map + every completed dump
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Per-query watchdog: one wedged Spark job (e.g. the rare local-mode
    // BlockManagerMaster lazy-endpoint RPC stall observed in rehearsal,
    // Spark-internal) must not zero the whole round's correctness. Each
    // query runs under a job group; on timeout the group is cancelled and
    // the loop moves on.
    // 300 s default: the slowest query measures ~15 s at the driver's SF
    // with whole-box cores, so 300 s only fires on a genuine wedge — and
    // a single wedge must not eat most of the global budget (900 s would)
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "300").toLong
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_BUDGET_SEC", "1200").toLong
    import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
    val pool = Executors.newCachedThreadPool()
    val t0 = System.nanoTime()
    def elapsedSec: Long = (System.nanoTime() - t0) / 1000000000L
    val names = orderedQueryNames(SparkEntry.queries.keys)
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val remaining = budgetSec - elapsedSec
      if (remaining <= 0) {
        // loud, attributable skip — never a silently missing row
        System.err.println(s"[verify] $name SKIPPED: global budget ${budgetSec}s exhausted")
        Files.writeString(Paths.get(s"$outDir/$name.SKIPPED"),
          s"global verify budget ${budgetSec}s exhausted after ${elapsedSec}s\n")
      } else {
        val tq = System.nanoTime()
        val task = pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            spark.sparkContext.setJobGroup(s"verify-$name", name,
              interruptOnCancel = true)
            try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            finally spark.sparkContext.clearJobGroup()
          }
        })
        try {
          task.get(math.min(timeoutSec, remaining), TimeUnit.SECONDS)
          System.err.println(f"[verify] $name ok in ${(System.nanoTime() - tq) / 1e9}%.1fs")
        } catch {
          case _: TimeoutException =>
            System.err.println(s"[verify] $name TIMED OUT — cancelling")
            spark.sparkContext.cancelJobGroup(s"verify-$name")
            task.cancel(true)
          case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
        } finally {
          // queries may persist() intermediates consumed by several plan
          // branches (q_cluster_stability); drop them between queries so
          // cache never accumulates across the 95-query sweep
          spark.catalog.clearCache()
        }
      }
    }
    pool.shutdownNow()
    spark.stop()
    // a cancelled-but-wedged job can leave non-daemon threads behind; the
    // dumps and oracle json are on disk, so a hard exit is safe and keeps
    // the driver's subprocess from hanging on JVM teardown
    sys.exit(0)
  }
}
