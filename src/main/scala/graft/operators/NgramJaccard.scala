package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.TextOps

/** EXACT n-gram Jaccard near-duplicate detection via AllPairs prefix
  * filtering (Bayardo, Ma, Srikant — "Scaling Up All Pairs Similarity
  * Search", WWW'07; public algorithm).
  *
  * This is the deterministic sibling of the MinHash lane: where LSH banding
  * is probabilistic (recall ~0.99 at the tuned band config), prefix
  * filtering guarantees *complete* recall at the chosen threshold — every
  * pair with token-n-gram Jaccard >= t shares at least one gram inside both
  * documents' prefixes, so the inverted-index join over prefixes alone is a
  * sound candidate generator and the exact verify decides.
  *
  * Prefix lemma: fix any global total order on grams (we use the 64-bit
  * gram hash value itself — no frequency pass, no extra shuffle). If
  * J(A,B) >= t then |A∩B| >= ceil(t*max(|A|,|B|)), and two sets with
  * overlap >= a must collide within their first |A|-a+1 / |B|-a+1 elements;
  * since ceil(t*|A|) <= ceil(t*max(|A|,|B|)), indexing the first
  * |A| - ceil(t*|A|) + 1 grams of each doc is sufficient.
  *
  * Scale design (10^12 docs):
  *  - Only prefixes are exploded: at t=0.5 that's ~half the grams of each
  *    doc, as narrow (gram_hash, id) rows — never the text.
  *  - Hot grams (boilerplate) go through the same salted, size-capped
  *    bucket collection as every other lane ([[BucketedPairs]]); a gram
  *    hotter than `maxPostings` falls back to star edges, which trades the
  *    completeness guarantee on *that gram only* for linear cost.
  *  - `dfOrdered = true` adds the standard df-ordered-prefix pass: one
  *    narrow (gram, df) aggregation finds exactly the grams whose postings
  *    would cap, and the global gram order becomes hot-LAST (non-hot by
  *    hash, then hot by hash). The prefix lemma holds under ANY consistent
  *    total order, and with hot grams last the lemma's witness (the
  *    smallest shared gram) is non-hot whenever the pair shares any
  *    non-hot gram — so capping can only drop pairs whose overlap is
  *    entirely boilerplate. The hot set is bounded by
  *    totalGramOccurrences / maxPostings (small by construction), so it
  *    broadcasts.
  *  - The verify join ships each candidate pair's two texts once; pair
  *    multiplicity is bounded by the bucket cap, AQE handles residual skew.
  */
object NgramJaccard {

  /** Grams whose document frequency exceeds `maxPostings` — exactly the
    * set whose postings buckets would cap. One narrow (gram, df) aggregate
    * over distinct per-doc grams; the result is bounded by
    * totalGramOccurrences / maxPostings, so collecting it is the
    * model-not-data kind of driver collect. Returned sorted for binary
    * search. */
  def hotGrams(docs: DataFrame, textCol: String, n: Int,
               minDf: Int): Array[Long] = {
    val gramsUdf = udf((t: String) => TextOps.shingleHashes(t, n))
    docs.select(explode(gramsUdf(col(textCol))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") > minDf)
      .select("gram").collect().map(_.getLong(0)).sorted
  }

  /** Candidate pairs (id_a < id_b) from the prefix-filter inverted index.
    * Superset of all pairs with n-gram Jaccard >= threshold (exact while no
    * gram exceeds `maxPostings`; with `dfOrdered` also exact for every
    * pair sharing at least one non-hot gram).
    *
    * `prefixHotDf > 0` generalizes the hot-LAST order to a LOWER df bar
    * than the capping one: grams with df > prefixHotDf sort behind the
    * rare grams, so prefixes prefer rare grams and candidate buckets on
    * df-skewed corpora shrink toward the true pair count. The prefix
    * lemma holds under ANY consistent total order, and as long as
    * prefixHotDf < maxPostings no hot-gram bucket can cap, so the
    * candidate set stays COMPLETE and the verified output is unchanged
    * (NgramJaccardSpec pins equality). The hot set is bounded by
    * totalGramOccurrences / prefixHotDf — size it so that stays
    * broadcastable. NOTE (r6 measurement): on the bench corpus the knob is
    * a no-op — candidate volume there comes from ~19k df∈[8,16] grams
    * (max df < 32), which no order can prune at t=0.5 — so the declared
    * queries leave it off; it exists for genuinely df-skewed corpora. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     n: Int, threshold: Double,
                     maxPostings: Int = 10000,
                     dfOrdered: Boolean = false,
                     prefixHotDf: Int = 0): DataFrame = {
    require(n >= 1 && threshold > 0.0 && threshold <= 1.0,
      s"bad config n=$n t=$threshold")
    require(prefixHotDf <= maxPostings,
      s"prefixHotDf=$prefixHotDf above the posting cap $maxPostings would let hot buckets cap")
    val hot: Array[Long] =
      if (prefixHotDf > 0) hotGrams(docs, textCol, n, prefixHotDf)
      else if (dfOrdered) hotGrams(docs, textCol, n, maxPostings)
      else Array.emptyLongArray
    val bcHot = docs.sparkSession.sparkContext.broadcast(hot)
    val prefix = udf { (t: String) =>
      val g = TextOps.shingleHashes(t, n) // sorted ascending = global order
      val keep0 = g.length - math.ceil(threshold * g.length).toInt + 1
      val keep = math.max(0, math.min(keep0, g.length))
      val hotArr = bcHot.value
      if (hotArr.length == 0) g.take(keep)
      else {
        // hot-LAST total order: non-hot grams (hash asc), then hot grams
        // (hash asc); g is already sorted, so two stable passes preserve
        // the within-class order
        val out = new Array[Long](g.length)
        var w = 0
        var i = 0
        while (i < g.length) {
          if (java.util.Arrays.binarySearch(hotArr, g(i)) < 0) { out(w) = g(i); w += 1 }
          i += 1
        }
        i = 0
        while (i < g.length && w < g.length) {
          if (java.util.Arrays.binarySearch(hotArr, g(i)) >= 0) { out(w) = g(i); w += 1 }
          i += 1
        }
        java.util.Arrays.copyOf(out, keep)
      }
    }
    val postings = docs.select(col(idCol).as("id"),
      explode(prefix(col(textCol))).as("gram"))
    BucketedPairs.edges(postings, Seq("gram"), "id", maxPostings).distinct()
  }

  /** Per-task memoized [[overlapStats]] UDF for the verify joins: the
    * verify kernel's cost is the re-tokenization of both texts per pair
    * (~2×25 µs vs ~0.5 µs for the hash merge), and candidate rows arrive
    * grouped in runs of the last join key (sort-merge/hash join), so each
    * side's text repeats ~bucket-multiplicity times consecutively
    * (measured 568k candidates over 5k docs at t=0.5 — ~200 repeats/doc).
    * One last-text memo per join side per executor thread skips the
    * repeat shingling; values are a pure function of the inputs, so
    * results are bit-identical. */
  private def memoStatsUdf(n: Int) = {
    val f = new ((String, String) => (Int, Int, Int)) with Serializable {
      @transient private lazy val memoA = new ThreadLocal[(String, Array[Long])]
      @transient private lazy val memoB = new ThreadLocal[(String, Array[Long])]
      private def hashes(memo: ThreadLocal[(String, Array[Long])],
                         t: String): Array[Long] = {
        val m = memo.get()
        if (m != null && ((m._1 eq t) || m._1 == t)) m._2
        else { val h = TextOps.shingleHashes(t, n); memo.set((t, h)); h }
      }
      override def apply(a: String, b: String): (Int, Int, Int) = {
        val sa = hashes(memoA, a)
        val sb = hashes(memoB, b)
        var i = 0; var j = 0; var inter = 0
        while (i < sa.length && j < sb.length) {
          if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
          else if (sa(i) < sb(j)) i += 1
          else j += 1
        }
        (inter, sa.length, sb.length)
      }
    }
    udf(f)
  }

  /** (intersection, |A|, |B|) over the two docs' distinct n-gram-hash sets
    * — integer outputs so the DuckDB oracle compares exactly, no float
    * round-trip. */
  def overlapStats(a: String, b: String, n: Int): (Int, Int, Int) = {
    val sa = TextOps.shingleHashes(a, n)
    val sb = TextOps.shingleHashes(b, n)
    var i = 0; var j = 0; var inter = 0
    while (i < sa.length && j < sb.length) {
      if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
      else if (sa(i) < sb(j)) i += 1
      else j += 1
    }
    (inter, sa.length, sb.length)
  }

  /** Exact n-gram Jaccard pairs: prefix-filter candidates + exact verify.
    * Returns (id_a, id_b, common_grams, grams_a, grams_b) with
    * common/(a+b-common) >= threshold — all-integer output. */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            n: Int = 3, threshold: Double = 0.5,
            maxPostings: Int = 10000,
            dfOrdered: Boolean = false,
            prefixHotDf: Int = 0): DataFrame = {
    val stats = memoStatsUdf(n)
    val texts = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    candidatePairs(docs, idCol, textCol, n, threshold, maxPostings, dfOrdered,
        prefixHotDf)
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("t", "t_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("t", "t_b"), "id_b")
      .withColumn("st", stats(col("t_a"), col("t_b")))
      .select(col("id_a"), col("id_b"),
        col("st._1").as("common_grams"),
        col("st._2").as("grams_a"),
        col("st._3").as("grams_b"))
      .filter(col("common_grams").cast("double") /
        (col("grams_a") + col("grams_b") - col("common_grams")) >= threshold)
  }

  /** EXACT n-gram CONTAINMENT pairs — the asymmetric sibling of [[pairs]]:
    * C(A,B) = |A∩B| / |A| >= tNum/tDen means A's grams are (nearly) a
    * subset of B's. This is the "page B = page A + boilerplate" shape that
    * symmetric Jaccard structurally misses: J(A,B) = |A∩B|/|A∪B| shrinks
    * as B grows, C(A,B) doesn't.
    *
    * Prefix lemma, containment form: C(A,B) >= t ⟹ |A∩B| >= ceil(t·|A|),
    * so A collides with B inside A's first |A| − ceil(t·|A|) + 1 grams
    * (pigeonhole on A's sorted gram list). The CONTAINEE side therefore
    * indexes only its prefix — but the container side has no lower bound
    * on |A∩B|/|B|, so it must index every gram. Realized as ONE posting
    * per (doc, gram) carrying an in-prefix flag, encoded into the posting
    * id's low bit so the salted/capped [[BucketedPairs]] machinery is
    * reused verbatim; a bucket pair decodes to the candidate direction(s)
    * whose member was a prefix posting. Threshold is a rational tNum/tDen
    * and the verify compares tDen·|A∩B| >= tNum·|A| — all-integer,
    * oracle-exact.
    *
    * Returns (id_a, id_b, common_grams, grams_a, grams_b, a_in_b, b_in_a)
    * with id_a < id_b, keeping rows where either direction holds. Ids must
    * fit 62 bits (checked per row) — the flag bit steals one. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, tNum: Int = 4, tDen: Int = 5,
                       maxPostings: Int = 10000): DataFrame = {
    require(n >= 1 && tNum >= 1 && tDen >= tNum,
      s"bad config n=$n t=$tNum/$tDen")
    val flagged = udf { (t: String) =>
      val g = TextOps.shingleHashes(t, n) // sorted ascending = global order
      val need = (tNum.toLong * g.length + tDen - 1) / tDen // ceil(t*|A|)
      val keep = math.max(0L, g.length - need + 1L)
      g.zipWithIndex.map { case (h, i) => (h, i < keep) }
    }
    val maxId = (1L << 61) - 1
    val postings = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .withColumn("id", when(col("id").between(0L, maxId), col("id"))
        .otherwise(expr(s"raise_error('containmentPairs: id out of [0, 2^61)')")))
      .select(col("id"), explode(flagged(col("t"))).as("g"))
      .select((col("id") * 2L + when(col("g._2"), 1L).otherwise(0L)).as("eid"),
        col("g._1").as("gram"))
    val cand = BucketedPairs.edges(postings, Seq("gram"), "eid", maxPostings)
      // bit ops, not `/`: Column `/` is floating division and a 62-bit id
      // would lose low bits through the double round trip
      .select(shiftright(col("id_a"), 1).as("ida"),
        (col("id_a").bitwiseAND(1L) === 1L).as("fa"),
        shiftright(col("id_b"), 1).as("idb"),
        (col("id_b").bitwiseAND(1L) === 1L).as("fb"))
      .filter(col("ida") =!= col("idb")) // same doc's prefix/full postings
      .filter(col("fa") || col("fb"))    // some side must be a prefix hit
      .select(least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"))
      .distinct()
    val stats = memoStatsUdf(n)
    val texts = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
    cand
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("t", "t_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("t", "t_b"), "id_b")
      .withColumn("st", stats(col("t_a"), col("t_b")))
      .select(col("id_a"), col("id_b"),
        col("st._1").as("common_grams"),
        col("st._2").as("grams_a"),
        col("st._3").as("grams_b"))
      .withColumn("a_in_b", col("grams_a") > 0 &&
        lit(tDen) * col("common_grams") >= lit(tNum) * col("grams_a"))
      .withColumn("b_in_a", col("grams_b") > 0 &&
        lit(tDen) * col("common_grams") >= lit(tNum) * col("grams_b"))
      .filter(col("a_in_b") || col("b_in_a"))
  }

  /** Brute-force containment oracle (tests only — O(n^2), small n). */
  /** Per-doc top-k most-similar OTHER docs by exact n-gram Jaccard with a
    * completeness floor — the dedup REVIEW QUEUE face: "what would this
    * doc collide with, ranked", the corpus-ops surface the pair lanes
    * don't expose directly.
    *
    * Semantics (all-integer, oracle-exact): a neighbor qualifies iff
    * 10·|A∩B| >= t10·|A∪B| (Jaccard >= t10/10 decided in integers, never
    * floats); its score is the fixed point |A∩B| · 10^9 div |A∪B|; each
    * doc keeps its k best by (score desc, neighbor asc). Candidates come
    * from the prefix filter run at a strictly LOWER float threshold
    * (t10/10 − 0.01), so the integer gate — not IEEE rounding at the
    * boundary — decides membership, and the candidate set is complete
    * above the floor below the posting cap.
    *
    * Scale shape: one extra narrow (doc, neighbor, score) projection per
    * verified pair (each pair serves both endpoints' queues), then a
    * bounded MinNPair aggregate — <= 2k longs per doc under
    * ObjectHashAggregate, never a ranking window. The floor is the volume
    * knob: lower floors grow prefixes (~(1−t)·|A| postings/doc), which is
    * the documented prefix-filter trade. */
  def topKSimilar(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, k: Int = 3, t10: Int = 3,
                  maxPostings: Int = 10000,
                  prefixHotDf: Int = 0): DataFrame = {
    require(k >= 1 && t10 >= 1 && t10 <= 10, s"bad config k=$k t10=$t10")
    // materialized: `p` feeds BOTH direction projections of the union
    // below — without this the whole candidate+verify pass (the expensive
    // part of the query) runs twice (localCheckpoint-rebuild pattern;
    // blocks freed by the ContextCleaner)
    val p = org.apache.spark.sql.GraftBridge.materialize(
      pairs(docs, idCol, textCol, n, t10 / 10.0 - 0.01, maxPostings,
          dfOrdered = false, prefixHotDf = prefixHotDf)
        .filter(expr(s"common_grams * 10 >= $t10 * (grams_a + grams_b - common_grams)"))
        .withColumn("score", expr(
          "CAST(common_grams AS BIGINT) * 1000000000L div " +
            "(grams_a + grams_b - common_grams)")))
    val dir = p.select(col("id_a").cast("long").as("doc_id"),
        col("id_b").cast("long").as("neighbor_id"), col("score"))
      .unionByName(p.select(col("id_b").cast("long").as("doc_id"),
        col("id_a").cast("long").as("neighbor_id"), col("score")))
    val minN = udaf(new SearchIndex.MinNKeepPairsAgg(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
    dir
      .groupBy("doc_id")
      .agg(minN((-col("score")).cast("long"), col("neighbor_id")).as("_pairs"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(_pairs) div 2 - 1)," +
          " i -> struct(-_pairs[2*i] AS score, _pairs[2*i+1] AS neighbor_id))")).as("h"))
      .select(col("doc_id"), col("h.neighbor_id").as("neighbor_id"),
        col("h.score").as("score"))
  }

  def bruteForceContainment(docs: Seq[(Long, String)], n: Int,
                            tNum: Int, tDen: Int): Set[(Long, Long, Boolean, Boolean)] = {
    (for {
      (ia, ta) <- docs
      (ib, tb) <- docs
      if ia < ib
      st = overlapStats(ta, tb, n)
      ainb = st._2 > 0 && tDen.toLong * st._1 >= tNum.toLong * st._2
      bina = st._3 > 0 && tDen.toLong * st._1 >= tNum.toLong * st._3
      if ainb || bina
    } yield (ia, ib, ainb, bina)).toSet
  }

  /** Brute-force oracle (tests only — O(n^2), small n). */
  def bruteForcePairs(docs: Seq[(Long, String)], n: Int,
                      threshold: Double): Set[(Long, Long)] = {
    (for {
      (ia, ta) <- docs
      (ib, tb) <- docs
      if ia < ib
      st = overlapStats(ta, tb, n)
      if st._2 + st._3 > 0 &&
        st._1.toDouble / (st._2 + st._3 - st._1) >= threshold
    } yield (ia, ib)).toSet
  }
}
