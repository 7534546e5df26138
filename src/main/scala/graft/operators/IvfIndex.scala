package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest-neighbor index: a deterministic
  * k-means coarse quantizer partitions the corpus into `k` cells; a query
  * probes only its `nProbe` nearest cells. This is the centroid-partitioned
  * scale path next to `AnnSearch.nearDupPairs`' sign-LSH one: at 10^12
  * vectors the corpus is scanned ONCE for cell assignment (map-only against
  * broadcast centroids — `cell` is the natural bucketing/partition key for
  * the stored table), and each query touches ~nProbe/k of the data through
  * an equi-join on the cell id — no brute-force scan.
  *
  * Everything is deterministic (hash-seeded init, fixed Lloyd rounds) so
  * results are reproducible across runs and parallelism — the same
  * discipline as the sketch/LSH lanes. (Float-sum reduction order in the
  * centroid means can differ in final ulps across partitionings; only
  * vectors exactly on a cell boundary could flip, so consumers assert
  * recall with margin, not exact cell ids.)
  */
object IvfIndex {

  /** Index of the centroid with the highest cosine to `v`. */
  private[graft] def nearestCell(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestCos = -2.0
    var c = 0
    while (c < cents.length) {
      val cos = AnnSearch.cosineKernel(v, cents(c))
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    best
  }

  /** Indices of the `n` highest-cosine centroids (descending). */
  private[graft] def nearestCells(v: Array[Double], cents: Array[Array[Double]],
                                      n: Int): Array[Int] =
    cents.indices
      .map(c => (AnnSearch.cosineKernel(v, cents(c)), c))
      .sortBy { case (cos, c) => (-cos, c) }
      .take(math.min(n, cents.length))
      .map(_._2)
      .toArray

  /** Fit the coarse quantizer. Returns centroids as a driver-side model
    * (k x dim doubles — tiny; this is the one legitimate driver-side
    * collect: the fitted MODEL, never the data).
    *
    * Deterministic: init picks the k vectors with the smallest
    * `xxhash64(id)` (a seeded uniform sample, stable under partitioning);
    * then `iters` fixed Lloyd rounds, each a single distributed pass —
    * assignment is a compiled UDF over broadcast centroids; the new means
    * reduce per (cell, dimension) after posexplode, k*dim rows back to the
    * driver per round. Cells that lose all members keep their previous
    * centroid. */
  def fitCentroids(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                   iters: Int = 5): Array[Array[Double]] = {
    require(k > 0 && iters >= 0)
    val spark = corpus.sparkSession
    // cached for the duration of the fit: init + every Lloyd round scans it
    val vecs = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")).persist()
    try {
      var cents: Array[Array[Double]] = vecs
        .orderBy(xxhash64(col("id")), col("id"))
        .limit(k)
        .collect()
        .map(_.getSeq[Double](1).toArray)
      var it = 0
      while (it < iters) {
        val bc = spark.sparkContext.broadcast(cents)
        val cellUdf = udf((v: Array[Double]) => nearestCell(v, bc.value))
        val rows = vecs
          .withColumn("cell", cellUdf(col("v")))
          .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cell", "pos").agg(avg("x").as("m"))
          .collect()
        val next = cents.map(_.clone())
        rows.foreach { r =>
          val cell = r.getInt(0)
          val pos = r.getInt(1)
          // IVF is a fixed-dimension structure; a mixed-dim corpus must
          // fail loudly here, not with an index crash mid-update
          require(pos < next(cell).length,
            s"corpus vector has dimension > ${next(cell).length} (quantizer dim): " +
              "IvfIndex requires a fixed-dimension embedding column")
          next(cell)(pos) = r.getDouble(2)
        }
        cents = next
        bc.destroy()
        it += 1
      }
      cents
    } finally vecs.unpersist(false)
  }

  /** Cell assignment for the corpus: (idCol, vecCol columns preserved) +
    * `cell`. At scale this is what you bucket/partition the stored index
    * table by. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             centroids: Array[Array[Double]]): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    val cellUdf = udf((v: Array[Double]) => nearestCell(v, bc.value))
    corpus.withColumn("cell", cellUdf(col(vecCol).cast("array<double>")))
  }

  /** Fingerprint the stored-index commit carries (quantizer config + dim):
    * a consumer resuming against the stored table can tell whether it was
    * built by the quantizer it expects. */
  private def indexFingerprint(k: Int, iters: Int, dim: Int): String =
    s"ivf-v1|k=$k|iters=$iters|dim=$dim"

  /** Fit + PERSIST the index through `io` (the 10^12-vector path): the
    * assigned corpus is written partitioned by `cell` — the probe join's
    * pruning key — and the k x dim centroid model as a sibling
    * `<table>_centroids` table, both committed under the quantizer
    * fingerprint. Search then runs from the stored table via
    * [[topKStored]] without ever re-running assignment. Returns the
    * fitted centroids. */
  def buildStored(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                  io: graft.pipeline.TableIO, table: String,
                  iters: Int = 5): Array[Array[Double]] = {
    val cents = fitCentroids(corpus, idCol, vecCol, k, iters)
    val fp = indexFingerprint(k, iters, cents.head.length)
    val assigned = assign(
      corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv")),
      "neighbor_id", "cv", cents)
    io.overwrite(table, assigned, partitionBy = Seq("cell"))
    io.commit(table, fp)
    val spark = corpus.sparkSession
    import spark.implicits._
    io.overwrite(s"${table}_centroids",
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "centroid"))
    io.commit(s"${table}_centroids", fp)
    cents
  }

  /** Reload the centroid model of a stored index (k x dim — tiny). */
  def loadCentroids(io: graft.pipeline.TableIO, table: String): Array[Array[Double]] =
    io.read(s"${table}_centroids").orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)

  /** Top-k search against a STORED index. Probe cells are computed on the
    * driver from the small-by-contract query set, so the index scan
    * carries a STATIC `cell IN (...)` predicate — parquet partition
    * pruning drops unprobed cells at file listing and the scan reads
    * ~nProbe/k of the corpus (plan-asserted in IvfIndexSpec). Assignment
    * work is never repeated per query, unlike [[topK]], which assigns the
    * in-memory corpus on every call. */
  def topKStored(io: graft.pipeline.TableIO, table: String, queries: DataFrame,
                 idCol: String, vecCol: String, kNeighbors: Int,
                 centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qRows = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val probeRows = qRows.toSeq.flatMap { case (qid, qv) =>
      nearestCells(qv, centroids, nProbe).map(c => (qid, qv.toSeq, c))
    }
    val probedCells = probeRows.map(_._3).distinct
    val q = broadcast(probeRows.toDF("query_id", "qv", "cell"))
    val cells = io.read(table).filter(col("cell").isin(probedCells: _*))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cells.join(q, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", AnnSearch.cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "cos")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kNeighbors)
  }

  /** Approximate top-k neighbors for each query vector.
    * @return (query_id, neighbor_id, cos, rnk) with rnk in 1..kNeighbors —
    *         same shape as `AnnSearch.bruteForceTopK`, so recall is a
    *         direct set comparison. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           kNeighbors: Int, centroids: Array[Array[Double]],
           nProbe: Int): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)
    val probesUdf = udf((v: Array[Double]) => nearestCells(v, bc.value, nProbe))

    // one assignment implementation: the stored-index path and the search
    // path must agree on the cell function
    val cells = assign(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv")),
      "neighbor_id", "cv", centroids)
    // queries are small by contract: broadcast (query, probed cell) rows so
    // the corpus-side join is map-only against its cell partitioning
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cell", explode(probesUdf(col("qv")))))

    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cells.join(q, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", AnnSearch.cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "cos")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kNeighbors)
  }
}
