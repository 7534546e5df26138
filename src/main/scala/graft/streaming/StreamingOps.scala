package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.TextOps

/** Structured Streaming surface of the engine (SURVEY.md §2.3 Streaming):
  * the same mergeable-sketch aggregates run under streaming group-bys —
  * sketch `update`/`merge` is exactly the semantics a streaming state store
  * needs — plus stateful streaming near-dup candidate generation.
  */
object StreamingOps {

  /** Event-time-windowed REQ doc-length quantile sketches with watermarking:
    * one serialized sketch column per (window, group). Late data beyond
    * `watermarkDelay` is dropped by Spark; the sketch column can be stored
    * and re-merged later with `req_merge` (cross-window rollups). */
  def windowedReqSketch(events: DataFrame, tsCol: String, valueCol: String,
                        groupCol: String, windowDuration: String,
                        watermarkDelay: String): DataFrame = {
    graft.spark.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(groupCol))
      .agg(expr(s"req_sketch($valueCol)").as("len_sketch"),
           count(lit(1)).as("n"))
  }

  /** Streaming exact dedup: keep the first occurrence of each content hash.
    * State is the 8-byte hash only (dropDuplicates state store). NOTE:
    * `dropDuplicates` on the hash alone keeps one state row per distinct
    * hash FOREVER (Spark only ages dedup state out when the event-time
    * column is part of the key subset) — this unbounded variant matches the
    * batch lane exactly but is for bounded replays. For infinite streams
    * use `streamingExactDedupWithinWatermark`, which bounds state to the
    * watermark horizon (duplicates farther apart than the horizon are then
    * NOT collapsed — the standard streaming trade). */
  def streamingExactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("_h", xxhash64(col(textCol))).dropDuplicates("_h").drop("_h")

  /** Watermark-bounded streaming exact dedup: the caller sets
    * `withWatermark` upstream; state for a hash is dropped once it falls
    * beyond the lateness horizon. */
  def streamingExactDedupWithinWatermark(docs: DataFrame, idCol: String,
                                         textCol: String): DataFrame =
    docs.withColumn("_h", xxhash64(col(textCol)))
      .dropDuplicatesWithinWatermark("_h").drop("_h")

  /** Per-bucket streaming state for LSH candidate generation: ids already
    * seen in this band bucket (capped, like the batch hot-bucket cap).
    * `hub` is the minimum id ever seen — arrivals after the cap still pair
    * with it (star edges), mirroring the batch hot-bucket fallback. */
  case class BucketState(ids: List[Long], hub: Long)
  case class BandedDoc(bucket: Long, id: Long)
  case class CandPair(id_a: Long, id_b: Long)

  /** Stateful streaming MinHash-LSH candidate pairs: every incoming doc is
    * exploded to its 16 band keys upstream; this operator keeps the set of
    * doc ids per live bucket (`flatMapGroupsWithState`, update mode) and
    * emits (new doc x stored docs) candidate pairs incrementally — the
    * streaming twin of the batch `MinHashLSH.candidatePairs` bucket join.
    * Downstream, pairs are verified against a (static or stored) text table
    * exactly like the batch lane. */
  def streamingCandidatePairs(banded: Dataset[BandedDoc],
                              maxBucketSize: Int = 1000): Dataset[CandPair] = {
    import banded.sparkSession.implicits._
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: Long, rows: Iterator[BandedDoc], state: GroupState[BucketState]) => {
          val st = state.getOption.getOrElse(BucketState(Nil, Long.MaxValue))
          val out = scala.collection.mutable.ArrayBuffer[CandPair]()
          var cur = st.ids
          var n = cur.length
          var hub = st.hub
          rows.foreach { r =>
            if (n < maxBucketSize) {
              if (!cur.contains(r.id)) {
                cur.foreach { old =>
                  out += CandPair(math.min(old, r.id), math.max(old, r.id))
                }
                cur = r.id :: cur
                n += 1
                if (r.id < hub) hub = r.id
              }
            } else if (r.id != hub) {
              // over-cap arrival: STAR edge to the bucket's minimum id —
              // the doc stays connected for clustering with O(1) state,
              // exactly the batch hot-bucket fallback (PairGen star)
              out += CandPair(math.min(hub, r.id), math.max(hub, r.id))
            }
          }
          state.update(BucketState(cur, hub))
          out.iterator
        })
  }

  /** Convenience: text docs -> exploded band keys (for feeding
    * `streamingCandidatePairs`). Runs the full shingle->minhash->band chain
    * map-side; only (bucket, id) narrow rows reach the stateful shuffle. */
  def bandDocs(docs: DataFrame, idCol: String, textCol: String): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        TextOps.bandHashes(TextOps.minHash(t)).map(b => BandedDoc(b, id))
      }
  }

  /** Embedding near-dup streaming twin: vectors -> auto-tuned sign-LSH band
    * keys (same `AnnSearch.tune` math as the batch lane), feeding
    * `streamingCandidatePairs`; candidates are verified downstream with the
    * compiled cosine kernel against a static/stored vector table. */
  def bandVecs(vecs: DataFrame, idCol: String, vecCol: String, threshold: Double,
               targetRecall: Double = 0.95, maxTables: Int = 128,
               seed: Long = 0x9E377L): Dataset[BandedDoc] = {
    import vecs.sparkSession.implicits._
    val (rowsPerBand, tables) = graft.operators.AnnSearch.tune(threshold, targetRecall, maxTables)
    vecs.select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        graft.operators.AnnSearch.bandKeys(v, tables, rowsPerBand, seed)
          .map(k => BandedDoc(k, id))
      }
  }
}
