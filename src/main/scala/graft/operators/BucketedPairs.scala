package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import graft.spark.{CappedIdsAgg, CappedIdsMergeAgg}

/** Candidate-edge generation from LSH-style bucket membership, skew-safe at
  * web scale (the "salted band-hash keys" collection the north rule names).
  *
  * Input: one row per bucket membership `(key..., id)` — rows must be
  * unique per (key, id). Output: undirected candidate edges `(id_a < id_b)`:
  *
  *   - small buckets (n <= cap): all C(n,2) pairs (complete — downstream
  *     verify decides),
  *   - hot buckets  (n  > cap): star edges to the bucket's minimum id. A
  *     10^6-member boilerplate bucket emits 10^6 - 1 edges instead of
  *     ~5*10^11; the hub keeps the bucket connected for clustering, and
  *     every emitted edge still passes the lane's verify step.
  *
  * Memory/skew structure (vs a plain `groupBy(key).agg(collect_list)`,
  * which materializes the whole bucket in one buffer before any cap):
  *
  *   1. ids are first aggregated per `(key, salt)` where
  *      `salt = xxhash64(id) % saltBuckets` — a hot bucket's collection
  *      fans out over `saltBuckets` tasks instead of one;
  *   2. both phases use `CappedIdsAgg`: NO aggregation buffer (map-side
  *      partial or reduce-side final) ever holds more than cap+1 ids —
  *      overflowing buckets keep only (count, min);
  *   3. hot buckets are never collected at all: their members are recovered
  *      by joining the (tiny) hot-key list back to the membership rows —
  *      AQE plans that join as broadcast when the hot-key list is small.
  */
object BucketedPairs {

  private def cappedIds(c: Column, cap: Int): Column =
    GraftBridge.column(CappedIdsAgg(GraftBridge.expression(c), cap).toAggregateExpression())
  private def cappedIdsMerge(c: Column, cap: Int): Column =
    GraftBridge.column(CappedIdsMergeAgg(GraftBridge.expression(c), cap).toAggregateExpression())

  /** Candidate edges (id_a < id_b), NOT deduplicated across keys — callers
    * `.distinct()` after unioning bands/probes. */
  def edges(members: DataFrame, keyCols: Seq[String], idCol: String, cap: Int,
            saltBuckets: Int = 16): DataFrame = {
    require(cap >= 2, s"cap must be >= 2, got $cap")
    val spark = members.sparkSession
    PairGen.register(spark)
    val keys = keyCols.map(col)
    val id = col(idCol)

    // phase 1: salted slices — a hot bucket's members spread over
    // saltBuckets reduce tasks, each slice buffer capped at cap+1 ids
    val slices =
      if (saltBuckets <= 1)
        members.groupBy(keys: _*).agg(cappedIds(id, cap).as("s"))
      else
        members
          .groupBy(keys :+ pmod(xxhash64(id), lit(saltBuckets.toLong)).as("_salt"): _*)
          .agg(cappedIds(id, cap).as("s"))
          .groupBy(keys: _*)
          .agg(cappedIdsMerge(col("s"), cap).as("s"))

    val buckets = slices.filter(col("s.n") >= 2)

    // small buckets: complete member list survived the cap -> all pairs
    val smallPairs = buckets
      .filter(col("s.ids").isNotNull)
      .select(explode(expr(s"pair_combos(s.ids, $cap)")).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))

    // hot buckets: (key, hub) only; members recovered from the membership
    // rows by key — no buffer ever held them
    val hotKeys = buckets
      .filter(col("s.ids").isNull)
      .select(keys :+ col("s.hub").as("_hub"): _*)
    val starPairs = members
      .join(hotKeys, keyCols)
      .filter(id =!= col("_hub"))
      .select(col("_hub").as("id_a"), id.as("id_b"))

    smallPairs.unionByName(starPairs)
  }
}
