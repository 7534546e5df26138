package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic weighted corpus mixing — the data-mixing step of a
  * pre-training run ("2 epochs of curated web + 1 epoch of the rest",
  * GPT-3 arXiv:2005.14165 §2.2 Table 2.2 describes exactly this
  * weighted-sampling shape): each source contributes `weight` integer
  * epochs of its rows, every (source, epoch, id) copy draws its mix key
  * from md5 of that triple, and positions come from the same two-phase
  * scan as [[GlobalShuffle]] — a contiguous, engine-reproducible global
  * interleave in which each source's copies land uniformly (so any
  * training window sees the sources in weight proportion, in
  * expectation, with no RNG and no state).
  *
  * Scale shape: epoch replication is a map-only generator (no data is
  * copied until the write); the only shuffle is the position scan's
  * range partition. Fractional weights compose with
  * [[StratifiedSample]] (rate-sample a source, then weight-1 mix it).
  */
object CorpusMix {

  /** `sources` = (name, rows, weight ≥ 1); all frames must share the id
    * column. Output: (source, epoch, <idCol>, pos) with pos contiguous
    * 0..Σ(weight·rows)-1 in (md5(mixkey), mixkey) order. */
  def mix(sources: Seq[(String, DataFrame, Int)], idCol: String): DataFrame = {
    require(sources.nonEmpty, "mix needs at least one source")
    require(sources.map(_._1).distinct.size == sources.size, "duplicate source names")
    sources.foreach { case (n, _, w) => require(w >= 1, s"bad weight $w for $n") }
    val tagged = sources.map { case (name, df, w) =>
      df.select(col(idCol).cast("long").as(idCol))
        .withColumn("source", lit(name))
        .withColumn("epoch", explode(sequence(lit(0), lit(w - 1))))
    }.reduce(_ unionByName _)
    val keyed = tagged.withColumn("_mixid",
      concat_ws(":", col("source"), col("epoch"), col(idCol)))
    GlobalShuffle.withPositions(keyed, "_mixid")
      .select(col("source"), col("epoch"), col(idCol), col("pos"))
  }
}
