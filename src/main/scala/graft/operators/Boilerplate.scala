package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-host boilerplate removal — the template-stripping stage of web
  * corpus curation (CCNet arXiv:1911.00359 drops paragraphs duplicated
  * across a shard; RefinedWeb arXiv:2306.01116 §3 strips line-level
  * template content): a chunk that recurs on >= `minDf` documents of the
  * SAME host is template (nav, footer, cookie banner), not content.
  *
  * Chunking is CONTENT-DEFINED ([[DocChunker.cdcChunks]]), which is what
  * makes host-level detection work at all: a footer sits at a different
  * token offset in every page, so fixed windows never line up across
  * documents, but CDC cut points inside the footer depend only on the
  * footer's own tokens — every page of the host produces byte-identical
  * interior footer chunks.
  *
  * Scale shape: chunking is map-only; the template table is a narrow
  * (host, chunk_hash) count over pre-distinct'd (host, hash, id) rows
  * (map-side combine, no Expand); the flag joins back on the same narrow
  * key; reassembly is a per-document bounded aggregate (a document fits
  * in one buffer by definition — same bound as every text kernel). Host
  * is the natural partition key: template detection never crosses hosts,
  * so a 10^12-page corpus shards cleanly and hot hosts are just big
  * groups on a narrow key.
  */
object Boilerplate {

  /** (id, host, n_chunks, n_boiler, clean_text): chunk counts and the
    * document's text with host-template chunks removed (kept chunks
    * re-joined in chunk order, single-space separated — same join rule as
    * the chunker's tokenization, so clean output of a clean doc equals
    * its tokenized text). */
  def strip(docs: DataFrame, idCol: String, hostCol: String, textCol: String,
            windowTokens: Int = 4, divisor: Int = 16, minDf: Int = 3): DataFrame = {
    require(minDf >= 2, s"bad minDf $minDf")
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(hostCol).as("host"), col(textCol).as("text"))
    val ch = DocChunker.cdcChunks(base, "id", "text", windowTokens, divisor)
      .select(col("id"), col("chunk_idx"), col("chunk_text"),
        md5(col("chunk_text")).as("h"))
      .join(base.select("id", "host"), "id")
    // document frequency per (host, chunk): explicit pre-distinct instead
    // of countDistinct — no Expand in the plan, partials combine map-side
    val dfc = ch.select("host", "h", "id").distinct()
      .groupBy("host", "h").agg(count(lit(1)).as("df"))
    ch.join(dfc, Seq("host", "h"))
      .withColumn("boiler", col("df") >= minDf)
      .groupBy("id")
      .agg(first("host").as("host"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boiler"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN NOT boiler THEN" +
            " struct(chunk_idx, chunk_text) END)), s -> s.chunk_text)"), " ")
          .as("clean_text"))
      .select("id", "host", "n_chunks", "n_boiler", "clean_text")
  }
}
