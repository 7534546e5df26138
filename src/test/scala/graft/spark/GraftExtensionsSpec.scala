package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** An extensions-only deployment (`--conf spark.sql.extensions=
  * graft.spark.GraftExtensions`, no programmatic register()) must expose
  * the COMPLETE SQL surface: aggregates AND the scalar finishers — the r1
  * gap was a session that could build sketches but not query them. */
class GraftExtensionsSpec extends AnyFunSuite with SparkSuiteBase {

  private def extensionsOnlySession(): SparkSession = {
    // a genuinely new session (shared SparkContext) built through the
    // extensions hook — getOrCreate would hand back the suite session
    val saved = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    saved.foreach(SparkSession.setActiveSession)
    saved.foreach(SparkSession.setDefaultSession)
    s
  }

  test("extensions-only session runs the flagship sketch query end to end") {
    // NB: never ext.stop() — that stops the shared SparkContext; the extra
    // sessionState just gets dropped with the suite JVM
    val ext = extensionsOnlySession()
    val df = ext.sql(
        """SELECT lang,
          |       req_count(sk) AS docs,
          |       req_quantile(sk, 0.5d) AS p50,
          |       req_quantile_lte(sk, 0.5d) AS p50_lte,
          |       kll_quantile(kk, 0.5d) AS kll_p50,
          |       cast(theta_estimate(th) AS bigint) AS distinct_sources,
          |       cast(round(hll_estimate(hh)) AS bigint) AS hll_sources
          |FROM (
          |  SELECT lang, req_sketch(n_chars) sk, kll_sketch(n_chars) kk,
          |         theta_sketch(source) th, hll_sketch(source) hh
          |  FROM parquet.`/root/testdata/sf0.001/documents.parquet`
          |  GROUP BY lang)""".stripMargin).collect()
    assert(df.length > 0)
    df.foreach { r =>
      assert(r.getLong(1) > 0)                       // req_count
      assert(!r.getDouble(2).isNaN)                  // req_quantile
      assert(r.getLong(5) > 0 && r.getLong(6) > 0)   // theta + hll finishers
    }
    // sketch-union aggregates + text kernels are injected too
    val u = ext.sql(
      """SELECT theta_estimate(theta_union(th)) e, lang_id('the quick brown fox and the dog') l
        |FROM (SELECT theta_sketch(source) th
        |      FROM parquet.`/root/testdata/sf0.001/documents.parquet`
        |      GROUP BY lang)""".stripMargin).collect().head
    assert(u.getDouble(0) > 0 && u.getString(1) == "en")
  }
}
