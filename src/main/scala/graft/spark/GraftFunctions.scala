package graft.spark

import graft.core._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.DoubleType

/** Registration surface for all graft sketch/text functions.
  *
  * - Aggregates are native Catalyst `TypedImperativeAggregate`s registered in
  *   the session FunctionRegistry (usable from SQL and `expr(...)`).
  * - Scalar finishers / text kernels are Scala UDFs over the shared
  *   `graft.core` kernels (one deserialization per call — they run once per
  *   group/row at the end of a plan, never in the aggregation hot path).
  *
  * Production entry point: `spark.withExtensions(new GraftExtensions)` or
  * `GraftFunctions.register(spark)` after session creation.
  */
object GraftFunctions {

  /** Column-API helpers (typed alternative to expr("req_sketch(x)")). */
  def req_sketch(col: Column, k: Int = ReqSketch.DefaultK, hra: Boolean = true): Column =
    GraftBridge.column(ReqSketchAgg(Cast(GraftBridge.expression(col), DoubleType), k, hra)
      .toAggregateExpression())
  def req_merge(col: Column): Column =
    GraftBridge.column(ReqMergeAgg(GraftBridge.expression(col)).toAggregateExpression())
  def theta_sketch(col: Column, nominalEntries: Int = ThetaSketch.DefaultNominalEntries): Column =
    GraftBridge.column(ThetaSketchAgg(GraftBridge.expression(col), nominalEntries)
      .toAggregateExpression())
  def theta_union(col: Column): Column =
    GraftBridge.column(ThetaUnionAgg(GraftBridge.expression(col)).toAggregateExpression())
  def hll_sketch(col: Column, lgK: Int = HllSketch.DefaultLgK): Column =
    GraftBridge.column(HllSketchAgg(GraftBridge.expression(col), lgK).toAggregateExpression())
  def hll_union(col: Column): Column =
    GraftBridge.column(HllUnionAgg(GraftBridge.expression(col)).toAggregateExpression())

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }
  private def boolLit(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(s"$what must be a boolean literal, got $other")
  }

  /** Register everything on the given session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry

    reg.createOrReplaceTempFunction("req_sketch", {
      case Seq(c)        => ReqSketchAgg(Cast(c, DoubleType)).toAggregateExpression()
      case Seq(c, k)     => ReqSketchAgg(Cast(c, DoubleType), intLit(k, "k")).toAggregateExpression()
      case Seq(c, k, h)  => ReqSketchAgg(Cast(c, DoubleType), intLit(k, "k"), boolLit(h, "hra")).toAggregateExpression()
      case args => throw new IllegalArgumentException(s"req_sketch expects 1-3 args, got ${args.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("req_merge", {
      case Seq(c) => ReqMergeAgg(c).toAggregateExpression()
      case args => throw new IllegalArgumentException(s"req_merge expects 1 arg, got ${args.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("kll_sketch", {
      case Seq(c)    => KllSketchAgg(Cast(c, DoubleType)).toAggregateExpression()
      case Seq(c, k) => KllSketchAgg(Cast(c, DoubleType), intLit(k, "k")).toAggregateExpression()
      case args => throw new IllegalArgumentException(s"kll_sketch expects 1-2 args, got ${args.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("theta_sketch", {
      case Seq(c)    => ThetaSketchAgg(c).toAggregateExpression()
      case Seq(c, k) => ThetaSketchAgg(c, intLit(k, "nominalEntries")).toAggregateExpression()
      case args => throw new IllegalArgumentException(s"theta_sketch expects 1-2 args, got ${args.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("theta_union", {
      case Seq(c) => ThetaUnionAgg(c).toAggregateExpression()
      case args => throw new IllegalArgumentException(s"theta_union expects 1 arg, got ${args.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("hll_sketch", {
      case Seq(c)    => HllSketchAgg(c).toAggregateExpression()
      case Seq(c, k) => HllSketchAgg(c, intLit(k, "lgK")).toAggregateExpression()
      case args => throw new IllegalArgumentException(s"hll_sketch expects 1-2 args, got ${args.length}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("hll_union", {
      case Seq(c) => HllUnionAgg(c).toAggregateExpression()
      case args => throw new IllegalArgumentException(s"hll_union expects 1 arg, got ${args.length}")
    }, "scala_udf")

    // ---- scalar finishers over serialized sketches (BinaryType) ----
    val u = spark.udf
    u.register("req_quantile", (b: Array[Byte], r: Double) => ReqSketch.deserialize(b).quantile(r))
    u.register("req_quantile_lte", (b: Array[Byte], r: Double) => ReqSketch.deserialize(b).quantile(r, inclusive = true))
    u.register("req_quantiles", (b: Array[Byte], rs: Seq[Double]) => ReqSketch.deserialize(b).quantiles(rs))
    u.register("req_rank", (b: Array[Byte], v: Double) => ReqSketch.deserialize(b).rank(v))
    u.register("req_rank_lte", (b: Array[Byte], v: Double) => ReqSketch.deserialize(b).rank(v, inclusive = true))
    u.register("req_cdf", (b: Array[Byte], splits: Seq[Double]) => ReqSketch.deserialize(b).cdf(splits).orNull)
    u.register("req_pmf", (b: Array[Byte], splits: Seq[Double]) => ReqSketch.deserialize(b).pmf(splits).orNull)
    u.register("req_count", (b: Array[Byte]) => ReqSketch.deserialize(b).count)
    u.register("req_sum", (b: Array[Byte]) => ReqSketch.deserialize(b).sum)
    u.register("req_min", (b: Array[Byte]) => ReqSketch.deserialize(b).minimum)
    u.register("req_max", (b: Array[Byte]) => ReqSketch.deserialize(b).maximum)
    u.register("req_retained", (b: Array[Byte]) => ReqSketch.deserialize(b).retainedItemCount)
    u.register("req_rank_lb", (b: Array[Byte], r: Double, sd: Int) => ReqSketch.deserialize(b).rankLowerBound(r, sd))
    u.register("req_rank_ub", (b: Array[Byte], r: Double, sd: Int) => ReqSketch.deserialize(b).rankUpperBound(r, sd))

    u.register("kll_quantile", (b: Array[Byte], r: Double) => KllSketch.deserialize(b).quantile(r))
    u.register("kll_quantiles", (b: Array[Byte], rs: Seq[Double]) => KllSketch.deserialize(b).quantiles(rs))
    u.register("kll_rank", (b: Array[Byte], v: Double) => KllSketch.deserialize(b).rank(v))
    u.register("kll_count", (b: Array[Byte]) => KllSketch.deserialize(b).count)
    u.register("kll_rank_error", (b: Array[Byte]) => KllSketch.deserialize(b).normalizedRankError)

    u.register("theta_estimate", (b: Array[Byte]) => ThetaSketch.deserialize(b).estimate)
    u.register("theta_lb", (b: Array[Byte], sd: Int) => ThetaSketch.deserialize(b).lowerBound(sd))
    u.register("theta_ub", (b: Array[Byte], sd: Int) => ThetaSketch.deserialize(b).upperBound(sd))
    u.register("theta_intersect_estimate", (a: Array[Byte], b: Array[Byte]) =>
      ThetaSketch.intersection(ThetaSketch.deserialize(a), ThetaSketch.deserialize(b)).estimate)
    u.register("theta_anotb_estimate", (a: Array[Byte], b: Array[Byte]) =>
      ThetaSketch.aNotB(ThetaSketch.deserialize(a), ThetaSketch.deserialize(b)).estimate)

    u.register("hll_estimate", (b: Array[Byte]) => HllSketch.deserialize(b).estimate)

    graft.operators.PairGen.register(spark)

    // ---- text / dedup kernels (shared with Scala-side oracles) ----
    u.register("shingles5", (t: String) => TextOps.shingleHashes(t))
    u.register("minhash128", (t: String) => TextOps.minHash(t))
    u.register("band_hashes", (sig: Seq[Long]) => TextOps.bandHashes(sig.toArray))
    u.register("simhash64", (t: String) => TextOps.simHash64(t))
    u.register("simhash_probes", (sim: Long, maxDist: Int) => TextOps.simHashProbeKeys(sim, maxDist))
    u.register("jaccard_shingles", (a: String, b: String) => TextOps.jaccardShingles(a, b))
    u.register("est_jaccard", (a: Seq[Long], b: Seq[Long]) => TextOps.estimatedJaccard(a.toArray, b.toArray))
    u.register("winnow_fps", (t: String) => TextOps.winnowedFingerprints(t))
    u.register("lcs_len", (a: String, b: String) => TextOps.longestCommonSubstring(a, b))
    u.register("sa_lcs", (a: String, b: String) => SuffixArray.longestCommonSubstring(a, b))
    u.register("common_substring_atleast",
      (a: String, b: String, minLen: Int) => TextOps.commonSubstringAtLeast(a, b, minLen))
    u.register("extract_text", (html: Array[Byte]) => HtmlText.extract(html))
    u.register("lang_id", (t: String) => TextOps.langId(t))
    u.register("stop_count",
      (toks: Seq[String]) => toks.count(t => TextOps.StopWords.contains(t.toLowerCase)))
    u.register("quality_score", (t: String) => TextOps.qualityScore(t))
  }
}

/** `SparkSessionExtensions` hook for spark-submit deployments:
  * `--conf spark.sql.extensions=graft.spark.GraftExtensions` injects the
  * aggregate functions at session build time. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def info(name: String) = new ExpressionInfo("graft", name)
    ext.injectFunction((FunctionIdentifier("req_sketch"), info("req_sketch"), {
      case Seq(c) => ReqSketchAgg(Cast(c, DoubleType)).toAggregateExpression()
      case Seq(c, k: Literal) => ReqSketchAgg(Cast(c, DoubleType), k.value.asInstanceOf[Int]).toAggregateExpression()
      case args => throw new IllegalArgumentException(s"req_sketch: bad args $args")
    }))
    ext.injectFunction((FunctionIdentifier("theta_sketch"), info("theta_sketch"),
      (args: Seq[Expression]) => ThetaSketchAgg(args.head).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("hll_sketch"), info("hll_sketch"),
      (args: Seq[Expression]) => HllSketchAgg(args.head).toAggregateExpression()))
  }
}
