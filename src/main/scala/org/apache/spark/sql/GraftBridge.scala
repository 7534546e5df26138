package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column <-> Expression conversions (the standard
  * pattern for Catalyst-level Spark extensions living outside the Spark
  * source tree). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly compute `df` and rebuild a DataFrame over the stored blocks
    * WITHOUT the InternalRow -> Row -> InternalRow double conversion that
    * `createDataFrame(df.localCheckpoint.rdd, schema)` pays (boxing every
    * array element — measured as the dominant cost for wide bucket rows).
    * Also the Spark-4-safe alternative to plain `localCheckpoint`: the
    * rebuilt plan carries no originStats, so iterative/multi-consumer use
    * can't blow up Catalyst planning (see memory note + CC workaround).
    * Blocks are freed by the ContextCleaner when the RDD is dropped. */
  def materialize(df: Dataset[Row]): Dataset[Row] = {
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    val rdd = df.queryExecution.toRdd.map(_.copy()) // unsafe rows are reused buffers
    rdd.localCheckpoint()
    rdd.count()
    session.internalCreateDataFrame(rdd, df.schema)
  }

  /** `materialize` that additionally counts rows matching `pred` DURING the
    * one materialization pass (a long accumulator folded into the
    * checkpoint's `count()` job) — callers that need a driver-side gate on
    * "does any such row exist" (e.g. BucketedPairs' monster-bucket branch)
    * get it without scheduling a second job over the stored blocks.
    * Task retries can only OVER-count the accumulator (each successful
    * attempt adds), never under-count — safe for existence gates, where a
    * false positive merely runs a branch that then finds no rows. */
  def materializeCounting(df: Dataset[Row],
                          pred: catalyst.InternalRow => Boolean): (Dataset[Row], Long) = {
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    val acc = session.sparkContext.longAccumulator("graft.materialize.matched")
    val rdd = df.queryExecution.toRdd.map { r =>
      if (pred(r)) acc.add(1L)
      r.copy()
    }
    rdd.localCheckpoint()
    rdd.count()
    (session.internalCreateDataFrame(rdd, df.schema), acc.value)
  }

  /** The physical-plan rows of `df` (UnsafeRow buffers ARE reused — copy
    * before buffering) plus a rebuild hook, for pass-through taps that
    * observe rows on their way to a sink without a Row conversion. */
  def internalRows(df: Dataset[Row]): org.apache.spark.rdd.RDD[catalyst.InternalRow] =
    df.queryExecution.toRdd

  /** Rebuild a DataFrame over an InternalRow RDD (inverse of
    * [[internalRows]]; schema must match the rows). */
  def fromInternalRows(session: SparkSession,
                       rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
                       schema: types.StructType): Dataset[Row] =
    session.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** Block until the async listener bus has delivered all queued events —
    * required before reading metrics accumulated by a SparkListener (the
    * bus lags behind job completion, so task-end events from the final
    * jobs may still be in flight). `private[spark]` in Spark itself. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Materialize a `functions.udf(...)` object into a Catalyst ScalaUDF over
    * explicit children — needed by FunctionRegistry/extension builders,
    * where `udf.apply(Column)` would produce an unresolvable lazy
    * ColumnNode instead of an evaluable expression. */
  def scalaUDF(f: expressions.UserDefinedFunction,
               children: Seq[Expression]): Expression =
    classic.UserDefinedFunctionUtils.toScalaUDF(
      f.asInstanceOf[expressions.SparkUserDefinedFunction], children)
}

/** `AbstractDataType` is `private[sql]`, so expressions outside the Spark
  * tree cannot declare `inputTypes` directly; this bridge trait gives them
  * a bigint-input contract with Spark's implicit input casting (analysis
  * fails or casts — never a runtime ClassCastException in `update`). */
trait GraftExpectsLongInput
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  self: Expression =>
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.LongType)
}
