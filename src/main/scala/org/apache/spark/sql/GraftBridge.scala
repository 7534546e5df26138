package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column <-> Expression conversions (the standard
  * pattern for Catalyst-level Spark extensions living outside the Spark
  * source tree). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Materialize a `functions.udf(...)` object into a Catalyst ScalaUDF over
    * explicit children — needed by FunctionRegistry/extension builders,
    * where `udf.apply(Column)` would produce an unresolvable lazy
    * ColumnNode instead of an evaluable expression. */
  def scalaUDF(f: expressions.UserDefinedFunction,
               children: Seq[Expression]): Expression =
    classic.UserDefinedFunctionUtils.toScalaUDF(
      f.asInstanceOf[expressions.SparkUserDefinedFunction], children)
}
