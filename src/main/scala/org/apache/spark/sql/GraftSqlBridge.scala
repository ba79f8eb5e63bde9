package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column <-> Expression conversions for
  * graft's native Catalyst expressions ([[graft.functions.JsonExpressions]]).
  * Spark 4 hides these behind `org.apache.spark.sql.classic.ExpressionUtils`;
  * a same-package shim is the standard seam extension libraries use when
  * SparkSessionExtensions injection isn't available (the engine receives an
  * already-built SparkSession). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager Column -> Expression conversion. `expression` wraps the
    * Column's node lazily (ColumnNodeExpression) and relies on plan
    * building to convert it — inside a FunctionRegistry builder nothing
    * ever does, so codegen would meet the raw wrapper. This runs the
    * converter immediately. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
