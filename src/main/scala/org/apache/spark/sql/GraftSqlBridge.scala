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

  /** Execute an already-parsed logical plan, with optional positional
    * parameters — what `SparkSession.sql(text, args)` does after its own
    * parse (parsedPlan -> PosParameterizedQuery -> Dataset.ofRows), minus
    * the parse. Lets the engine's statement cache (B4) actually skip the
    * ANTLR work on a hit; analysis still runs per execution, picking up
    * whatever temp views are registered NOW. */
  def ofRows(s: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      args: Array[Any] = Array.empty): DataFrame = {
    val cs = s.asInstanceOf[classic.SparkSession]
    // clone the cached tree: analysis mutates per-node state (tags /
    // resolution bookkeeping), so re-executing the SAME object after an
    // earlier failed analysis can replay the stale failure even though
    // the catalog has since changed
    val fresh = plan.clone()
    val wrapped =
      if (args.isEmpty) fresh
      else org.apache.spark.sql.catalyst.analysis.PosParameterizedQuery(
        // eager conversion: the arg validator demands real Literal nodes,
        // not the lazy ColumnNodeExpression wrapper `expression` returns
        fresh, args.toSeq.map(a => eagerExpression(functions.lit(a))))
    classic.Dataset.ofRows(cs, wrapped)
  }
}
