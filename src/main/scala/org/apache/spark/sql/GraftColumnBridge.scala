package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters of Spark 4's
  * classic API (org.apache.spark.sql.classic.ExpressionUtils) so graft can
  * expose native Catalyst expressions as user-facing Columns. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly converts a Column's node tree to a catalyst Expression.
    * `expression` above defers conversion to Dataset analysis, which never
    * happens for expressions returned from a FunctionRegistry builder into
    * a SQL plan — this path converts immediately (children stay unresolved
    * attributes/functions; the analyzer resolves them in place). */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Registers an expression builder on an EXISTING session's function
    * registry (the config-time path is `GraftExtensions`; this one serves
    * sessions the caller didn't build, e.g. notebook environments). */
  def registerFunction(spark: SparkSession, name: String,
                       info: catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      catalyst.FunctionIdentifier(name), info, builder)
}
