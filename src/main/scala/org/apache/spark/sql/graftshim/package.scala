package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — the standard
  * pattern for libraries that ship custom Catalyst expressions without
  * requiring SparkSessionExtensions registration (works with ANY session,
  * including ones the graft library did not build). */
package object graftshim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register graft's SQL functions on an ALREADY-RUNNING session (the
    * extensions path, plans.GraftExtensions, only applies at session
    * build; this covers sessions the library did not create). Builders
    * come from the single source of truth in plans.GraftFunctions. */
  def registerFunctions(spark: SparkSession): Unit =
    graft.plans.GraftFunctions.builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
