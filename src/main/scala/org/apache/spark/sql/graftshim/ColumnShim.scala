package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column a ColumnNode wrapper and gated the Expression
  * bridge behind `private[sql]` — this shim (inside the sql package
  * namespace) re-exposes exactly the two conversions our custom Catalyst
  * expressions need. No Spark internals are modified. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
