package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between [[Column]] and Catalyst [[Expression]] for custom
  * expressions. Spark 4's `ExpressionUtils` is `private[sql]`, so this
  * one-file shim lives in the `org.apache.spark.sql` package namespace —
  * the conventional extension point for libraries shipping native
  * expressions (no Spark internals are modified).
  */
object ColumnGlue {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
