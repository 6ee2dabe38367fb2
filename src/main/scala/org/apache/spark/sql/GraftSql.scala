package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * these behind org.apache.spark.sql.classic.ExpressionUtils). Lives in the
  * sql package solely to satisfy the access modifier — the standard pattern
  * for third-party Catalyst extensions.
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
