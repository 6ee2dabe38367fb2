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

  /** Re-bind a Dataset's logical plan to another session sharing the
    * same SparkContext (r16 — semdedupStream builds its stateful plan
    * on a cloned session so the state-partition sizing never mutates
    * the caller's conf). Plain `Dataset.ofRows` is `private[sql]`,
    * hence the bridge. */
  def rebind(s: SparkSession, df: Dataset[_]): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[_]].queryExecution.logical)
}
