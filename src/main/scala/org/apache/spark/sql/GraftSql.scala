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

  /** Constraint/stats barrier over a just-checkpointed Dataset (r17,
    * VERDICT r16 item 7). Two per-level compounding costs live in the
    * checkpoint's `LogicalRDD` on iterative algorithms whose plans
    * embed prior checkpoints several times over:
    *
    *  1. `originConstraints` — the checkpointed plan's full constraint
    *     set, re-derived with fresh expression ids on every
    *     `newInstance()` (every self-join re-analysis); accumulated
    *     sets compound per contraction level (measured in r16: 17 s →
    *     258 s PER LEVEL on an adversarial id-monotone CC path graph).
    *     Dropped outright: constraints only feed optimizer inference
    *     (filter/null deduction), never values.
    *  2. `originStats.sizeInBytes` — join estimation MULTIPLIES child
    *     sizes, a batch's plan embeds the previous checkpoint ~4×, and
    *     the next checkpoint's originStats carries the product forward,
    *     so the BigInt grows DOUBLE-exponentially in level count (the
    *     r17 probe caught the driver pinned in BigInteger.multiply/
    *     ToomCook3 over million-digit sizeInBytes values — pure stats
    *     arithmetic, zero tasks running). Clamped to Long.MaxValue:
    *     every threshold comparison (broadcast, AQE) is unchanged for
    *     any realistic size, and the digit growth is gone.
    *
    * `originStats` are read reflectively (the curried field has no
    * accessor). Semantics unchanged; no-op on non-LogicalRDD plans. */
  def constraintBarrier(df: Dataset[_]): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    ds.queryExecution.logical match {
      case lr: execution.LogicalRDD =>
        val longMax = BigInt(Long.MaxValue)
        val stats = (try {
          val f = classOf[execution.LogicalRDD]
            .getDeclaredField("originStats")
          f.setAccessible(true)
          f.get(lr)
            .asInstanceOf[Option[catalyst.plans.logical.Statistics]]
        } catch { case _: Throwable => None }).map(s =>
          s.copy(sizeInBytes = s.sizeInBytes.min(longMax),
            rowCount = s.rowCount.map(_.min(longMax))))
        classic.Dataset.ofRows(ds.sparkSession,
          execution.LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            ds.sparkSession, stats, None))
      case _ => ds.toDF()
    }
  }
}
