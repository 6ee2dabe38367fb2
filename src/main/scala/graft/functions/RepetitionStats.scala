package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word n-gram repetition statistics in ONE compiled
  * row-local pass: `[n_shingles, max_shingle_count]` — the total window
  * count and the highest frequency of any single shingle string.
  * Semantically identical to ExplodeShingles → groupBy(doc, shingle) →
  * groupBy(doc) (same " "-concat shingle strings, positional windows,
  * repeats counted), but the counting hash map lives where the document
  * row already is, so BOTH shuffles of that pipeline disappear and
  * repetition scoring becomes scan-shaped — at 100 TB it parallelizes
  * per input split with nothing on the wire.
  *
  * Documents with fewer than n tokens return null (the exploded form
  * emits no rows for them — callers filter nulls for the same row set).
  */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val r = RepetitionStats.compute(input.asInstanceOf[ArrayData], n)
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |long[] st$c = graft.functions.RepetitionStats.compute($c, $n);
         |if (st$c == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(st$c);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  private val space = UTF8String.fromString(" ")

  /** the compiled hot loop, shared by eval and generated code */
  def compute(arr: ArrayData, n: Int): Array[Long] = {
    if (arr == null) return null
    val m = arr.numElements()
    if (m < n) return null
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    val counts = new java.util.HashMap[UTF8String, Int](m * 2)
    val parts = new Array[UTF8String](n)
    var maxCount = 0
    var start = 0
    while (start <= m - n) {
      var j = 0
      while (j < n) { parts(j) = toks(start + j); j += 1 }
      val sh = UTF8String.concatWs(space, parts: _*)
      val c = counts.merge(sh, 1, (a, b) => a + b)
      if (c > maxCount) maxCount = c
      start += 1
    }
    Array((m - n + 1).toLong, maxCount.toLong)
  }

  def apply(c: Column, n: Int): Column =
    GraftSql.column(RepetitionStats(GraftSql.expression(c), n))
}
