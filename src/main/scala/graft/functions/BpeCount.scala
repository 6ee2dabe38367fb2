package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Total subword count of a token array under a LEARNED BPE merge
  * table (see TextOps.bpeTrainOf): each word segments by the standard
  * greedy encoder — repeatedly apply the lowest-rank (leftmost on rank
  * ties) applicable merge until none applies — and the segment lengths
  * sum. One compiled pass per document; the merge table rides along as
  * a referenced object (nMerges entries — broadcast-sized by
  * construction), so the plan has no shuffle and no UDF.
  * TextOps.bpeSegment is the spec-side twin of the same loop. */
case class BpeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(BpeCount.pairKey(a, b), Integer.valueOf(i))
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeCount.compute(input.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeCount.compute($c, $ranksRef)")
  }

  override protected def withNewChildInternal(c: Expression): BpeCount =
    copy(child = c)
  override def prettyName: String = "bpe_count"
}

object BpeCount {
  /** collision-free pair key: merge symbols derive from arbitrary
    * corpus text (which may legally contain ANY character, including
    * NUL — a fixed separator is never safe), so the key length-prefixes
    * the first symbol; the digits-then-'_' prefix determines the split
    * point unambiguously, making the keying injective for all inputs
    * and keeping rank lookups identical to the tuple-keyed spec twin
    * (TextOps.bpeSegment). */
  private[functions] def pairKey(a: String, b: String): String =
    a.length.toString + "_" + a + b

  /** greedy BPE segment length of one word (compiled hot loop) */
  private def segLen(word: UTF8String,
      ranks: java.util.HashMap[String, Integer]): Int = {
    val w = word.toString
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    w.foreach(ch => syms += ch.toString)
    syms += "</w>"
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(BpeCount.pairKey(syms(i), syms(i + 1)))
        if (r != null && r.intValue < bestRank) { bestRank = r.intValue; bestI = i }
        i += 1
      }
      if (bestI < 0) continue = false
      else {
        syms(bestI) = syms(bestI) + syms(bestI + 1)
        syms.remove(bestI + 1)
        continue = syms.length > 1
      }
    }
    syms.length
  }

  def compute(arr: ArrayData, ranks: java.util.HashMap[String, Integer]): Long = {
    var total = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null && t.numBytes() > 0) total += segLen(t, ranks)
      i += 1
    }
    total
  }

  def apply(c: Column, merges: Seq[(String, String)]): Column =
    GraftSql.column(BpeCount(GraftSql.expression(c), merges))
}
