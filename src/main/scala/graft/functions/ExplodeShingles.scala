package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generator (UDTF extension point — SURVEY §2.6: "user code producing
  * rows maps to a flatMap/UDTF (Generator)"): explode a token array into
  * its word-n-gram shingles in ONE compiled pass per row.
  *
  * Why an expression and not composition: the two composable forms both
  * pay structural overhead — the array-lambda (`transform` + `element_at`)
  * runs interpreted per element and is subject to projection-collapse
  * re-tokenization, and the posexplode+window form shuffle-sorts every
  * token row just to see its neighbors. A Generator sees the whole array
  * per input row, so neighbors are free: no shuffle, no interpreted
  * lambda, and downstream partial aggregation (e.g. minhash MINs) shrinks
  * the only remaining shuffle to |docs|-scale.
  *
  * Rows with fewer than `n` tokens yield nothing (matching the
  * `size >= n` guards of the composed forms). Output column: `shingle`.
  *
  * `distinctPerRow` emits each shingle string once per input row (in
  * first-occurrence order): a document's shingle SET is row-local, so a
  * downstream `.distinct()` on (doc_id, shingle) — which plans a
  * corpus-scale exchange for rows that never had cross-partition
  * duplicates — collapses into the generator pass itself.
  */
case class ExplodeShingles(child: Expression, n: Int,
    withPos: Boolean = false, distinctPerRow: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")
  require(!(withPos && distinctPerRow),
    "positional and distinct emission are mutually exclusive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"explode_shingles needs array<string>, got ${other.catalogString}")
    }

  override def elementSchema: StructType =
    if (withPos)
      StructType(Seq(StructField("pos", IntegerType, nullable = false),
        StructField("shingle", StringType, nullable = false)))
    else
      StructType(Seq(StructField("shingle", StringType, nullable = false)))

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Iterator.empty
    else {
      val m = arr.numElements()
      val toks = new Array[UTF8String](m)
      var i = 0
      while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
      val seen = if (distinctPerRow)
        new java.util.HashSet[UTF8String](2 * (m - n + 1)) else null
      (0 to m - n).iterator.flatMap { start =>
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks(start + j); j += 1 }
        val s = UTF8String.concatWs(space, parts: _*)
        if (distinctPerRow && !seen.add(s)) Iterator.empty
        else if (withPos) Iterator.single(InternalRow(start, s))
        else Iterator.single(InternalRow(s))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): ExplodeShingles =
    copy(child = c)
  override def prettyName: String = "explode_shingles"
}
