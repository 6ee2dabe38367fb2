package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Row-local ANN index kernels: the nearest-centroid / nearest-codeword
  * argmin evaluated INSIDE one compiled expression over a driver-held
  * index object, instead of broadcast-expanding every vector ×k and
  * re-collapsing with an aggregate. This is the classic Lloyd/encode
  * shape (Spark MLlib's KMeans collects centroids to the driver each
  * round and closes over them in the assignment map): the index is
  * bounded by the CALLER's construction — the fixture queries collect
  * 16 centroids / M·K = 128 codewords, the parameter-scale spec 256 /
  * 2048; either way nlist + M·K rows of floats (KBs to a few MB), never
  * corpus-scale — and assignment/encode become pure scan-shaped
  * projections: no join, no exchange, no sort, legal upstream of
  * stateful streaming ops.
  *
  * Arithmetic is the EXACT fold the DataFrame form ran (see
  * VectorOps): sequential index-order double fold over floats for dot
  * and sum-of-squares, cost = c_ss − 2·dot for codewords, cosine =
  * dot/(√ss_e·√ss_c) for centroids. Candidates iterate in ascending
  * id order with strict-improvement comparisons, so ties keep the
  * lowest id — identical to ORDER BY cost ASC, code ASC (resp. cosine
  * DESC, centroid_id ASC) — including NaN, which Spark's total order
  * places greatest: a NaN cosine (zero-norm vector) wins the DESC
  * ranking, a NaN cost loses the ASC ranking unless all are NaN.
  */
final class CentroidIndex(val ids: Array[Long], val vecs: Array[Array[Float]],
    val norms: Array[Double]) extends Serializable

/** per-subspace codebook: entries sorted by code within each sub;
  * `codes` carries the code ids (not necessarily contiguous — a trained
  * codeword can lose all members and drop out) */
final class CodebookIndex(val m: Int, val dsub: Int,
    val codes: Array[Array[Int]], val vecs: Array[Array[Array[Float]]],
    val css: Array[Array[Double]]) extends Serializable

/** embedding → struct(centroid_id, cosine) of the nearest centroid */
case class NearestCentroidF32(child: Expression, index: CentroidIndex)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroidF32.compute(input.asInstanceOf[ArrayData], index)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centIndex", index,
      "graft.functions.CentroidIndex")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (InternalRow)
         |  graft.functions.NearestCentroidF32.compute($c, $ref);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroidF32 =
    copy(child = c)
  override def prettyName: String = "nearest_centroid_f32"
}

object NearestCentroidF32 {
  def compute(arr: ArrayData, idx: CentroidIndex): InternalRow = {
    val n = arr.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getFloat(i).toDouble
      ss += v * v
      i += 1
    }
    val normE = math.sqrt(ss)
    var bestId = -1L
    var bestCos = 0.0
    var first = true
    var j = 0
    while (j < idx.ids.length) {
      val c = idx.vecs(j)
      if (c.length == n) { // mismatched dims never win, like DotF32's null
        var dot = 0.0
        var k = 0
        while (k < n) {
          dot += arr.getFloat(k).toDouble * c(k).toDouble
          k += 1
        }
        val cos = dot / (normE * idx.norms(j))
        // Spark's total order puts NaN greatest, so under ORDER BY
        // cosine DESC a NaN cosine (zero-norm centroid or embedding)
        // outranks every real one; mirror that here or the fold and the
        // window form diverge on degenerate inputs. Among equal keys
        // (incl. NaN vs NaN) the earlier — lowest — id keeps winning.
        val better =
          if (java.lang.Double.isNaN(cos)) !java.lang.Double.isNaN(bestCos)
          else cos > bestCos
        if (first || better) { bestCos = cos; bestId = idx.ids(j); first = false }
      }
      j += 1
    }
    if (first) null
    else new GenericInternalRow(Array[Any](bestId, bestCos))
  }

  def apply(c: Column, index: CentroidIndex): Column =
    GraftSql.column(NearestCentroidF32(GraftSql.expression(c), index))
}

/** vector → array<int> of M nearest-codeword codes (one per subspace) */
case class PqEncodeF32(child: Expression, index: CodebookIndex)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PqEncodeF32.compute(input.asInstanceOf[ArrayData], index)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cbIndex", index,
      "graft.functions.CodebookIndex")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (ArrayData)
         |  graft.functions.PqEncodeF32.compute($c, $ref);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeF32 =
    copy(child = c)
  override def prettyName: String = "pq_encode_f32"
}

object PqEncodeF32 {
  def compute(arr: ArrayData, idx: CodebookIndex): ArrayData = {
    // EXACT length like NearestCentroidF32: a longer vector against a
    // stale codebook config would otherwise encode only a prefix and
    // return plausible-looking wrong codes instead of null
    if (arr.numElements() != idx.m * idx.dsub) return null
    val out = new Array[Int](idx.m)
    var j = 0
    while (j < idx.m) {
      val off = j * idx.dsub
      val cbj = idx.vecs(j)
      val ssj = idx.css(j)
      var bestCode = -1
      var bestCost = 0.0
      var first = true
      var c = 0
      while (c < cbj.length) {
        val cw = cbj(c)
        var dot = 0.0
        var k = 0
        while (k < idx.dsub) {
          if (arr.isNullAt(off + k)) return null
          dot += arr.getFloat(off + k).toDouble * cw(k).toDouble
          k += 1
        }
        val cost = ssj(c) - 2.0 * dot
        // NaN sorts greatest in Spark, so under ORDER BY cost ASC a NaN
        // cost can only win when every candidate is NaN (then lowest
        // code, as ties do).
        val better =
          if (java.lang.Double.isNaN(cost)) false
          else cost < bestCost || java.lang.Double.isNaN(bestCost)
        if (first || better) { bestCost = cost; bestCode = idx.codes(j)(c); first = false }
        c += 1
      }
      if (first) return null // empty codebook for this subspace
      out(j) = bestCode
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, index: CodebookIndex): Column =
    GraftSql.column(PqEncodeF32(GraftSql.expression(c), index))
}
