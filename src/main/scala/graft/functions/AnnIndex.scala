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

/** Two-level centroid index: `supers` summarize the flat centroid set
  * (their `ids` are POSITIONS into `children`), and `children(j)` holds
  * the full centroids routed to super j. Closes the n·k assignment term
  * of the k-grows-with-corpus recipe (semdedupOf / neardupCellsOf
  * scaladocs): flat assignment scans all k centroids per row; two-level
  * scans ~√k supers + that super's ~√k children — 2√k, the standard
  * coarse-quantizer shape (IVF's own trick applied to assignment).
  * APPROXIMATE by contract: the nearest child within the nearest super
  * is not always the global argmax — the boundary-miss trade every
  * hierarchical quantizer makes, stated where it is used. */
final class Centroid2LevelIndex(val supers: CentroidIndex,
    val children: Array[CentroidIndex]) extends Serializable

object Centroid2LevelIndex {

  /** route a flat centroid set under its first `nSupers` members (the
    * lowest-id seed convention every fixture query uses): each centroid
    * goes to its nearest super by the SAME cosine/tie fold as row
    * assignment. Driver-side over the bounded centroid set. */
  def build(flat: CentroidIndex, nSupers: Int): Centroid2LevelIndex = {
    require(nSupers > 0 && nSupers <= flat.ids.length,
      s"nSupers $nSupers out of range for ${flat.ids.length} centroids")
    val superVecs = flat.vecs.take(nSupers)
    val superNorms = flat.norms.take(nSupers)
    val routed = Array.fill(nSupers)(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    var i = 0
    while (i < flat.ids.length) {
      val v = flat.vecs(i)
      // the candidate's norm is loop-invariant over supers, and
      // flat.norms(i) already holds the exact same sequential fold
      // (collectCentroids) — reuse it so cosines stay bit-identical
      // while the route costs O(k·d), not O(k·nSupers·d)
      val vNorm = flat.norms(i)
      var best = 0
      var bestCos = 0.0
      var first = true
      var j = 0
      while (j < nSupers) {
        val s = superVecs(j)
        if (s.length == v.length) {
          var dot = 0.0
          var k = 0
          while (k < v.length) { dot += v(k).toDouble * s(k).toDouble; k += 1 }
          val cos = dot / (vNorm * superNorms(j))
          val better =
            if (java.lang.Double.isNaN(cos)) !java.lang.Double.isNaN(bestCos)
            else cos > bestCos
          if (first || better) { bestCos = cos; best = j; first = false }
        }
        j += 1
      }
      routed(best) += i
      i += 1
    }
    // a super can end up empty when its anchor vector has an identical
    // lower-position twin (ties route to the lowest super) — give it
    // back its own anchor so a row assigned there never resolves null;
    // the anchor's dual membership is harmless (same id, same vector)
    var g = 0
    while (g < nSupers) { if (routed(g).isEmpty) routed(g) += g; g += 1 }
    val children = routed.map { members =>
      new CentroidIndex(members.map(flat.ids(_)).toArray,
        members.map(flat.vecs(_)).toArray,
        members.map(flat.norms(_)).toArray)
    }
    new Centroid2LevelIndex(
      new CentroidIndex(Array.tabulate(nSupers)(_.toLong),
        superVecs, superNorms),
      children)
  }

  /** Two-level index with a TRAINED super level — the hierarchical-
    * quantizer shape production runs when the FLAT centroids are
    * themselves trained. `build` anchors supers on the first nSupers
    * centroids, which is the right stand-in for the fixture's seed
    * convention but measurably mis-covers a TRAINED centroid set
    * (k-means pulls every centroid into the data's dense regions, so
    * "the first 12" no longer sample the space — the r12 router spec
    * measured median regret 0.20 vs 0.014). Here a driver-side Lloyd
    * loop clusters the (bounded-by-construction) centroid set into
    * nSupers means first: route each centroid to its nearest super by
    * the same cosine fold, recompute each super as its members' mean,
    * repeat. Deterministic — fixed seed (first nSupers centroids),
    * sequential folds, ties to the lowest super — and O(k·nSupers·d·
    * iters) on the driver, microseconds at any real nlist. r14: the
    * mean runs on the SAME floor(x·2^20) integer grid as kmeansOf
    * (exact long sum + one double division, rounded to float), so the
    * super training is order-free and mirrorable term-for-term in SQL —
    * q_embed_2level_recall hash-checks this router's quality against a
    * DuckDB unroll (SimilarityOps.duckSupersCtes). */
  def buildTrained(flat: CentroidIndex, nSupers: Int,
      iters: Int = 5): Centroid2LevelIndex = {
    require(nSupers > 0 && nSupers <= flat.ids.length,
      s"nSupers $nSupers out of range for ${flat.ids.length} centroids")
    val k = flat.ids.length
    val d = flat.vecs.headOption.map(_.length).getOrElse(0)
    var superVecs = Array.tabulate(nSupers)(j => flat.vecs(j))
    var superNorms = Array.tabulate(nSupers)(j => flat.norms(j))

    def routeAll(): Array[scala.collection.mutable.ArrayBuffer[Int]] = {
      val routed = Array.fill(nSupers)(
        scala.collection.mutable.ArrayBuffer.empty[Int])
      var i = 0
      while (i < k) {
        val v = flat.vecs(i)
        val vNorm = flat.norms(i)
        var best = 0
        var bestCos = 0.0
        var first = true
        var j = 0
        while (j < nSupers) {
          val s = superVecs(j)
          if (s.length == v.length) {
            var dot = 0.0
            var c = 0
            while (c < v.length) { dot += v(c).toDouble * s(c).toDouble; c += 1 }
            val cos = dot / (vNorm * superNorms(j))
            val better =
              if (java.lang.Double.isNaN(cos)) !java.lang.Double.isNaN(bestCos)
              else cos > bestCos
            if (first || better) { bestCos = cos; best = j; first = false }
          }
          j += 1
        }
        routed(best) += i
        i += 1
      }
      routed
    }

    var round = 0
    while (round < iters) {
      val routed = routeAll()
      val nextVecs = new Array[Array[Float]](nSupers)
      val nextNorms = new Array[Double](nSupers)
      var j = 0
      while (j < nSupers) {
        if (routed(j).isEmpty) { // empty super keeps its previous mean
          nextVecs(j) = superVecs(j)
          nextNorms(j) = superNorms(j)
        } else {
          // the kmeansOf grid (2^20): float→double is exact, ×2^20 only
          // shifts the exponent, floor is exact, and summing LONGS is
          // order-independent — the mean is one exact integer sum plus
          // one IEEE double division, bit-portable to the SQL mirror
          val quant = 1048576L
          val acc = new Array[Long](d)
          routed(j).foreach { m =>
            val v = flat.vecs(m)
            var c = 0
            while (c < math.min(d, v.length)) {
              acc(c) += math.floor(v(c).toDouble * quant).toLong
              c += 1
            }
          }
          val mean = Array.tabulate(d)(c =>
            (acc(c).toDouble / (routed(j).length * quant)).toFloat)
          var ss = 0.0
          var c = 0
          while (c < d) { val x = mean(c).toDouble; ss += x * x; c += 1 }
          nextVecs(j) = mean
          nextNorms(j) = math.sqrt(ss)
        }
        j += 1
      }
      superVecs = nextVecs
      superNorms = nextNorms
      round += 1
    }
    // final routing under the trained supers builds the children
    val routed = routeAll()
    var g = 0
    while (g < nSupers) { if (routed(g).isEmpty) routed(g) += g % k; g += 1 }
    val children = routed.map { members =>
      new CentroidIndex(members.map(flat.ids(_)).toArray,
        members.map(flat.vecs(_)).toArray,
        members.map(flat.norms(_)).toArray)
    }
    new Centroid2LevelIndex(
      new CentroidIndex(Array.tabulate(nSupers)(_.toLong),
        superVecs, superNorms),
      children)
  }
}

/** embedding → struct(centroid_id, cosine) via the two-level route:
  * nearest super first, then nearest child within it. Same output
  * shape, fold arithmetic and tie order as NearestCentroidF32 (both
  * legs reuse its compute). */
case class NearestCentroid2LevelF32(child: Expression,
    index: Centroid2LevelIndex) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroid2LevelF32.compute(input.asInstanceOf[ArrayData], index)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cent2Index", index,
      "graft.functions.Centroid2LevelIndex")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (InternalRow)
         |  graft.functions.NearestCentroid2LevelF32.compute($c, $ref);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid2LevelF32 =
    copy(child = c)
  override def prettyName: String = "nearest_centroid_2level_f32"
}

object NearestCentroid2LevelF32 {
  def compute(arr: ArrayData, idx: Centroid2LevelIndex): InternalRow = {
    val s = NearestCentroidF32.compute(arr, idx.supers)
    if (s == null) return null
    val group = idx.children(s.getLong(0).toInt)
    NearestCentroidF32.compute(arr, group)
  }

  def apply(c: Column, index: Centroid2LevelIndex): Column =
    GraftSql.column(NearestCentroid2LevelF32(GraftSql.expression(c), index))
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
