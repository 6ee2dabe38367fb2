package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All k affine minhash signatures of a token array in ONE compiled
  * row-local pass: each word n-gram shingle hashes once
  * (md5-prefix60 mod `mod`, exactly `Md5Prefix60`), and k running
  * minimums of (a_i·h + b_i) mod p advance per shingle. Identical
  * arithmetic and identical UTF8String " "-concat to the
  * ExplodeShingles → groupBy-MIN pipeline it replaces, but with no
  * generator rows and no exchange — signatures materialize where the
  * document row already is, so the minhash plan's first shuffle
  * disappears. It is also the only formulation a STREAMING pipeline can
  * use: Structured Streaming rejects an aggregation upstream of
  * flatMapGroupsWithState, so the banded near-dup stream needs
  * signatures computed row-locally.
  *
  * Documents with fewer than n tokens return null (the exploded form
  * emits no rows for them — callers filter nulls for the same row set).
  */
case class MinhashSigs(child: Expression, n: Int, mod: Long,
    a: Seq[Long], b: Seq[Long], p: Long) extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty, "affine families must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val r = MinhashSigs.compute(input.asInstanceOf[ArrayData], n, mod,
      a.toArray, b.toArray, p)
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |long[] sigs$c = graft.functions.MinhashSigs.compute(
         |  $c, $n, ${mod}L, $aRef, $bRef, ${p}L);
         |if (sigs$c == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs$c);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinhashSigs =
    copy(child = c)
  override def prettyName: String = "minhash_sigs"
}

object MinhashSigs {
  /** the default 8-hash affine family (shared with the SQL surface):
    * h_i(x) = (a_i·x + b_i) mod P over md5-prefix60(shingle) mod M.
    * Constants sized so a_i·x < 2^61 — no 64-bit overflow (DuckDB
    * errors on bigint overflow; Spark wraps; staying under the limit
    * keeps both engines exact and identical). */
  val DefaultMod = 2147483647L // 2^31 - 1
  val DefaultP = 2305843009213693951L // 2^61 - 1
  val DefaultA: Seq[Long] = Seq(999999937L, 899999963L, 799999999L,
    699999999L, 599999971L, 499999993L, 399999959L, 299999977L)
  val DefaultB: Seq[Long] = Seq(15485863L, 32452843L, 49979687L,
    67867967L, 86028121L, 104395301L, 122949823L, 141650939L)

  /** the default family over word n-gram shingles of a token array */
  def default(tokens: Expression, n: Int): MinhashSigs =
    MinhashSigs(tokens, n, DefaultMod, DefaultA, DefaultB, DefaultP)

  private val space = UTF8String.fromString(" ")

  /** the compiled hot loop, shared by eval and generated code */
  def compute(arr: ArrayData, n: Int, mod: Long,
      a: Array[Long], b: Array[Long], p: Long): Array[Long] = {
    if (arr == null) return null
    val m = arr.numElements()
    if (m < n) return null
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val parts = new Array[UTF8String](n)
    var start = 0
    while (start <= m - n) {
      var j = 0
      while (j < n) { parts(j) = toks(start + j); j += 1 }
      val h = Md5Prefix60.hash(UTF8String.concatWs(space, parts: _*)) % mod
      var q = 0
      while (q < k) {
        val v = (h * a(q) + b(q)) % p
        if (v < mins(q)) mins(q) = v
        q += 1
      }
      start += 1
    }
    mins
  }

  def apply(c: Column, n: Int, mod: Long, a: Seq[Long], b: Seq[Long],
      p: Long): Column =
    GraftSql.column(MinhashSigs(GraftSql.expression(c), n, mod, a, b, p))
}
