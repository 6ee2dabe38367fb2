package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The top 60 bits of md5(s) as a non-negative long — the numeric value
  * of the digest's first 15 hex characters, i.e. exactly
  * `conv(substring(md5(s), 1, 15), 16, 10)` and DuckDB's
  * `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`, which is how every
  * text-pipeline hash (minhash base hash, simhash token hash, rolling
  * fingerprint, span fingerprint) is defined against the oracle.
  *
  * The composed-function form it replaces materializes a 32-char hex
  * string, substrings it, and re-parses it base-16 — three UTF8String
  * allocations per hashed token on paths that hash every shingle of
  * every document. This expression goes digest → long directly (first 8
  * bytes big-endian, unsigned-shifted right 4) in one codegen'd call.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(c: Expression): Md5Prefix60 =
    copy(child = c)
  override def prettyName: String = "md5_prefix60"
}

object Md5Prefix60 {
  // MessageDigest is stateful — one instance per task thread, reset by
  // digest() itself, so the hot loop never re-allocates the algorithm.
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def hash(s: UTF8String): Long = {
    val dig = md.get().digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) {
      acc = (acc << 8) | (dig(i) & 0xffL)
      i += 1
    }
    acc >>> 4
  }

  def apply(c: Column): Column = GraftSql.column(Md5Prefix60(GraftSql.expression(c)))
}
