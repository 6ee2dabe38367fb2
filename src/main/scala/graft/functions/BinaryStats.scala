package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, BinaryType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of zero bytes in a binary column — used for the reference's
  * n_input_zero_bytes / n_input_nonzero_bytes transaction stats
  * (cryo datasets/transactions.rs input-byte stats).
  */
case class ZeroByteCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    var n = 0; var i = 0
    while (i < b.length) { if (b(i) == 0) n += 1; i += 1 }
    n
  }
  override protected def withNewChildInternal(c: Expression): ZeroByteCount = copy(c)
  override def prettyName: String = "zero_byte_count"
}

/** Decimal-string → 32-byte big-endian u256 (inverse of U256ToString);
  * null for non-numeric or out-of-range input. */
case class U256FromString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    try {
      val bi = new BigInteger(v.asInstanceOf[UTF8String].toString.trim)
      if (bi.signum() < 0 || bi.bitLength() > 256) null
      else U256.toBytes32(bi)
    } catch { case _: NumberFormatException => null }
  }
  override protected def withNewChildInternal(c: Expression): U256FromString = copy(c)
  override def prettyName: String = "u256_from_string"
}

object BinaryStats {
  def zeroByteCount(c: Column): Column =
    GraftSql.column(ZeroByteCount(GraftSql.expression(c)))
  def u256FromString(c: Column): Column =
    GraftSql.column(U256FromString(GraftSql.expression(c)))
}
