package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The u256 multi-representation family.
  *
  * The reference emits every 256-bit column as a configurable set of derived
  * physical columns (cryo types/schemas.rs:63-106, dataframes/u256s.rs:16-61):
  * `<name>_binary` (32-byte big-endian), `<name>_string` (decimal string),
  * `<name>_f32`/`_f64` (lossy float), `<name>_u32`/`_u64` (WRAPPING
  * truncation — low bytes only, u256s.rs:49-54), `<name>_d128`
  * (decimal; the reference errors "DECIMAL128 not implemented", we
  * implement it with overflow→null). Canonical storage here is the 32-byte
  * big-endian binary; all variants derive from it.
  */
object U256 {

  sealed abstract class Repr(val suffix: String)
  case object Binary extends Repr("binary")
  case object Str extends Repr("string")
  case object F32 extends Repr("f32")
  case object F64 extends Repr("f64")
  case object U32 extends Repr("u32")
  case object U64 extends Repr("u64")
  case object D128 extends Repr("d128")

  /** default set mirrors cryo cli/parse/schemas.rs:87-109 */
  val defaultReprs: Seq[Repr] = Seq(Binary, Str, F64)
  val allReprs: Seq[Repr] = Seq(Binary, Str, F32, F64, U32, U64, D128)

  private def ex(c: Column): Expression = GraftSql.expression(c)
  private def co(e: Expression): Column = GraftSql.column(e)

  def toString256(c: Column): Column = co(U256ToString(ex(c)))
  def toF64(c: Column): Column = co(U256ToDouble(ex(c)))
  def toF32(c: Column): Column = toF64(c).cast("float")
  def toD128(c: Column): Column = co(U256ToDecimal(ex(c)))

  /** wrapping truncation to the low 8 bytes, reinterpreted as signed long
    * (bit-level identical to the reference's wrapping u64). */
  def toU64(c: Column): Column = co(U256WrapLong(ex(c), 8))
  /** wrapping truncation to the low 4 bytes (fits in long, non-negative). */
  def toU32(c: Column): Column = co(U256WrapLong(ex(c), 4))

  def repr(c: Column, r: Repr): Column = r match {
    case Binary => c
    case Str    => toString256(c)
    case F32    => toF32(c)
    case F64    => toF64(c)
    case U32    => toU32(c)
    case U64    => toU64(c)
    case D128   => toD128(c)
  }

  /** Expand one logical u256 binary column into its physical columns. */
  def expand(c: Column, name: String, reprs: Seq[Repr] = defaultReprs): Seq[Column] =
    reprs.map(r => repr(c, r).as(s"${name}_${r.suffix}"))

  /** Big-endian bytes → BigInteger (unsigned). */
  def toBigInt(b: Array[Byte]): BigInteger = new BigInteger(1, b)

  /** BigInteger → 32-byte big-endian (for fixture/test construction). */
  def toBytes32(v: BigInteger): Array[Byte] = {
    val raw = v.toByteArray.dropWhile(_ == 0)
    require(raw.length <= 32, s"u256 overflow: $v")
    val out = new Array[Byte](32)
    System.arraycopy(raw, 0, out, 32 - raw.length, raw.length)
    out
  }
}

abstract class U256Unary extends UnaryExpression with CodegenFallback {
}

/** 32-byte big-endian unsigned → decimal string (u256s.rs ToString impl). */
case class U256ToString(child: Expression) extends U256Unary {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(U256.toBigInt(v.asInstanceOf[Array[Byte]]).toString)
  override protected def withNewChildInternal(c: Expression): U256ToString = copy(c)
  override def prettyName: String = "u256_string"
}

/** 32-byte big-endian TWO'S-COMPLEMENT signed → decimal string — the
  * reference's I256 conversion path (types/conversions.rs:7-48): int256
  * ABI values above 64 bits keep their sign, unlike the unsigned u256
  * family. BigInteger(byte[]) is two's complement by definition. */
case class I256ToString(child: Expression) extends U256Unary {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(new BigInteger(v.asInstanceOf[Array[Byte]]).toString)
  override protected def withNewChildInternal(c: Expression): I256ToString = copy(c)
  override def prettyName: String = "i256_string"
}

/** unsigned big-endian → double (correctly rounded, like the reference's
  * primitive cast). */
case class U256ToDouble(child: Expression) extends U256Unary {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    U256.toBigInt(v.asInstanceOf[Array[Byte]]).doubleValue
  override protected def withNewChildInternal(c: Expression): U256ToDouble = copy(c)
  override def prettyName: String = "u256_f64"
}

/** unsigned big-endian → Decimal(38,0); values ≥ 10^38 → null (the
  * reference's Decimal128 path errors instead — we exceed it). */
case class U256ToDecimal(child: Expression) extends U256Unary {
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  private val limit = new BigInteger("1" + "0" * 38)
  override protected def nullSafeEval(v: Any): Any = {
    val bi = U256.toBigInt(v.asInstanceOf[Array[Byte]])
    if (bi.compareTo(limit) >= 0) null
    else org.apache.spark.sql.types.Decimal(new JBigDecimal(bi))
  }
  override protected def withNewChildInternal(c: Expression): U256ToDecimal = copy(c)
  override def prettyName: String = "u256_d128"
}

/** wrapping truncation: low `nBytes` bytes as a long (u256s.rs:49-54). */
case class U256WrapLong(child: Expression, nBytes: Int) extends U256Unary {
  require(nBytes == 4 || nBytes == 8)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    var acc = 0L
    var i = math.max(0, b.length - nBytes)
    while (i < b.length) { acc = (acc << 8) | (b(i) & 0xffL); i += 1 }
    acc
  }
  override protected def withNewChildInternal(c: Expression): U256WrapLong = copy(child = c)
  override def prettyName: String = s"u256_wrap$nBytes"
}

/** Hex encoding helpers — ColumnEncoding::Hex of the reference
  * (types/conversions.rs:60-100): lowercase, 0x-prefixed. */
object HexCodec {
  def toHex(c: Column): Column = concat(lit("0x"), lower(hex(c)))
  def fromHex(c: Column): Column = unhex(regexp_replace(c, "^0x", ""))
}
