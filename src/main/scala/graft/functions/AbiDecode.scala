package graft.functions

import java.math.BigInteger
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ABI event decoding — the reference's log decoder re-expressed as a
  * Catalyst expression (cryo types/decoders/log_decoder.rs:25-190).
  *
  * A human-readable event signature
  * (`Transfer(address indexed from, address indexed to, uint256 value)`)
  * is parsed at plan time; per row, `decodeEvent` turns (topics, data) into
  * a typed struct. Type mapping mirrors the reference's `make_series`:
  * int/uint ≤64 bits → long, >64 bits → 32-byte binary (u256-family
  * expansion applied downstream), address → 20-byte binary, bool →
  * boolean, bytes/bytesN → binary, string → string. Arrays/tuples are
  * unsupported exactly like the reference (log_decoder.rs:99). Malformed
  * rows decode to NULL — callers drop them, matching the reference's
  * skip-on-error (datasets/logs.rs:139-161).
  */
object Abi {

  sealed trait AbiType {
    def sparkType: DataType
    def canonical: String
  }
  case class UIntT(bits: Int) extends AbiType {
    val sparkType: DataType = if (bits <= 64) LongType else BinaryType
    val canonical = s"uint$bits"
  }
  case class IntT(bits: Int) extends AbiType {
    val sparkType: DataType = if (bits <= 64) LongType else BinaryType
    val canonical = s"int$bits"
  }
  case object AddressT extends AbiType { val sparkType: DataType = BinaryType; val canonical = "address" }
  case object BoolT extends AbiType { val sparkType: DataType = BooleanType; val canonical = "bool" }
  case class BytesNT(n: Int) extends AbiType { val sparkType: DataType = BinaryType; val canonical = s"bytes$n" }
  case object BytesT extends AbiType { val sparkType: DataType = BinaryType; val canonical = "bytes" }
  case object StringT extends AbiType { val sparkType: DataType = StringType; val canonical = "string" }

  case class Param(name: String, typ: AbiType, indexed: Boolean)

  case class Event(name: String, params: Seq[Param]) {
    val canonicalSignature: String =
      s"$name(${params.map(_.typ.canonical).mkString(",")})"
    /** topic0 = keccak256 of the canonical signature */
    val topic0: Array[Byte] = Keccak.hash(canonicalSignature)
    val indexedParams: Seq[Param] = params.filter(_.indexed)
    val bodyParams: Seq[Param] = params.filterNot(_.indexed)
    def structType: StructType =
      StructType(params.map { p =>
        // indexed dynamic types are stored as their 32-byte keccak topic
        val t = if (p.indexed && (p.typ == BytesT || p.typ == StringT)) BinaryType else p.typ.sparkType
        StructField(p.name, t, nullable = true)
      })
  }

  private val typeRe = "^(uint|int|bytes|address|bool|string)([0-9]*)$".r

  def parseType(s: String): AbiType = s.trim match {
    case t if t.endsWith("]") =>
      throw new IllegalArgumentException(s"array ABI types unsupported: $t (parity with reference log_decoder.rs:99)")
    case t if t.startsWith("(") =>
      throw new IllegalArgumentException(s"tuple ABI types unsupported: $t")
    case typeRe(base, suffix) => (base, suffix) match {
      case ("uint", "")   => UIntT(256)
      case ("uint", n)    => UIntT(n.toInt)
      case ("int", "")    => IntT(256)
      case ("int", n)     => IntT(n.toInt)
      case ("address", _) => AddressT
      case ("bool", _)    => BoolT
      case ("bytes", "")  => BytesT
      case ("bytes", n)   => BytesNT(n.toInt)
      case ("string", _)  => StringT
    }
    case t => throw new IllegalArgumentException(s"unknown ABI type: $t")
  }

  /** Parse a human-readable event signature. */
  def parseEvent(sig: String): Event = {
    val open = sig.indexOf('(')
    require(open > 0 && sig.endsWith(")"), s"malformed event signature: $sig")
    val name = sig.substring(0, open).trim.stripPrefix("event ").trim
    val body = sig.substring(open + 1, sig.length - 1).trim
    val params =
      if (body.isEmpty) Seq.empty
      else body.split(",").toSeq.zipWithIndex.map { case (raw, i) =>
        val toks = raw.trim.split("\\s+").toSeq
        val typ = parseType(toks.head)
        val indexed = toks.drop(1).contains("indexed")
        val pname = toks.drop(1).filterNot(_ == "indexed").lastOption.getOrElse(s"arg$i")
        Param(pname, typ, indexed)
      }
    Event(name, params)
  }

  /** decode one static 32-byte word into the param's catalyst value */
  private def decodeWord(typ: AbiType, word: Array[Byte]): Any = typ match {
    case UIntT(bits) if bits <= 64 =>
      new BigInteger(1, word).longValueExact()
    case UIntT(_) => word
    case IntT(bits) if bits <= 64 =>
      new BigInteger(word).longValueExact() // sign-extended two's complement
    case IntT(_) => word
    case AddressT => word.takeRight(20)
    case BoolT => word.exists(_ != 0)
    case BytesNT(n) => word.take(n)
    case _ => throw new IllegalStateException(s"dynamic type in static position: $typ")
  }

  /** Decode (topics, data) per the event; null on any mismatch. */
  def decode(event: Event, topics: Seq[Array[Byte]], data: Array[Byte]): InternalRow = {
    try {
      if (topics.isEmpty || topics.length != 1 + event.indexedParams.length) return null
      if (!java.util.Arrays.equals(topics.head, event.topic0)) return null
      val d = if (data == null) Array.emptyByteArray else data
      var topicIdx = 1
      var headIdx = 0
      val values = event.params.map { p =>
        if (p.indexed) {
          val word = topics(topicIdx); topicIdx += 1
          if (word.length != 32) return null
          p.typ match {
            case BytesT | StringT => word // hash of the value
            case t => decodeWord(t, word)
          }
        } else {
          val off = headIdx * 32; headIdx += 1
          if (d.length < off + 32) return null
          val word = java.util.Arrays.copyOfRange(d, off, off + 32)
          p.typ match {
            case BytesT | StringT =>
              val dyn = new BigInteger(1, word).intValueExact()
              if (d.length < dyn + 32) return null
              val len = new BigInteger(1, java.util.Arrays.copyOfRange(d, dyn, dyn + 32)).intValueExact()
              if (d.length < dyn + 32 + len) return null
              val bytes = java.util.Arrays.copyOfRange(d, dyn + 32, dyn + 32 + len)
              if (p.typ == StringT) UTF8String.fromString(new String(bytes, StandardCharsets.UTF_8))
              else bytes
            case t => decodeWord(t, word)
          }
        }
      }
      InternalRow.fromSeq(values)
    } catch {
      case _: ArithmeticException => null // value exceeds declared bit width
      case _: IndexOutOfBoundsException => null
    }
  }

  /** Column API: decode (topics array, data) → struct per signature. */
  def decodeEvent(topics: Column, data: Column, signature: String): Column =
    GraftSql.column(DecodeEvent(
      GraftSql.expression(topics),
      GraftSql.expression(data),
      signature))
}

/** topics: array<binary>, data: binary → struct of decoded params (null on
  * decode failure). Signature is parsed once at expression construction. */
case class DecodeEvent(left: Expression, right: Expression, signature: String)
    extends BinaryExpression with CodegenFallback {
  @transient lazy val event: Abi.Event = Abi.parseEvent(signature)
  override def dataType: DataType = event.structType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val topicsRaw = left.eval(input)
    if (topicsRaw == null) return null
    val arr = topicsRaw.asInstanceOf[ArrayData]
    val topics = (0 until arr.numElements()).map { i =>
      if (arr.isNullAt(i)) null else arr.getBinary(i)
    }.takeWhile(_ != null)
    val data = right.eval(input).asInstanceOf[Array[Byte]]
    Abi.decode(event, topics, data)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DecodeEvent =
    copy(left = l, right = r)
  override def prettyName: String = "decode_event"
}
