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
  * boolean, bytes/bytesN → binary, string → string. Arrays and tuples —
  * which the reference ERRORS on (log_decoder.rs:99) — decode here with
  * full head/tail semantics: `T[]`/`T[k]` → Spark arrays, `(T1,…,Tn)` →
  * nested structs, recursively (dynamic members resolve offsets relative
  * to their enclosing region per the ABI spec); indexed dynamic/array/
  * tuple params carry only their keccak topic, stored as the 32-byte
  * hash. Malformed rows decode to NULL — callers drop them, matching the
  * reference's skip-on-error (datasets/logs.rs:139-161).
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
  case class ArrayT(elem: AbiType, fixedLen: Option[Int]) extends AbiType {
    val sparkType: DataType = ArrayType(elem.sparkType, containsNull = false)
    val canonical = s"${elem.canonical}[${fixedLen.map(_.toString).getOrElse("")}]"
  }
  case class TupleT(members: Seq[AbiType]) extends AbiType {
    val sparkType: DataType = StructType(members.zipWithIndex.map { case (m, i) =>
      StructField(s"f$i", m.sparkType, nullable = false)
    })
    val canonical = s"(${members.map(_.canonical).mkString(",")})"
  }

  /** dynamic types use an offset head word; static types encode inline */
  def isDynamic(t: AbiType): Boolean = t match {
    case BytesT | StringT => true
    case ArrayT(_, None) => true
    case ArrayT(e, Some(_)) => isDynamic(e)
    case TupleT(ms) => ms.exists(isDynamic)
    case _ => false
  }

  /** bytes a value occupies in its enclosing head section */
  def headSize(t: AbiType): Int = t match {
    case t2 if isDynamic(t2) => 32
    case ArrayT(e, Some(k)) => k * headSize(e)
    case TupleT(ms) => ms.map(headSize).sum
    case _ => 32
  }

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
        // indexed dynamic/array/tuple params are stored as their 32-byte
        // keccak topic (the ABI hashes them into the topic slot)
        val hashed = p.typ match {
          case BytesT | StringT | _: ArrayT | _: TupleT => true
          case _ => false
        }
        val t = if (p.indexed && hashed) BinaryType else p.typ.sparkType
        StructField(p.name, t, nullable = true)
      })
  }

  private val typeRe = "^(uint|int|bytes|address|bool|string)([0-9]*)$".r

  /** split on top-level commas only (ignores commas inside () and []) */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** End of the type token in a possibly-named param ("uint256 amt",
    * "(uint a, uint b) inner", "uint[2] xs"): the type runs through the
    * last ')' / ']' when one precedes the first space, else to the
    * first space. Shared by parseEvent and nested tuple members so a
    * named member inside a nested tuple parses the same way at every
    * depth. */
  private def typeEnd(trimmed: String): Int = {
    val lastClose = math.max(trimmed.lastIndexOf(')'), trimmed.lastIndexOf(']'))
    val firstSpace = trimmed.indexOf(' ')
    if (lastClose >= 0 && (firstSpace < 0 || firstSpace < lastClose)) lastClose + 1
    else if (firstSpace < 0) trimmed.length
    else firstSpace
  }

  def parseType(s0: String): AbiType = {
    val s = s0.trim
    if (s.endsWith("]")) {
      val open = s.lastIndexOf('[')
      require(open > 0, s"malformed array type: $s")
      val lenStr = s.substring(open + 1, s.length - 1).trim
      ArrayT(parseType(s.substring(0, open)),
        if (lenStr.isEmpty) None else Some(lenStr.toInt))
    } else if (s.startsWith("(")) {
      require(s.endsWith(")"), s"malformed tuple type: $s")
      val inner = s.substring(1, s.length - 1).trim
      TupleT(if (inner.isEmpty) Seq.empty
        else splitTop(inner).map { m =>
          // tuple members may carry names ("(address to, uint256 amt)"),
          // including nested-tuple members ("((uint a, uint b) inner, uint c)")
          val t = m.trim
          parseType(t.substring(0, typeEnd(t)))
        })
    } else s match {
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
  }

  /** Parse a human-readable event signature. */
  def parseEvent(sig: String): Event = {
    val open = sig.indexOf('(')
    require(open > 0 && sig.endsWith(")"), s"malformed event signature: $sig")
    val name = sig.substring(0, open).trim.stripPrefix("event ").trim
    val body = sig.substring(open + 1, sig.length - 1).trim
    val params =
      if (body.isEmpty) Seq.empty
      else splitTop(body).zipWithIndex.map { case (raw, i) =>
        // the type may itself contain spaces (named tuple members), so
        // the type token runs through the last ')' or ']' if present
        val trimmed = raw.trim
        val tEnd = typeEnd(trimmed)
        val typ = parseType(trimmed.substring(0, tEnd))
        val rest = trimmed.substring(tEnd).trim.split("\\s+").toSeq.filter(_.nonEmpty)
        val indexed = rest.contains("indexed")
        val pname = rest.filterNot(_ == "indexed").lastOption.getOrElse(s"arg$i")
        Param(pname, typ, indexed)
      }
    Event(name, params)
  }

  /** decode one static 32-byte word into the param's catalyst value.
    * Width validation is per the DECLARED type for every width (a word
    * whose value exceeds uint<n>/int<n> is a malformed row → the throw
    * becomes the decode's skip-on-error null); uint64 values in
    * [2^63, 2^64) are legal for their type and reinterpret as the
    * signed long — the same wrapping-u64 convention as the u256 repr
    * family (previously longValueExact threw on them, nulling valid
    * rows like a max-allowance 2^64-1). */
  private def decodeWord(typ: AbiType, word: Array[Byte]): Any = typ match {
    case UIntT(bits) if bits <= 64 =>
      val v = new BigInteger(1, word)
      if (v.bitLength > bits)
        throw new ArithmeticException(s"uint$bits value exceeds declared width")
      if (bits == 64) v.longValue() else v.longValueExact()
    case UIntT(_) => word
    case IntT(bits) if bits <= 64 =>
      val v = new BigInteger(word) // sign-extended two's complement
      if (v.bitLength >= bits) // bitLength excludes the sign bit
        throw new ArithmeticException(s"int$bits value exceeds declared width")
      v.longValue()
    case IntT(_) => word
    case AddressT => word.takeRight(20)
    case BoolT => word.exists(_ != 0)
    case BytesNT(n) => word.take(n)
    case _ => throw new IllegalStateException(s"dynamic type in static position: $typ")
  }

  /** uint word at pos as a (bounds-checked) Int offset/length */
  private def u32(d: Array[Byte], pos: Int): Int = {
    if (pos < 0 || d.length < pos + 32) throw new IndexOutOfBoundsException(s"$pos")
    new BigInteger(1, java.util.Arrays.copyOfRange(d, pos, pos + 32)).intValueExact()
  }

  /** decode a STATIC (inline, possibly multi-word) value at pos */
  private def decodeStatic(typ: AbiType, d: Array[Byte], pos: Int): Any = typ match {
    case ArrayT(e, Some(k)) =>
      val hs = headSize(e)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        (0 until k).map(i => decodeStatic(e, d, pos + i * hs)).toArray)
    case TupleT(ms) =>
      var p = pos
      InternalRow.fromSeq(ms.map { m =>
        val v = decodeStatic(m, d, p); p += headSize(m); v
      })
    case t =>
      if (pos < 0 || d.length < pos + 32) throw new IndexOutOfBoundsException(s"$pos")
      decodeWord(t, java.util.Arrays.copyOfRange(d, pos, pos + 32))
  }

  /** decode a value whose head slot sits at headPos; dynamic offsets
    * resolve relative to `region` (the enclosing head section's start),
    * per the ABI head/tail rule — recursion handles nesting. */
  private def decodeValue(typ: AbiType, d: Array[Byte], region: Int, headPos: Int): Any = {
    if (!isDynamic(typ)) decodeStatic(typ, d, headPos)
    else {
      val off = region + u32(d, headPos)
      typ match {
        case BytesT | StringT =>
          val len = u32(d, off)
          if (d.length < off + 32 + len) throw new IndexOutOfBoundsException(s"$off+$len")
          val bytes = java.util.Arrays.copyOfRange(d, off + 32, off + 32 + len)
          if (typ == StringT) UTF8String.fromString(new String(bytes, StandardCharsets.UTF_8))
          else bytes
        case ArrayT(e, None) =>
          val n = u32(d, off)
          if (n > (d.length - off) / 32 + 1) throw new IndexOutOfBoundsException(s"len $n")
          val base = off + 32
          val hs = headSize(e)
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            (0 until n).map(i => decodeValue(e, d, base, base + i * hs)).toArray)
        case ArrayT(e, Some(k)) => // fixed-length array of dynamic elements
          val hs = headSize(e)
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            (0 until k).map(i => decodeValue(e, d, off, off + i * hs)).toArray)
        case TupleT(ms) =>
          var p = off
          InternalRow.fromSeq(ms.map { m =>
            val v = decodeValue(m, d, off, p); p += headSize(m); v
          })
        case other => throw new IllegalStateException(s"unexpected dynamic type: $other")
      }
    }
  }

  /** Decode (topics, data) per the event; null on any mismatch. */
  def decode(event: Event, topics: Seq[Array[Byte]], data: Array[Byte]): InternalRow = {
    try {
      if (topics.isEmpty || topics.length != 1 + event.indexedParams.length) return null
      if (!java.util.Arrays.equals(topics.head, event.topic0)) return null
      val d = if (data == null) Array.emptyByteArray else data
      var topicIdx = 1
      var headPos = 0
      val values = event.params.map { p =>
        if (p.indexed) {
          val word = topics(topicIdx); topicIdx += 1
          if (word.length != 32) return null
          p.typ match {
            // dynamic/array/tuple topics carry only the keccak of the value
            case BytesT | StringT | _: ArrayT | _: TupleT => word
            case t => decodeWord(t, word)
          }
        } else {
          val v = decodeValue(p.typ, d, 0, headPos)
          headPos += headSize(p.typ)
          v
        }
      }
      InternalRow.fromSeq(values)
    } catch {
      case _: ArithmeticException => null // value exceeds declared bit width
      case _: IndexOutOfBoundsException => null
      case _: IllegalArgumentException => null // inverted copy ranges
      case _: NegativeArraySizeException => null
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
    // TRAILING nulls trim (callers legally pass fixed-width
    // [topic0..topic3] arrays padded with nulls); an INTERIOR null is a
    // corrupt log and must fail the row, not decode the prefix as if
    // the topic count matched (takeWhile previously conflated the two)
    val all = (0 until arr.numElements()).map { i =>
      if (arr.isNullAt(i)) null else arr.getBinary(i)
    }
    val topics = all.reverse.dropWhile(_ == null).reverse
    if (topics.exists(_ == null)) return null
    val data = right.eval(input).asInstanceOf[Array[Byte]]
    Abi.decode(event, topics, data)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DecodeEvent =
    copy(left = l, right = r)
  override def prettyName: String = "decode_event"
}
