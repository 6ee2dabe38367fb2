package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Keccak-256 (the pre-NIST-padding variant used by Ethereum).
  *
  * Pure-JVM implementation of Keccak-f[1600] with rate 1088 / capacity 512
  * and the original 0x01 domain padding (SHA3-256 uses 0x06 — not this).
  * Public algorithm per the Keccak reference specification.
  *
  * Mirrors the reference's keccak usages (hash of call data / code):
  * cryo datasets/eth_calls.rs:79-81, datasets/contracts.rs:101-102.
  */
object Keccak {
  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rotation offsets, indexed [x][y]
  private val ROT: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),
    Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  private def keccakF(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        val d = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d; y += 1 }
        x += 1
      }
      // rho + pi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), ROT(x)(y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^
            (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }

  /** keccak256 digest of arbitrary bytes. */
  def hash(input: Array[Byte]): Array[Byte] = {
    val rate = 136 // bytes
    val state = new Array[Long](25)
    val padLen = rate - (input.length % rate)
    val padded = new Array[Byte](input.length + padLen)
    System.arraycopy(input, 0, padded, 0, input.length)
    padded(input.length) = 0x01.toByte
    padded(padded.length - 1) = (padded(padded.length - 1) | 0x80).toByte
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < rate / 8) {
        var lane = 0L
        var j = 7
        while (j >= 0) {
          lane = (lane << 8) | (padded(off + i * 8 + j) & 0xffL)
          j -= 1
        }
        state(i) ^= lane
        i += 1
      }
      keccakF(state)
      off += rate
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = ((state(i) >>> (8 * j)) & 0xff).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  def hash(s: String): Array[Byte] =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def hex(b: Array[Byte]): String = "0x" + b.map("%02x".format(_)).mkString
}

/** Catalyst expression: keccak256(binary) → 32-byte binary. Null-safe;
  * CodegenFallback (the hash body dominates cost; interpreted dispatch is
  * noise, and the surrounding operators still run in whole-stage codegen).
  */
case class Keccak256(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    Keccak.hash(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Keccak256 = copy(c)
  override def prettyName: String = "keccak256"
}

object Keccak256 {
  /** Column-level API: keccak256 over a BinaryType column. */
  def keccak256(c: Column): Column =
    GraftSql.column(Keccak256(GraftSql.expression(c)))
}
