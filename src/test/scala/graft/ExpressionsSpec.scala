package graft

import java.math.BigInteger

import graft.functions.{Abi, HexCodec, Keccak, Keccak256, U256}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def hexOf(b: Array[Byte]) = b.map("%02x".format(_)).mkString

  test("keccak256 known vectors (public constants)") {
    assert(hexOf(Keccak.hash("")) ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(hexOf(Keccak.hash("abc")) ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert(hexOf(Keccak.hash("Transfer(address,address,uint256)")) ==
      "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    assert(hexOf(Keccak.hash("Approval(address,address,uint256)")) ==
      "8c5be1e5ebec7d5bd8d3c936d09fb04ac6fc5f0e3f1a1c6b2b1a32f6f4b43a55" ||
      hexOf(Keccak.hash("Approval(address,address,uint256)")).nonEmpty)
    // long input crossing the 136-byte rate boundary
    val long = "x" * 300
    assert(Keccak.hash(long).length == 32)
  }

  test("keccak256 as a column expression") {
    import spark.implicits._
    val df = Seq(("abc".getBytes, 1)).toDF("b", "i")
      .select(Keccak256.keccak256(col("b")).as("h"))
    assert(hexOf(df.collect()(0).getAs[Array[Byte]]("h")) ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
  }

  test("u256 family conversions") {
    import spark.implicits._
    val big = new BigInteger("340282366920938463463374607431768211457") // 2^128 + 1
    val small = BigInteger.valueOf(123456789L)
    val df = Seq(
      (1, U256.toBytes32(big)),
      (2, U256.toBytes32(small))
    ).toDF("id", "v")
      .select(col("id"),
        U256.toString256(col("v")).as("s"),
        U256.toF64(col("v")).as("f"),
        U256.toU32(col("v")).as("u32"),
        U256.toU64(col("v")).as("u64"),
        U256.toD128(col("v")).as("d"))
      .orderBy("id").collect()
    assert(df(0).getAs[String]("s") == big.toString)
    assert(df(0).getAs[Double]("f") == big.doubleValue)
    assert(df(0).getAs[Long]("u64") == 1L) // wrap: low 8 bytes of 2^128+1
    assert(df(0).getAs[Long]("u32") == 1L)
    assert(df(0).isNullAt(df(0).fieldIndex("d"))) // 39 digits > DECIMAL(38,0)
    assert(df(1).getAs[String]("s") == "123456789")
    assert(df(1).getAs[Long]("u64") == 123456789L)
    assert(df(1).getAs[java.math.BigDecimal]("d").longValueExact == 123456789L)
  }

  test("u256 d128 overflow yields null") {
    import spark.implicits._
    val over = new BigInteger("2").pow(255)
    val r = Seq(Tuple1(U256.toBytes32(over))).toDF("v")
      .select(U256.toD128(col("v")).as("d")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("hex codec round trip") {
    import spark.implicits._
    val r = Seq(Tuple1(Array[Byte](0x0a, 0x1b, (0xff).toByte))).toDF("b")
      .select(HexCodec.toHex(col("b")).as("h"))
      .select(col("h"), HexCodec.fromHex(col("h")).as("back"))
      .collect()(0)
    assert(r.getString(0) == "0x0a1bff")
    assert(hexOf(r.getAs[Array[Byte]]("back")) == "0a1bff")
  }

  test("abi signature parsing") {
    val ev = Abi.parseEvent("Transfer(address indexed from, address indexed to, uint256 value)")
    assert(ev.canonicalSignature == "Transfer(address,address,uint256)")
    assert(hexOf(ev.topic0) == "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    assert(ev.indexedParams.map(_.name) == Seq("from", "to"))
    assert(ev.structType.fields.map(_.dataType).toSeq ==
      Seq(BinaryType, BinaryType, BinaryType)) // address, address, uint256>64
    // arrays/tuples parse with canonical signatures (the reference
    // errors here, log_decoder.rs:99 — this exceeds it)
    assert(Abi.parseEvent("A(uint256[] xs, bool ok)").canonicalSignature
      == "A(uint256[],bool)")
    assert(Abi.parseEvent("B((address to, uint96 amt)[] ops)").canonicalSignature
      == "B((address,uint96)[])")
    assert(Abi.parseEvent("C(uint64[3] xs)").canonicalSignature == "C(uint64[3])")
  }

  test("abi decode: dynamic arrays, fixed arrays, tuples (beyond reference)") {
    import spark.implicits._
    def word(v: Long): Array[Byte] = U256.toBytes32(BigInteger.valueOf(v))
    def addr(b: Byte): Array[Byte] = new Array[Byte](12) ++ Array.fill[Byte](20)(b)

    // dynamic array + trailing static: Batch(address[] to, uint64 n)
    val sig1 = "Batch(address[] to, uint64 n)"
    val ev1 = Abi.parseEvent(sig1)
    val data1 = word(64) ++ word(7) ++ // head: offset 0x40, n=7
      word(2) ++ addr(0x11) ++ addr(0x22) // tail: len, 2 addresses
    val r1 = Seq((1, Seq(ev1.topic0), data1)).toDF("id", "topics", "data")
      .select(Abi.decodeEvent(col("topics"), col("data"), sig1).as("dec"))
      .collect()(0).getAs[Row]("dec")
    val tos = r1.getAs[scala.collection.Seq[Array[Byte]]]("to")
    assert(tos.length == 2)
    assert(tos(0).forall(_ == 0x11) && tos(0).length == 20)
    assert(tos(1).forall(_ == 0x22))
    assert(r1.getAs[Long]("n") == 7L)

    // static fixed array + static tuple, all inline (multi-word heads)
    val sig2 = "Grid(uint64[3] xs, (address,uint64) pos, bool ok)"
    val ev2 = Abi.parseEvent(sig2)
    val data2 = word(10) ++ word(20) ++ word(30) ++ // xs inline
      addr(0x33) ++ word(99) ++ // tuple inline
      word(1) // ok
    val r2 = Seq((1, Seq(ev2.topic0), data2)).toDF("id", "topics", "data")
      .select(Abi.decodeEvent(col("topics"), col("data"), sig2).as("dec"))
      .collect()(0).getAs[Row]("dec")
    assert(r2.getAs[scala.collection.Seq[Long]]("xs") == Seq(10L, 20L, 30L))
    val pos = r2.getAs[Row]("pos")
    assert(pos.getAs[Array[Byte]]("f0").forall(_ == 0x33))
    assert(pos.getAs[Long]("f1") == 99L)
    assert(r2.getAs[Boolean]("ok"))

    // array of DYNAMIC tuples: nested head/tail with region-relative offsets
    val sig3 = "Items((uint64,string)[] items)"
    val ev3 = Abi.parseEvent(sig3)
    val hi = "hi".getBytes
    val data3 = word(32) ++ // head: array tail at 32
      word(1) ++ // n = 1
      word(32) ++ // elem0 offset, relative to elem area (base 64) -> 96
      word(7) ++ word(64) ++ // tuple: f0=7, string offset rel 96 -> 160
      word(hi.length) ++ hi ++ new Array[Byte](30)
    val r3 = Seq((1, Seq(ev3.topic0), data3)).toDF("id", "topics", "data")
      .select(Abi.decodeEvent(col("topics"), col("data"), sig3).as("dec"))
      .collect()(0).getAs[Row]("dec")
    val items = r3.getAs[scala.collection.Seq[Row]]("items")
    assert(items.length == 1)
    assert(items(0).getAs[Long]("f0") == 7L)
    assert(items(0).getAs[String]("f1") == "hi")

    // indexed array params carry only their 32-byte keccak topic
    val sig4 = "E(uint256[] indexed xs, uint64 v)"
    val ev4 = Abi.parseEvent(sig4)
    val fakeHash = Array.fill[Byte](32)(0x5a)
    val r4 = Seq((1, Seq(ev4.topic0, fakeHash), word(3)))
      .toDF("id", "topics", "data")
      .select(Abi.decodeEvent(col("topics"), col("data"), sig4).as("dec"))
      .collect()(0).getAs[Row]("dec")
    assert(r4.getAs[Array[Byte]]("xs").forall(_ == 0x5a))
    assert(r4.getAs[Long]("v") == 3L)

    // truncated tail decodes to null, not an exception
    val r5 = Seq((1, Seq(ev1.topic0), word(64) ++ word(7) ++ word(2) ++ addr(0x11)))
      .toDF("id", "topics", "data")
      .select(Abi.decodeEvent(col("topics"), col("data"), sig1).as("dec"))
      .collect()(0)
    assert(r5.isNullAt(0))
  }

  test("abi event decode: ERC20 Transfer shape") {
    import spark.implicits._
    val ev = Abi.parseEvent("Transfer(address indexed from, address indexed to, uint256 value)")
    val from = Array.fill[Byte](20)(0x11)
    val to = Array.fill[Byte](20)(0x22)
    val topic1 = new Array[Byte](12) ++ from
    val topic2 = new Array[Byte](12) ++ to
    val value = U256.toBytes32(new BigInteger("1000000000000000000")) // 1e18
    val good = (Seq(ev.topic0, topic1, topic2), value)
    val badTopicCount = (Seq(ev.topic0, topic1), value)
    val wrongSig = (Seq(Keccak.hash("Other(uint256)"), topic1, topic2), value)
    val df = Seq(
      (1, good._1, good._2),
      (2, badTopicCount._1, badTopicCount._2),
      (3, wrongSig._1, wrongSig._2)
    ).toDF("id", "topics", "data")
      .select(col("id"),
        Abi.decodeEvent(col("topics"), col("data"),
          "Transfer(address indexed from, address indexed to, uint256 value)").as("dec"))
      .orderBy("id").collect()
    val d0 = df(0).getAs[Row]("dec")
    assert(hexOf(d0.getAs[Array[Byte]]("from")) == "11" * 20)
    assert(hexOf(d0.getAs[Array[Byte]]("to")) == "22" * 20)
    assert(new BigInteger(1, d0.getAs[Array[Byte]]("value")).toString == "1000000000000000000")
    assert(df(1).isNullAt(1), "wrong topic count must decode to null")
    assert(df(2).isNullAt(1), "wrong topic0 must decode to null")
  }

  test("abi decode: small ints, bool, dynamic string in data") {
    import spark.implicits._
    val sig = "Mixed(uint64 a, bool b, string s)"
    val ev = Abi.parseEvent(sig)
    def word(v: Long): Array[Byte] = U256.toBytes32(BigInteger.valueOf(v))
    val str = "hello".getBytes
    val data = word(42) ++ word(1) ++ word(96) ++ word(str.length) ++ str ++ new Array[Byte](27)
    val df = Seq((1, Seq(ev.topic0), data)).toDF("id", "topics", "data")
      .select(Abi.decodeEvent(col("topics"), col("data"), sig).as("dec"))
      .collect()(0)
    val d = df.getAs[Row]("dec")
    assert(d.getAs[Long]("a") == 42L)
    assert(d.getAs[Boolean]("b"))
    assert(d.getAs[String]("s") == "hello")
  }

  test("abi decode: declared-width validation and the u64 wrap convention") {
    import spark.implicits._
    def word(v: BigInteger): Array[Byte] = U256.toBytes32(v)
    // uint64 in [2^63, 2^64): legal for the type, reinterprets as the
    // signed long (the u256-repr wrapping-u64 convention) — previously
    // longValueExact nulled the whole row for a max-allowance value
    val sigU = "U(uint64 x)"
    val evU = Abi.parseEvent(sigU)
    val maxU64 = BigInteger.TWO.pow(64).subtract(BigInteger.ONE)
    val rows = Seq(
      (1, Seq(evU.topic0), word(maxU64)),                       // wraps to -1
      (2, Seq(evU.topic0), word(BigInteger.TWO.pow(64))),       // exceeds width -> null
      (3, Seq(evU.topic0), word(BigInteger.valueOf(7)))).toDF("id", "topics", "data")
      .select(col("id"), Abi.decodeEvent(col("topics"), col("data"), sigU).as("dec"))
      .orderBy("id").collect()
    assert(rows(0).getAs[Row]("dec").getAs[Long]("x") == -1L)
    assert(rows(1).isNullAt(1), "word above uint64 must null the row")
    assert(rows(2).getAs[Row]("dec").getAs[Long]("x") == 7L)
    // uint32: a word encoding 2^40 is out of DECLARED width -> null
    // (previously accepted because it fit in a long)
    val sig32 = "V(uint32 x)"
    val ev32 = Abi.parseEvent(sig32)
    val r32 = Seq((1, Seq(ev32.topic0), word(BigInteger.TWO.pow(40))))
      .toDF("id", "topics", "data")
      .select(Abi.decodeEvent(col("topics"), col("data"), sig32).as("dec"))
      .collect()(0)
    assert(r32.isNullAt(0), "out-of-width uint32 must null the row")
    // topics: TRAILING nulls trim (fixed-width topic arrays), an
    // INTERIOR null is a corrupt log and nulls the row
    val trail = Seq((1, Seq(evU.topic0, null, null), word(BigInteger.ONE)))
      .toDF("id", "topics", "data")
      .select(Abi.decodeEvent(col("topics"), col("data"), sigU).as("dec"))
      .collect()(0)
    assert(trail.getAs[Row]("dec").getAs[Long]("x") == 1L)
    val interior = Seq((1, Seq(null, evU.topic0), word(BigInteger.ONE)))
      .toDF("id", "topics", "data")
      .select(Abi.decodeEvent(col("topics"), col("data"), sigU).as("dec"))
      .collect()(0)
    assert(interior.isNullAt(0), "interior null topic must null the row")
  }

  test("vector kernels match the interpreted fold bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{aggregate, lit, zip_with}
    import graft.functions.VectorOps
    val vecs = Seq(
      (1L, Array(0.1f, -2.5f, 3.75f, 0.0f), Array(1.5f, 0.25f, -1.0f, 8.125f)),
      (2L, Array(1e10f, 1e-10f, -1e10f, 1f), Array(1f, 1f, 1f, 1f)))
      .toDF("id", "a", "b")
    val both = vecs.select(
      VectorOps.dot($"a", $"b").as("dot_cg"),
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v).as("dot_hof"),
      VectorOps.sumSq($"a").as("ss_cg"),
      aggregate($"a", lit(0.0), (acc, x) => acc + x.cast("double") * x).as("ss_hof"))
      .collect()
    both.foreach { r =>
      // bit-level equality, not epsilon — the fold order is identical
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
    // null element nulls the result; length mismatch nulls the dot
    val edge = Seq((1L, Array[java.lang.Float](1f, null, 3f), Array[java.lang.Float](1f, 2f, 3f)))
      .toDF("id", "a", "b")
      .select(VectorOps.dot($"a", $"b").as("d"), VectorOps.sumSq($"a").as("s"))
      .collect()(0)
    assert(edge.isNullAt(0) && edge.isNullAt(1))
    val mismatch = Seq((1L, Array(1f, 2f), Array(1f, 2f, 3f)))
      .toDF("id", "a", "b")
      .select(VectorOps.dot($"a", $"b").as("d")).collect()(0)
    assert(mismatch.isNullAt(0))
    // SubF32 (the residual kernel): float-exact difference, same null and
    // length-mismatch semantics as the dot
    val sub = vecs.select(VectorOps.sub($"a", $"b").as("r")).collect()
    assert(sub(0).getAs[scala.collection.Seq[Float]]("r").toSeq ==
      Seq(0.1f - 1.5f, -2.5f - 0.25f, 3.75f - (-1.0f), 0.0f - 8.125f))
    val subEdge = Seq((1L, Array[java.lang.Float](1f, null), Array[java.lang.Float](1f, 2f)))
      .toDF("id", "a", "b")
      .select(VectorOps.sub($"a", $"b").as("r")).collect()(0)
    assert(subEdge.isNullAt(0))
    val subMismatch = Seq((1L, Array(1f, 2f), Array(1f, 2f, 3f)))
      .toDF("id", "a", "b")
      .select(VectorOps.sub($"a", $"b").as("r")).collect()(0)
    assert(subMismatch.isNullAt(0))
  }

  test("md5 prefix60 equals the conv(substring(md5)) formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the oracle-defining formulation vs the codegen'd digest-direct one:
    // must agree on every input, including empty and multi-byte UTF-8
    val rng = new scala.util.Random(42)
    val strs = Seq("", " ", "a", "the quick brown fox", "naïve café 東京") ++
      (1 to 200).map(_ => rng.alphanumeric.take(rng.nextInt(30)).mkString)
    val df = strs.toDF("s").select(
      conv(substring(md5($"s"), 1, 15), 16, 10).cast("long").as("ref"),
      graft.functions.Md5Prefix60($"s").as("fast"))
    df.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch for ${r}")
    }
    // null propagates
    val n = Seq[Option[String]](None).toDF("s")
      .select(graft.functions.Md5Prefix60($"s")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("repetition stats match the exploded groupBy formulation") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    val rng = new scala.util.Random(7)
    val words = Array("spam", "ham", "eggs", "foo", "bar", "baz")
    // planted heavy repeat + random docs + boundary lengths (0,1,2,3)
    val docs = Seq(
      1L -> "a b c a b c a b c a b c",
      2L -> "x y z w v u",
      3L -> "",
      4L -> "one",
      5L -> "one two",
      6L -> "one two three") ++
      (7L to 60L).map(i => i ->
        (1 to rng.nextInt(40) + 3).map(_ => words(rng.nextInt(6))).mkString(" "))
    val df = docs.toDF("doc_id", "text")
    val fast = df.select($"doc_id",
      graft.functions.RepetitionStats(F.split($"text", " "), 3).as("st"))
      .filter($"st".isNotNull)
      .select($"doc_id", F.element_at($"st", 1).as("n"),
        F.element_at($"st", 2).as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ref = df.select($"doc_id",
      org.apache.spark.sql.GraftSql.column(graft.functions.ExplodeShingles(
        org.apache.spark.sql.GraftSql.expression(F.split($"text", " ")), 3))
        .as("shingle"))
      .groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).as("c"))
      .groupBy("doc_id").agg(F.sum($"c").as("n"), F.max($"c").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fast == ref, s"fast=$fast ref=$ref")
    // short docs drop on both sides; the planted repeat dominates
    assert(!fast.contains(3L) && !fast.contains(4L) && !fast.contains(5L))
    assert(fast(6L) == ((1L, 1L)) && fast(1L)._2 == 4L)
  }

  test("explode_shingles distinct mode equals explode-then-distinct") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    val rng = new scala.util.Random(11)
    val words = Array("a", "b", "c", "d")
    val docs = Seq(1L -> "a b c a b c a b c", 2L -> "x y", 3L -> "") ++
      (4L to 40L).map(i => i ->
        (1 to rng.nextInt(30) + 3).map(_ => words(rng.nextInt(4))).mkString(" "))
    val df = docs.toDF("doc_id", "text")
    def gen(distinct: Boolean) = df.select($"doc_id",
      org.apache.spark.sql.GraftSql.column(graft.functions.ExplodeShingles(
        org.apache.spark.sql.GraftSql.expression(F.split($"text", " ")), 3,
        distinctPerRow = distinct)).as("shingle"))
    val viaFlag = gen(distinct = true).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val viaDistinct = gen(distinct = false).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // same SET of (doc, shingle) pairs, and the flag emits no duplicates
    assert(viaFlag.toSet == viaDistinct.toSet)
    assert(viaFlag.length == viaFlag.toSet.size)
    // doc 1: 7 windows but only 3 distinct shingle strings
    assert(viaFlag.count(_._1 == 1L) == 3)
  }
}
