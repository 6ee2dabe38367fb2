package graft

import graft.chain.BlockSyntax
import graft.sources.RpcCodec
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based invariants for the driver-side parsing/chunking layer
  * (complementing the example-based suites ported from the reference's
  * unit tests). */
object GraftProps extends Properties("graft") {

  private val rangeGen: Gen[BlockSyntax.Range] = for {
    start <- Gen.chooseNum(0L, 50_000_000L)
    len <- Gen.chooseNum(1L, 100_000L)
  } yield BlockSyntax.Range(start, start + len)

  // subchunks tile the range: contiguous, disjoint, covering
  property("subchunk tiles the range exactly") =
    forAll(rangeGen, Gen.chooseNum(1L, 10_000L)) { (r, size) =>
      val chunks = BlockSyntax.subchunk(r, size)
      val contiguous = chunks.zip(chunks.tail).forall { case (a, b) =>
        a.endExclusive == b.start
      }
      chunks.head.start == r.start &&
        chunks.last.endExclusive == r.endExclusive &&
        contiguous &&
        chunks.forall(c => c.endExclusive - c.start <= size) &&
        chunks.map(c => c.endExclusive - c.start).sum == r.endExclusive - r.start
    }

  // div_ceil sizing yields AT MOST n chunks (ceil(total/ceil(total/n))
  // can undershoot n — e.g. 487 blocks / 53 chunks → size 10 → 49
  // chunks), always covering the range — the reference's semantics
  // (subchunks.rs:28-32 recomputes from the derived size, same as here).
  property("subchunkByCount yields at most n covering chunks") =
    forAll(rangeGen, Gen.chooseNum(1, 64)) { (r, n) =>
      // shrinking may escape the generator's bounds — invalid n rejects
      (n >= 1) ==> {
        val chunks = BlockSyntax.subchunkByCount(r, n)
        val total = r.endExclusive - r.start
        chunks.size <= math.min(n.toLong, total) &&
          chunks.head.start == r.start &&
          chunks.last.endExclusive == r.endExclusive &&
          chunks.map(c => c.endExclusive - c.start).sum == total
      }
    }

  // aligned subchunks snap interior boundaries to multiples of size
  property("aligned subchunk boundaries are multiples of size") =
    forAll(rangeGen, Gen.chooseNum(1L, 10_000L)) { (r, size) =>
      val chunks = BlockSyntax.subchunk(r, size, align = true)
      chunks.isEmpty || chunks.zip(chunks.tail).forall { case (a, b) =>
        a.endExclusive == b.start && b.start % size == 0
      }
    }

  private val hexStr: Gen[String] = for {
    n <- Gen.chooseNum(0, 64)
    cs <- Gen.listOfN(n, Gen.oneOf("0123456789abcdef".toSeq))
    pre <- Gen.oneOf("0x", "")
  } yield pre + cs.mkString

  property("parseHexBytes round-trips through hex formatting") =
    forAll(hexStr) { s =>
      val bytes = RpcCodec.parseHexBytes(s)
      val canonical = {
        val h = s.stripPrefix("0x")
        if (h.length % 2 == 1) "0" + h else h
      }
      bytes.map("%02x".format(_)).mkString == canonical
    }

  property("parseHexU256 is 32 bytes preserving the value") =
    forAll(Gen.chooseNum(0L, Long.MaxValue)) { v =>
      val b = RpcCodec.parseHexU256("0x" + java.lang.Long.toHexString(v))
      b.length == 32 && new java.math.BigInteger(1, b).longValueExact() == v
    }

  // the JS-tracer escaper must always yield valid JSON that round-trips
  // the tracer source verbatim
  property("debugTraceBlockJsRequest escapes any tracer source") =
    forAll(Gen.asciiStr, Gen.chooseNum(0L, 1_000_000L)) { (js, bn) =>
      val req = RpcCodec.debugTraceBlockJsRequest(1, bn, js)
      val parsed = JsonMethods.parse(req)
      val JArray(params) = (parsed \ "params"): @unchecked
      (params(1) \ "tracer") match {
        case JString(back) => back == js
        case _ => false
      }
    }

  property("u256 bytes32 round-trips any 256-bit value") =
    forAll(Gen.listOfN(32, Gen.chooseNum(0, 255))) { byteVals =>
      val bi = new java.math.BigInteger(1, byteVals.map(_.toByte).toArray)
      val b = graft.functions.U256.toBytes32(bi)
      b.length == 32 && new java.math.BigInteger(1, b) == bi
    }

  property("block range grammar parses a:b for any bounds") =
    forAll(Gen.chooseNum(0L, 1_000_000_000L), Gen.chooseNum(1L, 1_000_000L)) {
      (a, len) =>
        BlockSyntax.parse(s"$a:${a + len}", latest = 0) ==
          BlockSyntax.Range(a, a + len)
    }

  // every request builder emits parseable JSON-RPC with the right method
  property("request builders emit valid JSON-RPC") = Prop.all(
    Seq(
      RpcCodec.getBlockRequest(1, 5, fullTxs = true) -> "eth_getBlockByNumber",
      RpcCodec.getBlockReceiptsRequest(2, 5) -> "eth_getBlockReceipts",
      RpcCodec.traceBlockRequest(3, 5) -> "trace_block",
      RpcCodec.traceReplayBlockRequest(4, 5) -> "trace_replayBlockTransactions",
      RpcCodec.traceReplayBlockVmRequest(5, 5) -> "trace_replayBlockTransactions",
      RpcCodec.traceCallRequest(6, "0xaa", "0xbb", 5) -> "trace_call",
      RpcCodec.ethCallRequest(7, "0xaa", "0xbb", 5) -> "eth_call",
      RpcCodec.debugTraceBlockRequest(8, 5, Some("callTracer")) -> "debug_traceBlockByNumber",
      RpcCodec.debugTraceBlockOpcodeRequest(9, 5) -> "debug_traceBlockByNumber",
      RpcCodec.getBalanceRequest(10, "0xaa", 5) -> "eth_getBalance",
      RpcCodec.getStorageAtRequest(11, "0xaa", "0x1", 5) -> "eth_getStorageAt")
      .map { case (req, method) =>
        Prop.propBoolean {
          (JsonMethods.parse(req) \ "method") == JString(method)
        }
      }: _*)

  // BPE encoder invariant: under ANY merge-rank table, segments only
  // ever concatenate adjacent symbols — so they reassemble to the word
  // (plus the end marker) and every segmentation is a partition
  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val ranksGen: Gen[Map[(String, String), Int]] = for {
    n <- Gen.chooseNum(0, 12)
    syms = Seq("a", "b", "c", "ab", "bc", "ca", "aa", graft.queries.TextOps.BpeEnd)
    pairs <- Gen.listOfN(n, Gen.zip(Gen.oneOf(syms), Gen.oneOf(syms)))
  } yield pairs.distinct.zipWithIndex.toMap
  property("bpe segments partition the word under any merge table") =
    forAll(wordGen, ranksGen) { (w, ranks) =>
      val segs = graft.queries.TextOps.bpeSegment(w, ranks)
      segs.mkString == w + graft.queries.TextOps.BpeEnd && segs.nonEmpty
    }
}
