package graft

import java.nio.file.{Files, Paths}

import graft.chain.{BlockSyntax, Freeze, Lake}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frozen-lake read-back (Lake.scala): filename parsing, planning-time
  * file pruning, format handling, and round-trip fidelity against the
  * fixture bronzes. */
class LakeSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val FixDir = "/root/repo/fixtures/chain"

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def freeze(out: String, datasets: Seq[String],
      blocks: BlockSyntax.Blocks = BlockSyntax.Range(1000, 1060),
      chunkSize: Long = 20, format: String = "parquet",
      label: Option[String] = None,
      subdirs: Seq[String] = Seq.empty,
      partitionBy: Option[String] = None): Freeze.FreezeResult =
    Freeze.freeze(spark, FixDir, Freeze.FreezeSpec(
      datasets = datasets, blocks = blocks, chunkSize = chunkSize,
      outputDir = out, format = format, label = label, subdirs = subdirs,
      partitionBy = partitionBy, noReport = true, maxConcurrentChunks = 1))

  test("parseFileName handles plain, labeled, dim-stubbed and foreign names") {
    val p = Lake.parseFileName(
      Paths.get("ethereum__blocks__00001000_to_00001019.parquet")).get
    assert(p.network == "ethereum" && p.dataset == "blocks")
    assert(p.start == 1000L && p.endInclusive == 1019L)
    assert(p.tags.isEmpty && p.format == "parquet")

    val lab = Lake.parseFileName(Paths.get(
      "polygon_zkevm__erc20_transfers__v2__00000000_to_00000999.csv")).get
    assert(lab.network == "polygon_zkevm")
    assert(lab.dataset == "erc20_transfers")
    assert(lab.tags == Seq("v2") && lab.format == "csv")

    // label + binary partition-dim stub, both between dataset and range
    val dim = Lake.parseFileName(Paths.get(
      "ethereum__logs__run1__deadbeef__00001000_to_00001999.json")).get
    assert(dim.tags == Seq("run1", "deadbeef"))

    // foreign files and freeze metadata never parse
    assert(Lake.parseFileName(Paths.get("report.json")).isEmpty)
    assert(Lake.parseFileName(Paths.get("remembered_command.json")).isEmpty)
    assert(Lake.parseFileName(Paths.get("part-00000.snappy.parquet")).isEmpty)
    assert(Lake.parseFileName(
      Paths.get("ethereum__blocks__bad_range.parquet")).isEmpty)
  }

  test("block-range read prunes files at planning time and rows exactly") {
    val out = freshDir("lake_prune_")
    freeze(out, Seq("blocks"), chunkSize = 10) // 6 files
    assert(Lake.listChunks(out).size == 6)

    // [1015, 1045) overlaps chunks 1010,1020,1030,1040 — exactly 4 files
    val sel = Lake.select(out, "blocks",
      Some(BlockSyntax.Range(1015, 1045)))
    assert(sel.size == 4)
    assert(sel.map(_.start).sorted == Seq(1010L, 1020L, 1030L, 1040L))

    val df = Lake.read(spark, out, "blocks",
      Some(BlockSyntax.Range(1015, 1045)))
    // the SCAN itself only touches the 4 overlapping files
    assert(df.inputFiles.length == 4)
    val got = df.agg(count(lit(1)), min("block_number"), max("block_number"))
      .head()
    assert(got.getLong(0) == 30L)
    assert(got.getInt(1) == 1015 && got.getInt(2) == 1044)
  }

  test("block-number list reads only the containing chunks") {
    val out = freshDir("lake_numbers_")
    freeze(out, Seq("blocks"), chunkSize = 10)
    val blocks = BlockSyntax.Numbers(Seq(1003L, 1057L))
    val sel = Lake.select(out, "blocks", Some(blocks))
    assert(sel.map(_.start).sorted == Seq(1000L, 1050L))
    val rows = Lake.read(spark, out, "blocks", Some(blocks))
      .select("block_number").collect().map(_.getInt(0)).sorted
    assert(rows.toSeq == Seq(1003, 1057))
  }

  test("dataset alias, network filter and mixed-dataset directories") {
    val out = freshDir("lake_mixed_")
    freeze(out, Seq("blocks", "transactions"), chunkSize = 30)
    // alias resolves through the registry; other datasets don't leak in
    val txs = Lake.read(spark, out, "txs", network = Some("ethereum"))
    assert(txs.columns.contains("transaction_hash"))
    assert(Lake.select(out, "txs", network = Some("polygon")).isEmpty)
    assert(Lake.select(out, "blocks").size == 2)
  }

  test("subdirs layouts are walked; dot-dirs are skipped") {
    val out = freshDir("lake_subdirs_")
    Freeze.freeze(spark, FixDir, Freeze.FreezeSpec(
      datasets = Seq("blocks"), blocks = BlockSyntax.Range(1000, 1060),
      chunkSize = 30, outputDir = out, subdirs = Seq("datatype", "network"),
      maxConcurrentChunks = 1)) // report ON: .graft must be skipped
    val chunks = Lake.listChunks(out)
    assert(chunks.size == 2)
    assert(chunks.forall(_.path.contains("blocks/ethereum/")))
    assert(Lake.read(spark, out, "blocks").count() == 60L)
  }

  test("round trip is lossless vs the direct silver, parquet and csv") {
    val out = freshDir("lake_roundtrip_")
    freeze(out, Seq("blocks"), chunkSize = 20)
    val direct = graft.chain.ChainDatasets.blocks(spark, FixDir)
    val back = Lake.read(spark, out, "blocks")
    assert(back.schema == direct.schema)
    assert(back.exceptAll(direct).isEmpty && direct.exceptAll(back).isEmpty)

    // csv lake: freeze hex-encodes binaries; read back with the explicit
    // schema (the pipeline path) and compare against the hexified silver
    val outCsv = freshDir("lake_csv_")
    freeze(outCsv, Seq("blocks"), chunkSize = 20, format = "csv")
    val hexDirect = graft.chain.Freeze.collect(spark, FixDir, "blocks",
      BlockSyntax.Range(1000, 1060), hex = true)
    val backCsv = Lake.read(spark, outCsv, "blocks",
      schema = Some(hexDirect.schema))
    assert(backCsv.count() == 60L)
    assert(backCsv.exceptAll(hexDirect).isEmpty)
  }

  test("partitioned lake: tag filter selects one dim value's files") {
    val out = freshDir("lake_dim_")
    freeze(out, Seq("transactions"), chunkSize = 30,
      partitionBy = Some("from_address"))
    val all = Lake.listChunks(out)
    assert(all.nonEmpty && all.forall(_.tags.size == 1))
    val oneTag = all.head.tags.head
    val sel = Lake.select(out, "transactions", tag = Some(oneTag))
    assert(sel.nonEmpty && sel.size < all.size)
    val df = Lake.read(spark, out, "transactions", tag = Some(oneTag))
    // every row's sender starts with the 4-byte stub the filename carries
    val pref = df.select(hex(expr("substring(from_address, 1, 4)")))
      .distinct().collect().map(_.getString(0).toLowerCase)
    assert(pref.toSeq == Seq(oneTag))
  }

  test("readStream tails a lake: appended chunk files arrive incrementally") {
    val out = freshDir("lake_stream_")
    freeze(out, Seq("blocks", "transactions"),
      blocks = BlockSyntax.Range(1000, 1020), chunkSize = 20)
    val schema = Lake.read(spark, out, "blocks").schema
    val stream = Lake.readStream(spark, out, "blocks", schema)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory")
      .queryName("lake_tail").outputMode("append").start()
    try {
      q.processAllAvailable()
      // only the blocks chunk is in the stream — transactions filtered
      // by the filename glob at listing time
      assert(spark.sql("select count(*) from lake_tail").head().getLong(0) == 20L)
      // a live freeze appends two more chunks; the stream picks them up
      freeze(out, Seq("blocks"), blocks = BlockSyntax.Range(1020, 1060),
        chunkSize = 20)
      q.processAllAvailable()
      val got = spark.sql(
        "select count(*), min(block_number), max(block_number) from lake_tail")
        .head()
      assert(got.getLong(0) == 60L)
      assert(got.getInt(1) == 1000 && got.getInt(2) == 1059)
    } finally q.stop()
  }

  test("mixed-format and empty selections fail loudly") {
    val out = freshDir("lake_formats_")
    freeze(out, Seq("blocks"), blocks = BlockSyntax.Range(1000, 1030),
      chunkSize = 30)
    freeze(out, Seq("blocks"), blocks = BlockSyntax.Range(1030, 1060),
      chunkSize = 30, format = "json")
    val eMixed = intercept[IllegalArgumentException] {
      Lake.read(spark, out, "blocks")
    }
    assert(eMixed.getMessage.contains("mixed formats"))
    val eEmpty = intercept[IllegalArgumentException] {
      Lake.read(spark, out, "traces")
    }
    assert(eEmpty.getMessage.contains("no chunk files"))
  }
}
