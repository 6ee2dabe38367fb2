package graft

import graft.chain.{BlockSyntax, Datatypes, Freeze}
import org.apache.spark.sql.SparkSession

/** CLI surface mirroring the reference's flag vocabulary
  * (cryo cli/args.rs:20-267 subset), so a reference user's invocation
  * maps one-to-one:
  *
  *   graft.Cli blocks transactions --blocks 1000:1020 \
  *     --source-dir fixtures/chain --output-dir /tmp/out \
  *     [--chunk-size N] [--n-chunks N] [--align] [--reorg-buffer N]
  *     [--network NAME] [--label L] [--overwrite] [--csv|--json] [--hex]
  *     [--dry-run] [--latest N]
  *
  * Dataset aliases (txs, events, 4byte_counts, …) resolve via the
  * registry; multi names expand to their members.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    var datasets = List.empty[String]
    var blocks = "0:"
    var sourceDir = "fixtures/chain"
    var outputDir = "out"
    var chunkSize = 1000L
    var nChunks: Option[Int] = None
    var align = false
    var reorgBuffer = 0L
    var network = "ethereum"
    var label: Option[String] = None
    var overwrite = false
    var format = "parquet"
    var hex = false
    var dryRun = false
    var latest = 0L

    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--blocks" | "-b" => blocks = args(i + 1); i += 1
        case "--source-dir" => sourceDir = args(i + 1); i += 1
        case "--output-dir" | "-o" => outputDir = args(i + 1); i += 1
        case "--chunk-size" => chunkSize = args(i + 1).toLong; i += 1
        case "--n-chunks" => nChunks = Some(args(i + 1).toInt); i += 1
        case "--align" => align = true
        case "--reorg-buffer" => reorgBuffer = args(i + 1).toLong; i += 1
        case "--network" => network = args(i + 1); i += 1
        case "--label" => label = Some(args(i + 1)); i += 1
        case "--overwrite" => overwrite = true
        case "--csv" => format = "csv"
        case "--json" => format = "json"
        case "--hex" => hex = true
        case "--dry-run" => dryRun = true
        case "--latest" => latest = args(i + 1).toLong; i += 1
        case flag if flag.startsWith("--") =>
          throw new IllegalArgumentException(s"unknown flag: $flag")
        case ds => datasets ::= ds
      }
      i += 1
    }
    require(datasets.nonEmpty, "no datasets given")

    // expand multis + aliases via the registry (meta.rs clustering names)
    val expanded = datasets.reverse.flatMap { d =>
      Datatypes.multis.getOrElse(d, Seq(Datatypes(d).name))
    }.distinct

    val maxFixtureBlock =
      if (latest > 0) latest
      else graft.chain.GenFixtures.FirstBlock + graft.chain.GenFixtures.NBlocks - 1L
    var range = BlockSyntax.parse(blocks, maxFixtureBlock) match {
      case r: BlockSyntax.Range => r
      case BlockSyntax.Numbers(ns) => BlockSyntax.Range(ns.min, ns.max + 1)
    }
    if (reorgBuffer > 0) {
      range = BlockSyntax.applyReorgBuffer(range, maxFixtureBlock, reorgBuffer)
        .getOrElse { println("nothing to collect after reorg buffer"); return }
    }

    val spec = Freeze.FreezeSpec(expanded, range, chunkSize, nChunks, align,
      reorgBuffer, outputDir, network, label, overwrite, format, hex)

    if (dryRun) {
      val chunks = nChunks.map(n => BlockSyntax.subchunkByCount(range, n))
        .getOrElse(BlockSyntax.subchunk(range, chunkSize, align))
      println(s"[dry-run] datasets: ${expanded.mkString(", ")}")
      println(s"[dry-run] blocks: $range → ${chunks.size} chunk(s)")
      for (d <- expanded; c <- chunks)
        println("  " + Freeze.fileName(spec, d, c))
      return
    }

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = Freeze.freeze(spark, sourceDir, spec)
    println(s"completed: ${r.completed.size} file(s), skipped: ${r.skipped.size}, " +
      s"errored: ${r.errored.size}, rows: ${r.rows}")
    spark.stop()
  }
}
