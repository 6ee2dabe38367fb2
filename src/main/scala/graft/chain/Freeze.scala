package graft.chain

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The freeze lifecycle: chunked, idempotent, resumable extraction to
  * named files — the Spark rendering of cryo's `freeze()`
  * (cryo freeze.rs:26-200) with its file-naming and skip-existing
  * semantics (types/chunks/chunk_ops.rs:25-54, freeze.rs:92-110).
  *
  * Each chunk becomes one output file
  * `{network}__{datatype}[__{label}]__{start:08d}_to_{end:08d}.parquet`;
  * existing files are skipped unless overwrite — re-running a job touches
  * only missing chunks (incremental/resumable extraction). Writes go
  * through a `_tmp` directory + atomic rename (export.rs:13-23).
  *
  * Scale note: each chunk writes via a block-range filter that Catalyst
  * pushes into the parquet scan (partition pruning), so a 1000-chunk
  * freeze over 100 TB reads each row group at most once per overlapping
  * chunk, not once per chunk.
  */
object Freeze {

  case class FreezeSpec(
      datasets: Seq[String],
      blocks: BlockSyntax.Blocks,
      chunkSize: Long = 1000,
      nChunks: Option[Int] = None,
      align: Boolean = false,
      reorgBuffer: Long = 0,
      outputDir: String,
      network: String = "ethereum",
      label: Option[String] = None,
      overwrite: Boolean = false,
      format: String = "parquet",
      hex: Boolean = false)

  case class FreezeResult(
      completed: Seq[String], skipped: Seq[String], errored: Seq[String],
      rows: Long)

  /** chunk stub `{min:08d}_to_{max:08d}` (number_chunk.rs:18-20; max is
    * inclusive in the filename, matching the reference) */
  def chunkStub(r: BlockSyntax.Range): String =
    f"${r.start}%08d_to_${r.endExclusive - 1}%08d"

  def fileName(spec: FreezeSpec, dataset: String, r: BlockSyntax.Range): String = {
    val label = spec.label.map("__" + _).getOrElse("")
    s"${spec.network}__${dataset}${label}__${chunkStub(r)}.${spec.format}"
  }

  /** dataset name → full DataFrame builder over the fixture/RPC source dir */
  type DatasetBuilder = (SparkSession, String) => DataFrame

  val builders: Map[String, DatasetBuilder] = Map(
    "blocks" -> ((s, d) => ChainDatasets.blocks(s, d)),
    "transactions" -> ((s, d) => ChainDatasets.transactions(s, d)),
    "logs" -> ((s, d) => ChainDatasets.logs(s, d)),
    "traces" -> ((s, d) => ChainDatasets.traces(s, d)),
    "erc20_transfers" -> ((s, d) => ChainDatasets.erc20Transfers(s, d)),
    "erc20_approvals" -> ((s, d) => ChainDatasets.erc20Approvals(s, d)),
    "erc721_transfers" -> ((s, d) => ChainDatasets.erc721Transfers(s, d)),
    "native_transfers" -> ((s, d) => ChainDatasets.nativeTransfers(s, d)),
    "contracts" -> ((s, d) => ChainDatasets.contracts(s, d)),
    "four_byte_counts" -> ((s, d) => ChainDatasets.fourByteCounts(s, d)),
    "address_appearances" -> ((s, d) => ChainDatasets.addressAppearances(s, d)),
    "balances" -> ((s, d) => ChainDatasets.balances(s, d)),
    "nonces" -> ((s, d) => ChainDatasets.nonces(s, d)),
    "codes" -> ((s, d) => ChainDatasets.codes(s, d)),
    "slots" -> ((s, d) => ChainDatasets.slots(s, d)),
    "storage_diffs" -> ((s, d) => ChainDatasets.storageDiffs(s, d)),
    "balance_diffs" -> ((s, d) => ChainDatasets.balanceDiffs(s, d)),
    "nonce_diffs" -> ((s, d) => ChainDatasets.nonceDiffs(s, d)),
    "code_diffs" -> ((s, d) => ChainDatasets.codeDiffs(s, d)),
    "eth_calls" -> ((s, d) => ChainDatasets.ethCalls(s, d)),
    "erc20_metadata" -> ((s, d) => ChainDatasets.erc20Metadata(s, d)),
    "erc20_supplies" -> ((s, d) => ChainDatasets.erc20Supplies(s, d)),
    "erc20_balances" -> ((s, d) => ChainDatasets.erc20Balances(s, d)))

  /** In-memory collect — the library API of the reference
    * (cryo collect.rs:5-30): one dataset, no files. */
  def collect(spark: SparkSession, sourceDir: String, dataset: String,
      blocks: BlockSyntax.Blocks): DataFrame = {
    val canonical = Datatypes(dataset).name
    val df = builders(canonical)(spark, sourceDir)
    filterBlocks(df, blocks)
  }

  private def filterBlocks(df: DataFrame, blocks: BlockSyntax.Blocks): DataFrame =
    blocks match {
      case BlockSyntax.Range(a, b) =>
        df.filter(col("block_number") >= a && col("block_number") < b)
      case BlockSyntax.Numbers(ns) =>
        df.filter(col("block_number").isin(ns: _*))
    }

  /** Chunked file extraction with skip-existing. Returns the run report
    * (freeze.rs:149-168 summary semantics). */
  def freeze(spark: SparkSession, sourceDir: String, spec: FreezeSpec): FreezeResult = {
    Files.createDirectories(Paths.get(spec.outputDir))
    val range = spec.blocks match {
      case r: BlockSyntax.Range => r
      case BlockSyntax.Numbers(ns) => BlockSyntax.Range(ns.min, ns.max + 1)
    }
    val chunks = spec.nChunks match {
      case Some(n) => BlockSyntax.subchunkByCount(range, n)
      case None => BlockSyntax.subchunk(range, spec.chunkSize, spec.align)
    }
    var completed = List.empty[String]
    var skipped = List.empty[String]
    var errored = List.empty[String]
    var rows = 0L
    for (dataset <- spec.datasets; chunk <- chunks) {
      val canonical = Datatypes(dataset).name
      val target = Paths.get(spec.outputDir, fileName(spec, canonical, chunk))
      if (Files.exists(target) && !spec.overwrite) {
        skipped ::= target.toString // freeze.rs:92-110 idempotent skip
      } else {
        try {
          val df = filterBlocks(builders(canonical)(spark, sourceDir), chunk)
          rows += writeSingleFile(df, target, spec.format)
          completed ::= target.toString
        } catch {
          case e: Exception =>
            System.err.println(s"[freeze] $target failed: ${e.getMessage}")
            errored ::= target.toString
        }
      }
    }
    val result = FreezeResult(completed.reverse, skipped.reverse, errored.reverse, rows)
    writeReport(spec, result)
    result
  }

  /** one file per chunk via tmp dir + atomic move (export.rs:13-23) */
  private def writeSingleFile(df: DataFrame, target: Path, format: String): Long = {
    val tmp = target.resolveSibling(target.getFileName.toString + "._tmp")
    val n = df.count()
    val writer = df.coalesce(1).write.mode("overwrite")
    format match {
      case "parquet" => writer.parquet(tmp.toString)
      case "csv" => writer.option("header", "true").csv(tmp.toString)
      case "json" => writer.json(tmp.toString)
    }
    val part = Files.list(tmp).filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst().get()
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(tmp)
    n
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  /** JSON run report (types/reports.rs:25-100) */
  private def writeReport(spec: FreezeSpec, r: FreezeResult): Unit = {
    val dir = Paths.get(spec.outputDir, ".graft", "reports")
    Files.createDirectories(dir)
    def arr(xs: Seq[String]) = xs.map(x => "\"" + x.replace("\\", "\\\\") + "\"").mkString("[", ",", "]")
    val json =
      s"""{"datasets":${arr(spec.datasets)},"completed":${arr(r.completed)},
         |"skipped":${arr(r.skipped)},"errored":${arr(r.errored)},"rows":${r.rows}}""".stripMargin
    Files.writeString(dir.resolve(s"report_${spec.network}_${math.abs(json.hashCode)}.json"), json)
  }
}
