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
      hex: Boolean = false,
      partitionBy: Option[String] = None)

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
    val df = allBuilders(canonical)(spark, sourceDir)
    filterBlocks(df, blocks)
  }

  /** Collect by transaction hashes — TimeDimension::Transactions
    * (cryo types/queries.rs:75-80, collect_generic.rs:14-19): the unit of
    * collection is a tx-hash list instead of a block range. Hash lists are
    * small → an isin/broadcast-semi filter on transaction_hash. */
  def collectByTransaction(spark: SparkSession, sourceDir: String,
      dataset: String, txHashes: Seq[Array[Byte]]): DataFrame = {
    val ds = Datatypes(dataset)
    require(ds.byTransaction, s"${ds.name} does not support tx-hash collection")
    val df = allBuilders(ds.name)(spark, sourceDir)
    df.filter(col("transaction_hash").isin(txHashes: _*))
  }

  private def filterBlocks(df: DataFrame, blocks: BlockSyntax.Blocks): DataFrame =
    blocks match {
      case BlockSyntax.Range(a, b) =>
        df.filter(col("block_number") >= a && col("block_number") < b)
      case BlockSyntax.Numbers(ns) =>
        df.filter(col("block_number").isin(ns: _*))
    }

  /** Multi-dataset collection sharing one extraction pass
    * (cryo types/datatypes/meta.rs:23-39 clustering): the shared bronze
    * table is persisted once; member builders hit Spark's cache manager
    * via plan-fragment matching, so N member tables cost one scan.
    * Call `release()` when done.
    */
  case class MultiResult(tables: Map[String, DataFrame], release: () => Unit)

  private val multiBronze: Map[String, Seq[String]] = Map(
    "blocks_and_transactions" -> Seq("rpc_blocks", "rpc_transactions", "rpc_receipts"),
    "call_trace_derivatives" -> Seq("rpc_traces"),
    "state_diffs" -> Seq("rpc_balance_diffs", "rpc_code_diffs",
      "rpc_nonce_diffs", "rpc_storage_diffs"),
    "geth_state_diffs" -> Seq("rpc_geth_prestate"),
    "state_reads" -> Seq("rpc_geth_prestate"))

  private val multiBuilders: Map[String, DatasetBuilder] = Map(
    "geth_balance_diffs" -> ((s, d) => ChainDatasets.gethBalanceDiffs(s, d)),
    "geth_code_diffs" -> ((s, d) => ChainDatasets.gethCodeDiffs(s, d)),
    "geth_nonce_diffs" -> ((s, d) => ChainDatasets.gethNonceDiffs(s, d)),
    "geth_storage_diffs" -> ((s, d) => ChainDatasets.gethStorageDiffs(s, d)),
    "balance_reads" -> ((s, d) => ChainDatasets.balanceReads(s, d)),
    "code_reads" -> ((s, d) => ChainDatasets.codeReads(s, d)),
    "nonce_reads" -> ((s, d) => ChainDatasets.nonceReads(s, d)),
    "storage_reads" -> ((s, d) => ChainDatasets.storageReads(s, d)))

  /** every dataset buildable standalone (scalar builders + multi members) */
  lazy val allBuilders: Map[String, DatasetBuilder] = builders ++ multiBuilders

  def collectMulti(spark: SparkSession, sourceDir: String,
      multiName: String): MultiResult = {
    val members = Datatypes.multis.getOrElse(multiName,
      throw new IllegalArgumentException(s"unknown multi: $multiName"))
    val bronze = multiBronze(multiName).map(t => ChainDatasets.fx(spark, sourceDir, t))
    bronze.foreach(_.persist())
    val tables = members.map { m =>
      m -> allBuilders(m)(spark, sourceDir)
    }.toMap
    MultiResult(tables, () => bronze.foreach(_.unpersist()))
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
      // multi-dim partitioning (types/partitions.rs:290-337): one file per
      // (chunk × dim value); binary dims use the 8-hex-char prefix stub
      // (binary_chunk.rs:16-24)
      val dimValues: Seq[Option[Any]] = spec.partitionBy match {
        case None => Seq(None)
        case Some(dim) =>
          filterBlocks(allBuilders(canonical)(spark, sourceDir), chunk)
            .select(dim).distinct().collect().map(r => Option(r.get(0))).toSeq
            .sortBy(_.map {
              case b: Array[Byte] => b.map("%02x".format(_)).mkString
              case v => v.toString
            }.getOrElse(""))
      }
      for (dimValue <- dimValues) {
        val stub = dimValue.map {
          case b: Array[Byte] => "__" + b.take(4).map("%02x".format(_)).mkString
          case v => "__" + v.toString
        }.getOrElse("")
        val name = fileName(spec, canonical, chunk)
          .replace(s"__${chunkStub(chunk)}", s"$stub"+ s"__${chunkStub(chunk)}")
        val target = Paths.get(spec.outputDir, name)
        if (Files.exists(target) && !spec.overwrite) {
          skipped ::= target.toString // freeze.rs:92-110 idempotent skip
        } else {
          try {
            val base = filterBlocks(allBuilders(canonical)(spark, sourceDir), chunk)
            val df0 = (spec.partitionBy, dimValue) match {
              case (Some(dim), Some(v)) => base.filter(col(dim) === lit(v))
              case (Some(dim), None) => base.filter(col(dim).isNull)
              case _ => base
            }
            // CSV/JSON force hex encoding of binary columns; parquet only
            // under --hex (cryo cli/parse/schemas.rs:37-40 coupling)
            val df = if (spec.format != "parquet" || spec.hex) hexifyBinary(df0) else df0
            rows += writeSingleFile(df, target, spec.format)
            completed ::= target.toString
          } catch {
            case e: Exception =>
              System.err.println(s"[freeze] $target failed: ${e.getMessage}")
              errored ::= target.toString
          }
        }
      }
    }
    val result = FreezeResult(completed.reverse, skipped.reverse, errored.reverse, rows)
    writeReport(spec, result)
    result
  }

  /** re-encode all binary columns as 0x-hex strings */
  private def hexifyBinary(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.BinaryType
    df.select(df.schema.fields.map { fld =>
      if (fld.dataType == BinaryType)
        graft.functions.HexCodec.toHex(col(fld.name)).as(fld.name)
      else col(fld.name)
    }.toSeq: _*)
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
