package graft.chain

import org.apache.hadoop.fs.{Path => HPath}
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
  * through a `._tmp` directory + single-file promotion (export.rs:13-23)
  * over the Hadoop FileSystem of the output path — a lake can live on
  * local disk, HDFS or an object store (see LakeFs for the per-FS
  * rename semantics; PLANS.md carries the swap-site atomicity audit).
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
      partitionBy: Option[String] = None,
      /** user-supplied values for the partition dim (cryo semantics:
        * partition values come from CLI entity chunk lists,
        * types/partitions.rs:290-337 — never discovered from data).
        * When non-empty each chunk cross-products these values; when
        * empty, values are discovered from the scan, bounded by
        * `maxDiscoveredPartitions`. */
      partitionValues: Seq[Any] = Seq.empty,
      /** hard cap on discovered (chunk, value) partition combos — a
        * high-cardinality dim (`--partition-by address`) would otherwise
        * collect an unbounded list to the driver. */
      maxDiscoveredPartitions: Int = 10000,
      /** chunk collection order (cli/parse/partitions.rs:110-123):
        * normal | reverse | random (seeded for reproducibility) */
      chunkOrder: String = "normal",
      chunkOrderSeed: Long = 0,
      /** parquet/csv/json compression codec (args.rs --compression) */
      compression: Option[String] = None,
      /** rows per parquet row group (file_output.rs:139-150 --row-group-size
        * / --n-row-groups): maps to parquet.block.row.count.limit */
      rowGroupSize: Option[Int] = None,
      /** omit column statistics (args.rs --no-stats):
        * parquet.column.statistics.enabled=false */
      noStats: Boolean = false,
      /** chunk-file writes in flight at once (freeze.rs:85-87 semaphore) */
      maxConcurrentChunks: Int = 4,
      /** recorded in the run report (reports.rs cli_command/args) */
      cliCommand: Option[String] = None,
      /** suppress the JSON run report (args.rs --no-report) */
      noReport: Boolean = false,
      /** report directory override (args.rs --report-dir; default
        * <output>/.graft/reports) */
      reportDirOverride: Option[String] = None,
      /** output subdirectory layout (types/files.rs:63-105 --subdirs):
        * any of "datatype", "network", or a literal custom label */
      subdirs: Seq[String] = Seq.empty)

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
    "erc20_balances" -> ((s, d) => ChainDatasets.erc20Balances(s, d)),
    // tracer-family datasets: registered here so the CLI freeze path
    // covers them too, not just the driver query registry — the
    // file-layer differential sweep caught `graft.Cli vm_traces`
    // erroring per chunk while chain_vm_traces was green
    "vm_traces" -> ((s, d) => ChainDatasets.vmTraces(s, d)),
    "geth_opcodes" -> ((s, d) => ChainDatasets.gethOpcodes(s, d)),
    "geth_calls" -> ((s, d) => ChainDatasets.gethCalls(s, d)),
    "javascript_traces" -> ((s, d) => ChainDatasets.javascriptTraces(s, d)),
    "trace_calls" -> ((s, d) => ChainDatasets.traceCalls(s, d)),
    "erc721_metadata" -> ((s, d) => ChainDatasets.erc721Metadata(s, d)))

  /** In-memory collect — the library API of the reference
    * (cryo collect.rs:5-30): one dataset, no files. Takes the same
    * schema/representation options as the CLI. */
  def collect(spark: SparkSession, sourceDir: String, dataset: String,
      blocks: BlockSyntax.Blocks,
      u256Reprs: Seq[graft.functions.U256.Repr] = graft.functions.U256.defaultReprs,
      include: Seq[String] = Seq.empty, exclude: Seq[String] = Seq.empty,
      columns: Option[Seq[String]] = None,
      hex: Boolean = false): DataFrame = {
    val canonical = Datatypes(dataset).name
    val df0 = builderWith(canonical, u256Reprs, include, exclude, columns)(
      spark, sourceDir)
    val df = if (hex) hexifyBinary(df0) else df0
    filterBlocks(df, blocks)
  }

  /** chain_id → canonical network name for file naming when --network is
    * not given (cryo cli/parse/file_output.rs:62-90; public chain ids). */
  val networkNames: Map[Long, String] = Map(
    1L -> "ethereum", 5L -> "goerli", 10L -> "optimism", 56L -> "bnb",
    69L -> "optimism_kovan", 100L -> "gnosis", 137L -> "polygon",
    420L -> "optimism_goerli", 1101L -> "polygon_zkevm",
    8453L -> "base", 10200L -> "gnosis_chidao", 17000L -> "holesky",
    42161L -> "arbitrum", 42170L -> "arbitrum_nova",
    43114L -> "avalanche", 80001L -> "polygon_mumbai",
    84531L -> "base_goerli", 7777777L -> "zora",
    11155111L -> "sepolia")

  def networkName(chainId: Long): String =
    networkNames.getOrElse(chainId, s"network_$chainId")

  /** Collect by transaction hashes — TimeDimension::Transactions
    * (cryo types/queries.rs:75-80, collect_generic.rs:14-19): the unit of
    * collection is a tx-hash list instead of a block range. Hash lists are
    * small → an isin/broadcast-semi filter on transaction_hash. */
  def collectByTransaction(spark: SparkSession, sourceDir: String,
      dataset: String, txHashes: Seq[Array[Byte]]): DataFrame = {
    val ds = Datatypes(dataset)
    require(ds.byTransaction, s"${ds.name} does not support tx-hash collection")
    val df = allBuilders(ds.name)(spark, sourceDir)
    if (df.columns.contains("transaction_hash"))
      df.filter(col("transaction_hash").isin(txHashes: _*))
    else {
      // block-keyed datasets (blocks itself): the reference's
      // CollectByTransaction resolves each tx's CONTAINING block
      // (blocks.rs:71-90) — map hashes to block numbers through the
      // transactions bronze, then filter the block dimension. The
      // collect is |hash list|-bounded (tx lists are small by
      // construction, the same discipline as the isin filter above).
      val bns = ChainDatasets.fx(spark, sourceDir, "rpc_transactions")
        .filter(col("transaction_hash").isin(txHashes: _*))
        .select("block_number").distinct()
        .collect().map(_.get(0)).toSeq
      df.filter(col("block_number").isin(bns: _*))
    }
  }

  private[graft] def filterBlocks(df: DataFrame, blocks: BlockSyntax.Blocks): DataFrame =
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

  /** builder with a caller-chosen u256 representation set (--u256-types,
    * cryo cli/args.rs u256_types) for the datasets that expand u256
    * columns; others fall back to the standard builder. */
  def builderWith(name: String, reprs: Seq[graft.functions.U256.Repr],
      include: Seq[String] = Seq.empty, exclude: Seq[String] = Seq.empty,
      columns: Option[Seq[String]] = None): DatasetBuilder = {
    import graft.chain.{ChainDatasets => CD}
    name match {
      case "blocks" => (s, d) => CD.blocks(s, d, include, exclude, columns)
      case "transactions" => (s, d) =>
        CD.transactions(s, d, include = include, exclude = exclude, columns = columns)
      case "logs" => (s, d) => CD.logs(s, d, u256Reprs = reprs,
        include = include, exclude = exclude, columns = columns)
      case "erc20_transfers" => (s, d) => CD.erc20Transfers(s, d, u256Reprs = reprs)
      case "erc20_approvals" => (s, d) => CD.erc20Approvals(s, d, u256Reprs = reprs)
      case "erc721_transfers" => (s, d) => CD.erc721Transfers(s, d, u256Reprs = reprs)
      case "native_transfers" => (s, d) => CD.nativeTransfers(s, d, u256Reprs = reprs)
      case "balances" => (s, d) => CD.balances(s, d, u256Reprs = reprs)
      case "slots" => (s, d) => CD.slots(s, d, u256Reprs = reprs)
      case "storage_diffs" => (s, d) => CD.storageDiffs(s, d, u256Reprs = reprs)
      case "balance_diffs" => (s, d) => CD.balanceDiffs(s, d, u256Reprs = reprs)
      case "erc20_supplies" => (s, d) => CD.erc20Supplies(s, d, u256Reprs = reprs)
      case "erc20_balances" => (s, d) => CD.erc20Balances(s, d, u256Reprs = reprs)
      case "geth_balance_diffs" => (s, d) => CD.gethBalanceDiffs(s, d, u256Reprs = reprs)
      case "geth_storage_diffs" => (s, d) => CD.gethStorageDiffs(s, d, u256Reprs = reprs)
      case "geth_calls" => (s, d) => CD.gethCalls(s, d, u256Reprs = reprs)
      case "balance_reads" => (s, d) => CD.balanceReads(s, d, u256Reprs = reprs)
      case other => allBuilders(other)
    }
  }

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

  private sealed trait TaskOutcome
  private case class Completed(path: String, rows: Long) extends TaskOutcome
  private case class Skipped(path: String) extends TaskOutcome
  private case class Errored(path: String) extends TaskOutcome

  /** Chunked file extraction with skip-existing. Returns the run report
    * (freeze.rs:149-168 summary semantics).
    *
    * Scale shape (fixes from r1's plan audit): one Spark job per output
    * file with NO pre-count (row counts come from an `observe` metric on
    * the write itself), up to `maxConcurrentChunks` chunk jobs in flight
    * (cryo's semaphore, freeze.rs:85-87), and partition-by dim values
    * discovered in ONE job per dataset (a broadcast range-join against the
    * chunk table) instead of a driver collect per chunk.
    */
  def freeze(spark: SparkSession, sourceDir: String, spec: FreezeSpec,
      overrides: Map[String, DatasetBuilder] = Map.empty): FreezeResult = {
    def builderOf(canonical: String): DatasetBuilder =
      overrides.getOrElse(canonical, allBuilders(canonical))
    // a label equal to a dataset name would make cryo filenames
    // ambiguous for lake readers (Lake.readStream prunes by globbing
    // the dataset segment; `*__blocks__*` would also match a
    // transactions file LABELED "blocks", whose parquet schema then
    // breaks the stream) — refuse to create such a lake at the source
    // canonical names only: filenames and readStream globs always use
    // the canonical dataset segment, so an ALIAS ("txs", "events") can
    // never glob-collide and stays a legal label
    spec.label.foreach { l =>
      require(!Datatypes.canonicalNames.contains(l),
        s"--label '$l' collides with a dataset name; pick a label that " +
          "is not a datatype so lake reads/streams stay unambiguous")
    }
    LakeFs.mkdirs(spec.outputDir)
    val tStart = java.time.LocalDateTime.now()
    writeReport(spec, tStart, None)
    val range = spec.blocks match {
      case r: BlockSyntax.Range => r
      case BlockSyntax.Numbers(ns) => BlockSyntax.Range(ns.min, ns.max + 1)
    }
    val ordered = spec.nChunks match {
      case Some(n) => BlockSyntax.subchunkByCount(range, n)
      case None => BlockSyntax.subchunk(range, spec.chunkSize, spec.align)
    }
    // chunk collection order (cli/parse/partitions.rs:110-123)
    val chunks = spec.chunkOrder match {
      case "normal" => ordered
      case "reverse" => ordered.reverse
      case "random" => new scala.util.Random(spec.chunkOrderSeed).shuffle(ordered)
      case other => throw new IllegalArgumentException(
        s"invalid chunk order '$other', use normal, reverse, or random")
    }
    // multi-dim partitioning (types/partitions.rs:290-337): one file per
    // (chunk × dim value present in that chunk); binary dims use the
    // 8-hex-char prefix stub (binary_chunk.rs:16-24). All (chunk, value)
    // combos for a dataset come from a single aggregation job: the tiny
    // chunk-boundary table broadcast-range-joins the scan, so discovery
    // cost is one pass per dataset, not one driver collect per chunk.
    def dimValuesByChunk(canonical: String): Map[Int, Seq[Option[Any]]] =
      spec.partitionBy match {
        case None => chunks.indices.map(_ -> Seq(Option.empty[Any])).toMap
        // cryo semantics: user-supplied dim values (CLI entity lists)
        // cross-product every chunk — no data-driven discovery at all
        // (types/partitions.rs:290-337,340-404).
        case Some(_) if spec.partitionValues.nonEmpty =>
          chunks.indices
            .map(_ -> spec.partitionValues.map(Option(_))).toMap
        case Some(dim) =>
          import spark.implicits._
          val bounds = chunks.zipWithIndex
            .map { case (c, i) => (i, c.start, c.endExclusive) }
            .toDF("chunk_idx", "c_start", "c_end")
          // limit BEFORE collect: bounds the driver-side list, so a
          // high-cardinality dim fails fast instead of OOMing the driver.
          // spec.blocks, NOT the densified range: a Numbers list must
          // not discover dim values that exist only at unlisted blocks
          // (runTask's membership filter would then write empty
          // partition files for them)
          val collected = filterBlocks(builderOf(canonical)(spark, sourceDir), spec.blocks)
            .join(broadcast(bounds),
              col("block_number") >= col("c_start") &&
                col("block_number") < col("c_end"))
            .select(col("chunk_idx"), col(dim).as("dim_value"))
            .distinct().limit(spec.maxDiscoveredPartitions + 1).collect()
          require(collected.length <= spec.maxDiscoveredPartitions,
            s"--partition-by $dim: more than ${spec.maxDiscoveredPartitions} " +
              "(chunk, value) partitions discovered; pass explicit values " +
              "via the matching entity flag (--address/--contract/--topic0) " +
              "or raise maxDiscoveredPartitions")
          collected
            .groupBy(_.getInt(0))
            .map { case (idx, rs) =>
              idx -> rs.map(r => Option(r.get(1))).toSeq.sortBy(_.map {
                case b: Array[Byte] => b.map("%02x".format(_)).mkString
                case v => v.toString
              }.getOrElse(""))
            }
      }
    // build the ordered task list up front (skip decisions are driver-side)
    val tasks = for {
      dataset <- spec.datasets
      canonical = Datatypes(dataset).name
      dims = dimValuesByChunk(canonical)
      (chunk, idx) <- chunks.zipWithIndex
      dimValue <- dims.getOrElse(idx, Seq.empty)
    } yield {
      val stub = dimValue.map {
        case b: Array[Byte] => "__" + b.take(4).map("%02x".format(_)).mkString
        case v =>
          // same ambiguity guard as --label: a dim value equal to a
          // CANONICAL dataset name would glob-match foreign readStream
          // tails (binary dims are immune — 8-hex stubs can't spell
          // one; aliases never appear in filename dataset segments)
          val sv = v.toString
          require(!Datatypes.canonicalNames.contains(sv),
            s"--partition-by value '$sv' collides with a dataset name in " +
              "cryo file naming; partition on a different column or remap " +
              "the value")
          "__" + sv
      }.getOrElse("")
      val name = fileName(spec, canonical, chunk)
        .replace(s"__${chunkStub(chunk)}", s"$stub" + s"__${chunkStub(chunk)}")
      val sub = spec.subdirs.map {
        case "datatype" => canonical
        case "network" => spec.network
        case custom => custom
      }
      val dir = sub.foldLeft(new HPath(spec.outputDir))(new HPath(_, _))
      LakeFs.mkdirs(dir.toString)
      (canonical, chunk, dimValue, LakeFs.display(new HPath(dir, name)))
    }
    def runTask(canonical: String, chunk: BlockSyntax.Range,
        dimValue: Option[Any], target: String): TaskOutcome =
      if (LakeFs.exists(target) && !spec.overwrite) {
        Skipped(target) // freeze.rs:92-110 idempotent skip
      } else try {
        val ranged = filterBlocks(builderOf(canonical)(spark, sourceDir), chunk)
        // explicit block LISTS (a:b/n sampling, a:b:k strides, parquet
        // refs) keep their membership filter inside each chunk — the
        // chunk range alone would admit unlisted blocks
        val base = spec.blocks match {
          case n: BlockSyntax.Numbers => filterBlocks(ranged, n)
          case _ => ranged
        }
        val df0 = (spec.partitionBy, dimValue) match {
          case (Some(dim), Some(v)) => base.filter(col(dim) === lit(v))
          case (Some(dim), None) => base.filter(col(dim).isNull)
          case _ => base
        }
        // CSV/JSON force hex encoding of binary columns; parquet only
        // under --hex (cryo cli/parse/schemas.rs:37-40 coupling)
        val df = if (spec.format != "parquet" || spec.hex) hexifyBinary(df0) else df0
        Completed(target,
          writeSingleFile(df, target, spec.format, spec.compression,
            spec.rowGroupSize, spec.noStats))
      } catch {
        case e: Exception =>
          System.err.println(s"[freeze] $target failed: ${e.getMessage}")
          Errored(target.toString)
      }
    // cryo keeps a bounded number of chunks in flight; Spark schedules the
    // concurrent jobs' stages across the same executor pool
    val outcomes: Seq[TaskOutcome] =
      if (spec.maxConcurrentChunks <= 1 || tasks.size <= 1)
        tasks.map { case (c, ch, dv, t) => runTask(c, ch, dv, t) }
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          spec.maxConcurrentChunks)
        try {
          val futures = tasks.map { case (c, ch, dv, t) =>
            pool.submit(new java.util.concurrent.Callable[TaskOutcome] {
              def call(): TaskOutcome = runTask(c, ch, dv, t)
            })
          }
          futures.map(_.get()) // preserves task order regardless of finish order
        } finally pool.shutdown()
      }
    val result = FreezeResult(
      outcomes.collect { case Completed(p, _) => p },
      outcomes.collect { case Skipped(p) => p },
      outcomes.collect { case Errored(p) => p },
      outcomes.collect { case Completed(_, n) => n }.sum)
    writeReport(spec, tStart, Some(result))
    result
  }

  /** re-encode all binary columns as 0x-hex strings */
  private[graft] def hexifyBinary(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.BinaryType
    df.select(df.schema.fields.map { fld =>
      if (fld.dataType == BinaryType)
        graft.functions.HexCodec.toHex(col(fld.name)).as(fld.name)
      else col(fld.name)
    }.toSeq: _*)
  }

  /** single-file write for non-chunked collection modes (e.g. --txs) */
  def writeOneFile(df: DataFrame, target: String, format: String): Long =
    writeSingleFile(df, target, format)

  /** one file per chunk via tmp dir + single-file promotion
    * (export.rs:13-23), over the Hadoop FileSystem of the target path —
    * local, hdfs:// and s3a:// lakes all take the same path. The
    * promotion is an atomic rename on HDFS/local; on object stores the
    * part file lands as one object copy whose source sits in the `._tmp`
    * dir lake listings skip (LakeFs scaladoc has the full semantics).
    * The row count rides the write job as an `observe` metric — the chunk
    * is computed exactly once (r1 pre-counted with df.count(), doubling
    * every chunk's work). */
  private def writeSingleFile(df: DataFrame, target: String, format: String,
      compression: Option[String] = None, rowGroupSize: Option[Int] = None,
      noStats: Boolean = false): Long = {
    val targetPath = new HPath(target)
    val tmp = new HPath(targetPath.getParent, targetPath.getName + "._tmp")
    val obs = org.apache.spark.sql.Observation(
      s"freeze_${targetPath.getName}_${System.nanoTime()}")
    val writer0 = df.observe(obs, count(lit(1)).as("rows"))
      .coalesce(1).write.mode("overwrite")
    // parquet default codec is lz4 raw like the reference
    // (args.rs:191, file_output.rs:107); csv/json keep Spark's default
    val codec = compression.orElse(
      if (format == "parquet") Some("lz4_raw") else None)
    var writer = codec.map(c => writer0.option("compression", c))
      .getOrElse(writer0)
    // Spark forwards unrecognized write options into the per-job hadoop
    // conf, where parquet-mr reads them (prepareWrite →
    // newHadoopConfWithOptions).
    rowGroupSize.foreach(n =>
      writer = writer.option("parquet.block.row.count.limit", n.toString))
    if (noStats)
      writer = writer.option("parquet.column.statistics.enabled", "false")
    format match {
      case "parquet" => writer.parquet(tmp.toString)
      case "csv" => writer.option("header", "true").csv(tmp.toString)
      case "json" => writer.json(tmp.toString)
    }
    // fail with the real cause if no part- file materialized instead of
    // a bare NoSuchElementException
    val tfs = LakeFs.fs(tmp)
    val part = tfs.listStatus(tmp)
      .find(_.getPath.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(
        s"freeze wrote no part- file under $tmp for $target"))
      .getPath
    LakeFs.promote(part, targetPath)
    tfs.delete(tmp, true)
    obs.get("rows").asInstanceOf[Long]
  }

  /** library version recorded in run reports (reports.rs cryo_version) */
  val Version = "0.2.0"

  private def reportStamp(t: java.time.LocalDateTime): String =
    t.format(java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd_HH-mm-ss.SSSSSS"))

  def reportDir(spec: FreezeSpec): String =
    spec.reportDirOverride.getOrElse(
      new HPath(new HPath(spec.outputDir, ".graft"), "reports").toString)

  /** Two-phase JSON run report (types/reports.rs:25-100): an
    * `incomplete_{t_start}.json` marker (results: null) is written when the
    * run starts; on completion the final `{t_start}.json` replaces it and
    * the marker is deleted — a crash leaves the marker behind as evidence. */
  private def writeReport(spec: FreezeSpec, tStart: java.time.LocalDateTime,
      result: Option[FreezeResult]): Unit = {
    if (spec.noReport) return
    val dir = reportDir(spec)
    LakeFs.mkdirs(dir)
    def s(x: String) = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def arr(xs: Seq[String]) = xs.map(s).mkString("[", ",", "]")
    val results = result match {
      case None => "null"
      case Some(r) =>
        s"""{"completed_paths":${arr(r.completed)},"errored_paths":${arr(r.errored)},
           |"n_skipped":${r.skipped.size},"rows":${r.rows}}""".stripMargin
    }
    val json =
      s"""{"graft_version":${s(Version)},
         |"cli_command":${spec.cliCommand.map(s).getOrElse("null")},
         |"args":{"datasets":${arr(spec.datasets)},"network":${s(spec.network)},
         |"format":${s(spec.format)},"chunk_order":${s(spec.chunkOrder)}},
         |"results":$results}""".stripMargin
    val stamp = reportStamp(tStart)
    val name = if (result.isDefined) s"$stamp.json" else s"incomplete_$stamp.json"
    LakeFs.writeString(new HPath(dir, name).toString, json)
    if (result.isDefined)
      LakeFs.deleteFile(new HPath(dir, s"incomplete_$stamp.json").toString)
  }
}
