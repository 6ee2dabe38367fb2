package graft.queries

import graft.chain.{ChainDatasets => CD, GenFixtures}
import graft.functions.U256
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract entries for the chain datasets (SURVEY §2.1), running
  * over the deterministic chain fixtures at /root/repo/fixtures/chain
  * (they ignore the sf dir — the chain tables are scale-independent).
  *
  * Oracle SQL reads the same parquet via read_parquet() with byte-level
  * blob slicing through hex/unhex (this DuckDB build lacks blob substring).
  * Columns DuckDB cannot express (keccak hashes, u256 decimal strings from
  * binary) are covered by ScalaTest specs instead and kept out of the
  * oracle-facing projections.
  */
object ChainQueries {
  type Q = (SparkSession, String) => DataFrame

  val FixDir = "/root/repo/fixtures/chain"
  private def rp(name: String) =
    s"read_parquet('$FixDir/$name.parquet/*.parquet')"

  /** byte-slice of a blob column in DuckDB SQL: 1-based offset/len */
  private def bs(c: String, off: Int, len: Int): String =
    s"unhex(substring(hex($c), ${2 * (off - 1) + 1}, ${2 * len}))"

  private val sigTransferHex = GenFixtures.sigTransfer.map("%02x".format(_)).mkString
  private val sigApprovalHex = GenFixtures.sigApproval.map("%02x".format(_)).mkString

  /** Oracle-facing projection: every binary column → '0x…' lowercase hex
    * string (cryo's ColumnEncoding::Hex). The driver's comparator converts
    * the DuckDB side to pandas, where raw BLOBs arrive as unhashable
    * bytearrays and crash its sort (VERDICT r1: 38 of the 41 chain entries
    * died this way). Raw-binary outputs stay covered by ScalaTest specs;
    * the driver gate compares the hex form on BOTH sides. */
  private def hexAll(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.BinaryType
    df.select(df.schema.fields.map { f =>
      if (f.dataType == BinaryType)
        graft.functions.HexCodec.toHex(col(f.name)).as(f.name)
      else col(f.name)
    }.toSeq: _*)
  }

  /** Binary output columns per oracle query (verified via DuckDB DESCRIBE
    * over every oracle) — drives the SELECT * REPLACE hex wrapper below so
    * the DuckDB side emits the same '0x…' strings as hexAll. */
  private val binCols: Map[String, Seq[String]] = Map(
    "chain_blocks" -> Seq("block_hash", "parent_hash", "author", "extra_data"),
    "chain_transactions" -> Seq("transaction_hash", "from_address", "to_address", "value"),
    "chain_transactions_exclude_failed" -> Seq("transaction_hash"),
    "chain_logs" -> Seq("transaction_hash", "address", "topic0", "topic1", "topic2", "topic3", "data"),
    "chain_logs_decoded" -> Seq("transaction_hash", "address", "topic0", "event__from", "event__to", "event__value_binary"),
    "chain_erc20_transfers" -> Seq("transaction_hash", "erc20", "from_address", "to_address", "value_binary"),
    "chain_erc20_approvals" -> Seq("transaction_hash", "erc20", "from_address", "to_address", "value_binary"),
    "chain_erc721_transfers" -> Seq("transaction_hash", "erc721", "from_address", "to_address", "token_id_binary"),
    "chain_traces" -> Seq("action_from", "action_to", "action_input", "action_init", "result_output", "result_code", "result_address", "transaction_hash"),
    "chain_traces_exclude_failed" -> Seq("transaction_hash"),
    "chain_native_transfers" -> Seq("transaction_hash", "from_address", "to_address"),
    "chain_contracts" -> Seq("transaction_hash", "contract_address", "deployer", "factory"),
    "chain_four_byte_counts" -> Seq("transaction_hash", "signature"),
    "chain_address_appearances" -> Seq("transaction_hash", "address"),
    "chain_balances" -> Seq("address", "balance_binary"),
    "chain_nonces" -> Seq("address"),
    "chain_slots" -> Seq("address", "slot", "value_binary"),
    "chain_storage_diffs" -> Seq("transaction_hash", "address", "slot", "from_value_binary", "to_value_binary"),
    "chain_eth_calls" -> Seq("contract_address", "call_data", "output_data"),
    "chain_balance_diffs" -> Seq("transaction_hash", "address", "from_value_binary", "to_value_binary"),
    "chain_nonce_diffs" -> Seq("transaction_hash", "address"),
    "chain_code_diffs" -> Seq("transaction_hash", "address", "from_value", "to_value"),
    "chain_codes" -> Seq("address", "code"),
    "chain_vm_traces" -> Seq("push", "mem_data", "storage_key", "storage_val"),
    "chain_geth_calls" -> Seq("from_address", "to_address", "value_binary", "input", "output"),
    "chain_js_traces" -> Seq("transaction_hash"),
    "chain_trace_calls" -> Seq("contract_address", "tx_call_data", "action_from", "action_to", "action_input"),
    "chain_balance_reads" -> Seq("transaction_hash", "address", "balance_binary"),
    "chain_nonce_reads" -> Seq("transaction_hash", "address"),
    "chain_code_reads" -> Seq("transaction_hash", "address", "code"),
    "chain_storage_reads" -> Seq("transaction_hash", "address", "slot", "value"),
    "chain_erc721_metadata" -> Seq("erc721"),
    "chain_geth_balance_diffs" -> Seq("transaction_hash", "address", "from_value_binary", "to_value_binary"),
    "chain_geth_storage_diffs" -> Seq("transaction_hash", "address", "slot", "from_value_binary", "to_value_binary"),
    "chain_geth_nonce_diffs" -> Seq("transaction_hash", "address"),
    "chain_geth_code_diffs" -> Seq("transaction_hash", "address", "from_value", "to_value"),
    "chain_erc20_metadata" -> Seq("erc20"),
    "chain_erc20_supplies" -> Seq("erc20", "total_supply_binary"),
    "chain_erc20_balances" -> Seq("erc20", "address", "balance_binary")
  )

  private def hexWrap(name: String, sql: String): String =
    binCols.get(name) match {
      case Some(cols) =>
        val rep = cols.map(c => s"'0x' || lower(hex($c)) AS $c").mkString(", ")
        s"SELECT * REPLACE ($rep) FROM (\n$sql\n) hx"
      case None => sql
    }

  private val rawDefs: Map[String, Q] = Map(
    "chain_blocks" -> ((s, _) => CD.blocks(s, FixDir)),
    "chain_transactions" -> { (s, _) =>
      CD.transactions(s, FixDir).select(
        "block_number", "transaction_index", "transaction_hash",
        "from_address", "to_address", "value", "gas_limit", "gas_used",
        "gas_price", "transaction_type", "success", "n_input_bytes",
        "n_input_zero_bytes", "chain_id")
    },
    "chain_transactions_exclude_failed" -> { (s, _) =>
      CD.transactions(s, FixDir, excludeFailed = true)
        .select("block_number", "transaction_index", "transaction_hash",
          "success", "gas_price", "chain_id")
    },
    "chain_logs" -> ((s, _) => CD.logs(s, FixDir)),
    "chain_logs_decoded" -> { (s, _) =>
      CD.logs(s, FixDir,
        eventSignature = Some("Transfer(address indexed from, address indexed to, uint256 value)"),
        u256Reprs = Seq(U256.Binary))
    },
    "chain_erc20_transfers" -> ((s, _) =>
      CD.erc20Transfers(s, FixDir, u256Reprs = Seq(U256.Binary))),
    // hex output mode (--hex / CSV coupling): binary → 0x-prefixed strings
    "chain_logs_hex" -> { (s, _) =>
      import org.apache.spark.sql.types.BinaryType
      val df = CD.logs(s, FixDir)
      df.select(df.schema.fields.map { f =>
        if (f.dataType == BinaryType)
          graft.functions.HexCodec.toHex(org.apache.spark.sql.functions.col(f.name)).as(f.name)
        else org.apache.spark.sql.functions.col(f.name)
      }.toSeq: _*)
    },
    "chain_erc20_approvals" -> ((s, _) =>
      CD.erc20Approvals(s, FixDir, u256Reprs = Seq(U256.Binary))),
    "chain_erc721_transfers" -> ((s, _) =>
      CD.erc721Transfers(s, FixDir, u256Reprs = Seq(U256.Binary))),
    "chain_traces" -> ((s, _) => CD.traces(s, FixDir)),
    "chain_traces_exclude_failed" -> ((s, _) =>
      CD.traces(s, FixDir, excludeFailed = true)
        .select("block_number", "transaction_index", "transaction_hash",
          "trace_address", "action_type", "error", "chain_id")),
    "chain_native_transfers" -> ((s, _) =>
      CD.nativeTransfers(s, FixDir, u256Reprs = Seq(U256.Str))),
    "chain_contracts" -> ((s, _) =>
      CD.contracts(s, FixDir)
        .select("block_number", "create_index", "transaction_hash",
          "contract_address", "deployer", "factory", "n_init_code_bytes",
          "n_code_bytes", "chain_id")),
    "chain_four_byte_counts" -> ((s, _) => CD.fourByteCounts(s, FixDir)),
    "chain_address_appearances" -> ((s, _) => CD.addressAppearances(s, FixDir)),
    "chain_balances" -> ((s, _) =>
      CD.balances(s, FixDir, u256Reprs = Seq(U256.Binary))),
    "chain_nonces" -> ((s, _) => CD.nonces(s, FixDir)),
    "chain_slots" -> ((s, _) =>
      CD.slots(s, FixDir, u256Reprs = Seq(U256.Binary))),
    "chain_storage_diffs" -> ((s, _) =>
      CD.storageDiffs(s, FixDir, u256Reprs = Seq(U256.Binary))),
    "chain_eth_calls" -> ((s, _) =>
      CD.ethCalls(s, FixDir)
        .select("block_number", "contract_address", "call_data",
          "output_data", "chain_id")),
    "chain_balance_diffs" -> ((s, _) =>
      CD.balanceDiffs(s, FixDir, u256Reprs = Seq(U256.Binary))),
    "chain_nonce_diffs" -> ((s, _) => CD.nonceDiffs(s, FixDir)),
    "chain_code_diffs" -> ((s, _) => CD.codeDiffs(s, FixDir)),
    "chain_codes" -> ((s, _) => CD.codes(s, FixDir)),
    "chain_vm_traces" -> ((s, _) => CD.vmTraces(s, FixDir)),
    "chain_geth_opcodes" -> ((s, _) => CD.gethOpcodes(s, FixDir)),
    "chain_geth_calls" -> ((s, _) =>
      CD.gethCalls(s, FixDir, u256Reprs = Seq(U256.Binary))),
    "chain_js_traces" -> { (s, _) =>
      import org.apache.spark.sql.functions.{col, get_json_object}
      CD.javascriptTraces(s, FixDir)
        .withColumn("gas_used", get_json_object(col("output"), "$.gasUsed").cast("long"))
    },
    "chain_trace_calls" -> ((s, _) => CD.traceCalls(s, FixDir)),
    "chain_balance_reads" -> ((s, _) =>
      CD.balanceReads(s, FixDir, u256Reprs = Seq(U256.Binary))),
    "chain_nonce_reads" -> ((s, _) => CD.nonceReads(s, FixDir)),
    "chain_code_reads" -> ((s, _) => CD.codeReads(s, FixDir)),
    "chain_storage_reads" -> ((s, _) => CD.storageReads(s, FixDir)),
    "chain_erc721_metadata" -> ((s, _) => CD.erc721Metadata(s, FixDir)),
    "chain_geth_balance_diffs" -> ((s, _) =>
      CD.gethBalanceDiffs(s, FixDir, u256Reprs = Seq(U256.Binary))),
    "chain_geth_storage_diffs" -> ((s, _) =>
      CD.gethStorageDiffs(s, FixDir, u256Reprs = Seq(U256.Binary))),
    "chain_geth_nonce_diffs" -> ((s, _) => CD.gethNonceDiffs(s, FixDir)),
    "chain_geth_code_diffs" -> ((s, _) => CD.gethCodeDiffs(s, FixDir)),
    "chain_erc20_metadata" -> ((s, _) => CD.erc20Metadata(s, FixDir)),
    "chain_erc20_supplies" -> ((s, _) =>
      CD.erc20Supplies(s, FixDir, u256Reprs = Seq(U256.Binary))),
    "chain_erc20_balances" -> ((s, _) =>
      CD.erc20Balances(s, FixDir, u256Reprs = Seq(U256.Binary)))
  )

  /** driver-facing entries: raw transforms behind the comparator-safe hex
    * projection (a no-op for entries with no binary output, e.g.
    * chain_logs_hex / chain_geth_opcodes). */
  val defs: Map[String, Q] = rawDefs.map { case (k, f) =>
    k -> ((s: SparkSession, d: String) => hexAll(f(s, d)))
  }

  private val rawOracles: Map[String, String] = Map(
    "chain_blocks" ->
      s"""SELECT block_number, block_hash, parent_hash, author, gas_used,
        | gas_limit, extra_data, timestamp, difficulty, size,
        | base_fee_per_gas, chain_id
        |FROM ${rp("rpc_blocks")}""".stripMargin,
    "chain_transactions" ->
      s"""SELECT t.block_number, t.transaction_index, t.transaction_hash,
        | t.from_address, t.to_address, t.value, t.gas_limit,
        | r.gas_used AS gas_used,
        | CASE WHEN t.transaction_type = 2
        |      THEN b.base_fee_per_gas + least(t.max_priority_fee_per_gas,
        |             t.max_fee_per_gas - b.base_fee_per_gas)
        |      ELSE t.gas_price END AS gas_price,
        | t.transaction_type, r.status = 1 AS success,
        | octet_length(t.input) AS n_input_bytes,
        | CAST(len(list_filter(range(0, octet_length(t.input)),
        |   i -> substring(hex(t.input), 2*i + 1, 2) = '00')) AS INT)
        |   AS n_input_zero_bytes,
        | t.chain_id
        |FROM ${rp("rpc_transactions")} t
        |JOIN ${rp("rpc_receipts")} r USING (transaction_hash)
        |JOIN ${rp("rpc_blocks")} b ON t.block_number = b.block_number""".stripMargin,
    "chain_transactions_exclude_failed" ->
      s"""SELECT t.block_number, t.transaction_index, t.transaction_hash,
        | r.status = 1 AS success,
        | CASE WHEN t.transaction_type = 2
        |      THEN b.base_fee_per_gas + least(t.max_priority_fee_per_gas,
        |             t.max_fee_per_gas - b.base_fee_per_gas)
        |      ELSE t.gas_price END AS gas_price,
        | t.chain_id
        |FROM ${rp("rpc_transactions")} t
        |JOIN ${rp("rpc_receipts")} r USING (transaction_hash)
        |JOIN ${rp("rpc_blocks")} b ON t.block_number = b.block_number
        |WHERE r.status = 1""".stripMargin,
    "chain_logs" ->
      s"""SELECT block_number, transaction_index, log_index, transaction_hash,
        | address, topics[1] AS topic0, topics[2] AS topic1,
        | topics[3] AS topic2, topics[4] AS topic3, data,
        | octet_length(data) AS n_data_bytes, chain_id
        |FROM ${rp("rpc_logs")}""".stripMargin,
    "chain_logs_decoded" ->
      s"""SELECT block_number, transaction_index, log_index, transaction_hash,
        | address, topics[1] AS topic0,
        | ${bs("topics[2]", 13, 20)} AS event__from,
        | ${bs("topics[3]", 13, 20)} AS event__to,
        | data AS event__value_binary,
        | octet_length(data) AS n_data_bytes, chain_id
        |FROM ${rp("rpc_logs")}
        |WHERE len(topics) = 3 AND topics[1] = unhex('$sigTransferHex')
        |  AND octet_length(data) >= 32""".stripMargin,
    "chain_logs_hex" -> {
      def hx(c: String) = s"'0x' || lower(hex($c)) AS $c"
      s"""SELECT block_number, transaction_index, log_index,
        | ${hx("transaction_hash")}, ${hx("address")},
        | ${hx("topics[1]").replace("AS topics[1]", "AS topic0")},
        | ${hx("topics[2]").replace("AS topics[2]", "AS topic1")},
        | ${hx("topics[3]").replace("AS topics[3]", "AS topic2")},
        | ${hx("topics[4]").replace("AS topics[4]", "AS topic3")},
        | ${hx("data")}, octet_length(data) AS n_data_bytes, chain_id
        |FROM ${rp("rpc_logs")}""".stripMargin
    },
    "chain_erc20_transfers" ->
      s"""SELECT block_number, transaction_index, log_index, transaction_hash,
        | address AS erc20,
        | ${bs("topics[2]", 13, 20)} AS from_address,
        | ${bs("topics[3]", 13, 20)} AS to_address,
        | data AS value_binary, chain_id
        |FROM ${rp("rpc_logs")}
        |WHERE len(topics) = 3 AND topics[1] = unhex('$sigTransferHex')
        |  AND octet_length(data) = 32""".stripMargin,
    "chain_erc20_approvals" ->
      s"""SELECT block_number, transaction_index, log_index, transaction_hash,
        | address AS erc20,
        | ${bs("topics[2]", 13, 20)} AS from_address,
        | ${bs("topics[3]", 13, 20)} AS to_address,
        | data AS value_binary, chain_id
        |FROM ${rp("rpc_logs")}
        |WHERE len(topics) = 3 AND topics[1] = unhex('$sigApprovalHex')
        |  AND octet_length(data) = 32""".stripMargin,
    "chain_erc721_transfers" ->
      s"""SELECT block_number, transaction_index, log_index, transaction_hash,
        | address AS erc721,
        | ${bs("topics[2]", 13, 20)} AS from_address,
        | ${bs("topics[3]", 13, 20)} AS to_address,
        | topics[4] AS token_id_binary, chain_id
        |FROM ${rp("rpc_logs")}
        |WHERE len(topics) = 4 AND topics[1] = unhex('$sigTransferHex')""".stripMargin,
    "chain_traces" ->
      s"""SELECT action_from, action_to, action_value, action_gas,
        | action_input, action_call_type, action_init, action_reward_type,
        | action_type, result_gas_used, result_output, result_code,
        | result_address, trace_address, subtraces, error, block_number,
        | transaction_index, transaction_hash, chain_id
        |FROM ${rp("rpc_traces")}""".stripMargin,
    "chain_traces_exclude_failed" ->
      s"""SELECT block_number, transaction_index, transaction_hash,
        | trace_address, action_type, error, chain_id
        |FROM ${rp("rpc_traces")} t
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM ${rp("rpc_traces")} f
        |  WHERE f.error IS NOT NULL AND f.transaction_hash = t.transaction_hash
        |    AND (t.trace_address = f.trace_address
        |         OR starts_with(t.trace_address, f.trace_address || '_')
        |         OR f.trace_address = ''))""".stripMargin,
    "chain_native_transfers" ->
      s"""WITH x AS (
        | SELECT *,
        |  CASE WHEN action_type = 'create' THEN result_address
        |       ELSE action_to END AS to_unified
        | FROM ${rp("rpc_traces")}
        | WHERE error IS NULL
        |   AND ((action_type IN ('call', 'create') AND action_value <> '0')
        |        OR action_type IN ('suicide', 'reward')))
        |SELECT block_number, transaction_index,
        | CAST(row_number() OVER (PARTITION BY block_number
        |   ORDER BY transaction_index ASC NULLS LAST, trace_address) - 1 AS INT)
        |   AS transfer_index,
        | transaction_hash, action_from AS from_address,
        | to_unified AS to_address, action_value AS value_string, chain_id
        |FROM x""".stripMargin,
    "chain_contracts" ->
      s"""WITH t AS (
        | SELECT *, first_value(action_from) OVER (
        |   PARTITION BY transaction_hash
        |   ORDER BY length(trace_address), trace_address
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS deployer
        | FROM ${rp("rpc_traces")} WHERE transaction_hash IS NOT NULL)
        |SELECT block_number,
        | CAST(row_number() OVER (PARTITION BY block_number
        |   ORDER BY transaction_index, trace_address) - 1 AS INT) AS create_index,
        | transaction_hash, result_address AS contract_address, deployer,
        | action_from AS factory,
        | octet_length(action_init) AS n_init_code_bytes,
        | octet_length(result_code) AS n_code_bytes, chain_id
        |FROM t WHERE action_type = 'create' AND error IS NULL""".stripMargin,
    "chain_four_byte_counts" ->
      s"""SELECT block_number, transaction_index, transaction_hash,
        | ${bs("action_input", 1, 4)} AS signature,
        | CAST(octet_length(action_input) AS BIGINT) AS "size",
        | count(*) AS "count", CAST(${GenFixtures.ChainId} AS BIGINT) AS chain_id
        |FROM ${rp("rpc_traces")}
        |WHERE transaction_hash IS NOT NULL AND octet_length(action_input) >= 4
        |GROUP BY 1, 2, 3, 4, 5""".stripMargin,
    "chain_address_appearances" ->
      s"""SELECT block_number, CAST(NULL AS INT) AS transaction_index,
        |  CAST(NULL AS BLOB) AS transaction_hash, author AS address,
        |  'miner' AS relationship, chain_id FROM ${rp("rpc_blocks")}
        |UNION ALL SELECT block_number, transaction_index, transaction_hash,
        |  from_address, 'tx_from', chain_id FROM ${rp("rpc_transactions")}
        |UNION ALL SELECT block_number, transaction_index, transaction_hash,
        |  to_address, 'tx_to', chain_id FROM ${rp("rpc_transactions")}
        |  WHERE to_address IS NOT NULL
        |UNION ALL SELECT block_number, transaction_index, transaction_hash,
        |  address, 'log_address', chain_id FROM ${rp("rpc_logs")}
        |UNION ALL SELECT block_number, transaction_index, transaction_hash,
        |  ${bs("topics[2]", 13, 20)}, 'erc20_transfer_from', chain_id
        |  FROM ${rp("rpc_logs")}
        |  WHERE len(topics) >= 3 AND topics[1] = unhex('$sigTransferHex')
        |UNION ALL SELECT block_number, transaction_index, transaction_hash,
        |  ${bs("topics[3]", 13, 20)}, 'erc20_transfer_to', chain_id
        |  FROM ${rp("rpc_logs")}
        |  WHERE len(topics) >= 3 AND topics[1] = unhex('$sigTransferHex')
        |UNION ALL SELECT block_number, transaction_index, transaction_hash,
        |  action_from, 'trace_from', chain_id FROM ${rp("rpc_traces")}
        |  WHERE action_from IS NOT NULL
        |UNION ALL SELECT block_number, transaction_index, transaction_hash,
        |  action_to, 'trace_to', chain_id FROM ${rp("rpc_traces")}
        |  WHERE action_to IS NOT NULL
        |UNION ALL SELECT block_number, transaction_index, transaction_hash,
        |  result_address, 'trace_created', chain_id FROM ${rp("rpc_traces")}
        |  WHERE result_address IS NOT NULL""".stripMargin,
    "chain_balances" ->
      s"""SELECT block_number, address, balance AS balance_binary, chain_id
        |FROM ${rp("rpc_accounts")}""".stripMargin,
    "chain_nonces" ->
      s"""SELECT block_number, address, nonce, chain_id
        |FROM ${rp("rpc_accounts")}""".stripMargin,
    "chain_slots" ->
      s"""SELECT block_number, address, slot, value AS value_binary, chain_id
        |FROM ${rp("rpc_storage")}""".stripMargin,
    "chain_storage_diffs" ->
      s"""SELECT block_number, transaction_index, transaction_hash, address,
        | slot, from_value AS from_value_binary, to_value AS to_value_binary,
        | chain_id
        |FROM ${rp("rpc_storage_diffs")}""".stripMargin,
    "chain_eth_calls" ->
      s"""SELECT block_number, contract_address, call_data, output_data, chain_id
        |FROM ${rp("rpc_calls")}""".stripMargin,
    "chain_balance_diffs" ->
      s"""SELECT block_number, transaction_index, transaction_hash, address,
        | from_value AS from_value_binary, to_value AS to_value_binary, chain_id
        |FROM ${rp("rpc_balance_diffs")}""".stripMargin,
    "chain_nonce_diffs" ->
      s"""SELECT block_number, transaction_index, transaction_hash, address,
        | from_value, to_value, chain_id
        |FROM ${rp("rpc_nonce_diffs")}""".stripMargin,
    "chain_code_diffs" ->
      s"""SELECT block_number, transaction_index, transaction_hash, address,
        | from_value, to_value, chain_id
        |FROM ${rp("rpc_code_diffs")}""".stripMargin,
    "chain_codes" ->
      s"""SELECT block_number, address, code, chain_id
        |FROM ${rp("rpc_accounts")}""".stripMargin,
    "chain_vm_traces" ->
      s"""SELECT block_number, transaction_index, pc, cost, used, push,
        | mem_off, mem_data, storage_key, storage_val, op, chain_id
        |FROM ${rp("rpc_vm_traces")}""".stripMargin,
    "chain_geth_opcodes" ->
      s"""SELECT block_number, transaction_index, pc, op, gas, gas_cost,
        | depth, chain_id
        |FROM ${rp("rpc_geth_opcodes")}""".stripMargin,
    "chain_geth_calls" ->
      s"""SELECT block_number, transaction_index, from_address, to_address,
        | value AS value_binary, gas, gas_used, input, output, call_type,
        | error, depth, chain_id
        |FROM ${rp("rpc_geth_calls")}""".stripMargin,
    "chain_js_traces" ->
      s"""SELECT block_number, transaction_index, transaction_hash, output,
        | CAST(output->>'gasUsed' AS BIGINT) AS gas_used, chain_id
        |FROM ${rp("rpc_js_traces")}""".stripMargin,
    "chain_trace_calls" ->
      s"""SELECT block_number, contract_address, tx_call_data, action_from,
        | action_to, action_value, action_gas, action_input, action_type,
        | trace_address, subtraces, error, chain_id
        |FROM ${rp("rpc_trace_calls")}""".stripMargin,
    "chain_balance_reads" ->
      s"""SELECT block_number, transaction_index, transaction_hash, address,
        | balance AS balance_binary, chain_id
        |FROM ${rp("rpc_geth_prestate")}
        |WHERE phase = 'pre' AND slot IS NULL AND balance IS NOT NULL""".stripMargin,
    "chain_nonce_reads" ->
      s"""SELECT block_number, transaction_index, transaction_hash, address,
        | nonce, chain_id
        |FROM ${rp("rpc_geth_prestate")}
        |WHERE phase = 'pre' AND slot IS NULL AND nonce IS NOT NULL""".stripMargin,
    "chain_code_reads" ->
      s"""SELECT block_number, transaction_index, transaction_hash, address,
        | code, chain_id
        |FROM ${rp("rpc_geth_prestate")}
        |WHERE phase = 'pre' AND slot IS NULL AND code IS NOT NULL""".stripMargin,
    "chain_storage_reads" ->
      s"""SELECT block_number, transaction_index, transaction_hash, address,
        | slot, slot_value AS value, chain_id
        |FROM ${rp("rpc_geth_prestate")}
        |WHERE phase = 'pre' AND slot IS NOT NULL AND slot_value IS NOT NULL""".stripMargin,
    "chain_erc721_metadata" ->
      s"""WITH g AS (
        | SELECT block_number, contract_address AS erc721, chain_id,
        |  min(CASE WHEN call_data = unhex('06fdde03') THEN output_data END) AS name_raw,
        |  min(CASE WHEN call_data = unhex('95d89b41') THEN output_data END) AS symbol_raw
        | FROM ${rp("rpc_calls_erc721")}
        | GROUP BY 1, 2, 3)
        |SELECT block_number, erc721,
        | regexp_replace(decode(${bs("name_raw", 65, 9999)}), '[\\x00-\\x1f\\x7f]', '', 'g') AS name,
        | regexp_replace(decode(${bs("symbol_raw", 65, 9999)}), '[\\x00-\\x1f\\x7f]', '', 'g') AS symbol,
        | chain_id
        |FROM g WHERE name_raw IS NOT NULL""".stripMargin,
    "chain_geth_balance_diffs" ->
      s"""WITH base AS (
        | SELECT * FROM ${rp("rpc_geth_prestate")} WHERE slot IS NULL AND balance IS NOT NULL),
        |pre AS (SELECT block_number, transaction_index, transaction_hash, address,
        |        chain_id, balance AS pre_value FROM base WHERE phase = 'pre'),
        |post AS (SELECT block_number, transaction_index, transaction_hash, address,
        |        chain_id, balance AS post_value FROM base WHERE phase = 'post')
        |SELECT block_number, transaction_index, transaction_hash, address,
        | coalesce(pre_value, unhex(repeat('00', 32))) AS from_value_binary,
        | coalesce(post_value, unhex(repeat('00', 32))) AS to_value_binary,
        | chain_id
        |FROM pre FULL OUTER JOIN post
        | USING (block_number, transaction_index, transaction_hash, address, chain_id)
        |WHERE coalesce(pre_value, unhex(repeat('00', 32)))
        |   <> coalesce(post_value, unhex(repeat('00', 32)))""".stripMargin,
    "chain_geth_storage_diffs" ->
      s"""WITH base AS (
        | SELECT * FROM ${rp("rpc_geth_prestate")} WHERE slot IS NOT NULL AND slot_value IS NOT NULL),
        |pre AS (SELECT block_number, transaction_index, transaction_hash, address, slot,
        |        chain_id, slot_value AS pre_value FROM base WHERE phase = 'pre'),
        |post AS (SELECT block_number, transaction_index, transaction_hash, address, slot,
        |        chain_id, slot_value AS post_value FROM base WHERE phase = 'post')
        |SELECT block_number, transaction_index, transaction_hash, address, slot,
        | coalesce(pre_value, unhex(repeat('00', 32))) AS from_value_binary,
        | coalesce(post_value, unhex(repeat('00', 32))) AS to_value_binary,
        | chain_id
        |FROM pre FULL OUTER JOIN post
        | USING (block_number, transaction_index, transaction_hash, address, slot, chain_id)
        |WHERE coalesce(pre_value, unhex(repeat('00', 32)))
        |   <> coalesce(post_value, unhex(repeat('00', 32)))""".stripMargin,
    "chain_geth_code_diffs" ->
      s"""WITH base AS (
        | SELECT * FROM ${rp("rpc_geth_prestate")} WHERE slot IS NULL AND code IS NOT NULL),
        |pre AS (SELECT block_number, transaction_index, transaction_hash, address,
        |        chain_id, code AS pre_value FROM base WHERE phase = 'pre'),
        |post AS (SELECT block_number, transaction_index, transaction_hash, address,
        |        chain_id, code AS post_value FROM base WHERE phase = 'post')
        |SELECT block_number, transaction_index, transaction_hash, address,
        | coalesce(pre_value, unhex('')) AS from_value,
        | coalesce(post_value, unhex('')) AS to_value, chain_id
        |FROM pre FULL OUTER JOIN post
        | USING (block_number, transaction_index, transaction_hash, address, chain_id)
        |WHERE coalesce(pre_value, unhex('')) <> coalesce(post_value, unhex(''))""".stripMargin,
    "chain_geth_nonce_diffs" ->
      s"""WITH base AS (
        | SELECT * FROM ${rp("rpc_geth_prestate")} WHERE slot IS NULL AND nonce IS NOT NULL),
        |pre AS (SELECT block_number, transaction_index, transaction_hash, address,
        |        chain_id, nonce AS pre_value FROM base WHERE phase = 'pre'),
        |post AS (SELECT block_number, transaction_index, transaction_hash, address,
        |        chain_id, nonce AS post_value FROM base WHERE phase = 'post')
        |SELECT block_number, transaction_index, transaction_hash, address,
        | coalesce(pre_value, 0) AS from_value, coalesce(post_value, 0) AS to_value, chain_id
        |FROM pre FULL OUTER JOIN post
        | USING (block_number, transaction_index, transaction_hash, address, chain_id)
        |WHERE coalesce(pre_value, 0) <> coalesce(post_value, 0)""".stripMargin,
    "chain_erc20_metadata" ->
      s"""WITH g AS (
        | SELECT block_number, contract_address AS erc20, chain_id,
        |  min(CASE WHEN call_data = unhex('06fdde03') THEN output_data END) AS name_raw,
        |  min(CASE WHEN call_data = unhex('95d89b41') THEN output_data END) AS symbol_raw,
        |  min(CASE WHEN call_data = unhex('313ce567') THEN output_data END) AS decimals_raw
        | FROM ${rp("rpc_calls")}
        | GROUP BY 1, 2, 3)
        |SELECT block_number, erc20,
        | regexp_replace(decode(${bs("name_raw", 65, 9999)}), '[\\x00-\\x1f\\x7f]', '', 'g') AS name,
        | regexp_replace(decode(${bs("symbol_raw", 65, 9999)}), '[\\x00-\\x1f\\x7f]', '', 'g') AS symbol,
        | CAST('0x' || hex(${bs("decimals_raw", 29, 4)}) AS INT) AS decimals,
        | chain_id
        |FROM g WHERE name_raw IS NOT NULL""".stripMargin,
    "chain_erc20_supplies" ->
      s"""SELECT block_number, contract_address AS erc20,
        | output_data AS total_supply_binary, chain_id
        |FROM ${rp("rpc_calls")} WHERE call_data = unhex('18160ddd')""".stripMargin,
    "chain_erc20_balances" ->
      s"""SELECT block_number, contract_address AS erc20,
        | ${bs("call_data", 17, 20)} AS address,
        | output_data AS balance_binary, chain_id
        |FROM ${rp("rpc_calls")}
        |WHERE ${bs("call_data", 1, 4)} = unhex('70a08231')
        |  AND octet_length(call_data) = 36""".stripMargin
  )

  val oracles: Map[String, String] = rawOracles.map { case (k, v) =>
    k -> hexWrap(k, v)
  }
}
