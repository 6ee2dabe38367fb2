package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY §2 inventory + training-data
  * pipeline ops) to DataFrame builders over a testdata sf directory;
  * `oracleSql` holds the DuckDB-equivalent SQL for the driver's
  * hash-compare correctness gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_local_supplier")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.defs ++
      graft.queries.EventsOps.defs ++
      graft.queries.TextOps.defs ++
      graft.queries.SimilarityOps.defs ++
      graft.queries.MultimodalOps.defs ++
      graft.queries.ChainQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.EventsOps.oracles ++
      graft.queries.TextOps.oracles ++
      graft.queries.SimilarityOps.oracles ++
      graft.queries.MultimodalOps.oracles ++
      graft.queries.ChainQueries.oracles
}
