package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Follow-the-head streaming — beyond-reference extension (SURVEY §2.8):
  * the reference's nearest equivalent is re-running with --reorg-buffer
  * (manual incremental batch). Here the same incremental semantics run as
  * a Structured Streaming job:
  *
  *  - source: files appended to a bronze directory (or, against a live
  *    node, a custom micro-batch source polling eth_blockNumber);
  *    maxFilesPerTrigger bounds each micro-batch like block chunking
  *  - watermark: the reorg buffer expressed in event time — late/reorged
  *    rows inside the buffer update open windows, older ones drop
  *  - sink: append-only parquet with checkpointing = the idempotent
  *    skip-existing semantics, managed by the engine instead of filenames
  */
object FollowMode {

  /** stream of raw events/blocks from a growing parquet directory */
  def readAppendOnly(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** tumbling-window aggregation with a reorg-buffer watermark — the
    * streaming form of EventsOps.q_events_hourly. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,4)")).as("total_value"))

  /** write an append-only parquet sink with checkpoint (exactly-once per
    * micro-batch; restart-safe like freeze's skip-existing). */
  def sink(df: DataFrame, outDir: String, checkpoint: String,
      intervalMs: Long = 1000): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(intervalMs))
}
