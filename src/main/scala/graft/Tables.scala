package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under the given sf directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts varies across testdata drops: earlier ones wrote
      // parquet TIMESTAMP(NANOS) — Spark's reader rejects nanos, so read
      // as raw long and convert (lossless: every ts is µs-aligned) —
      // newer ones write TIMESTAMP(MICROS), which loads natively as NTZ.
      // Dispatch on the loaded type; both normalize to the session-TZ
      // (UTC) TIMESTAMP the downstream queries and oracles assume.
      // The legacy flag is SESSION-wide (it would silently turn every
      // later nanos timestamp in unrelated reads into a raw long), so
      // it is restored as soon as the probe shows this drop does not
      // need it; only a genuinely-nanos drop keeps it set, because the
      // returned DataFrame's per-file reads still consult it.
      val flag = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(flag)
      spark.conf.set(flag, "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType != org.apache.spark.sql.types.LongType)
        prev match {
          case Some(v) => spark.conf.set(flag, v)
          case None => spark.conf.unset(flag)
        }
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
