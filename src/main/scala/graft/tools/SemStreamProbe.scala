package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev probe: time ONLY the streaming SemDeDup drain (isolates the
  * state-encoding cost from FollowBench's full protocol). */
object SemStreamProbe {
  def main(args: Array[String]): Unit = {
    val embPath = args.lift(0).getOrElse("/root/testdata/sf0.1/embeddings.parquet")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = sys.env.get("SEMPROBE_WORK")
      .map { base =>
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(base), "graft_semprobe").toString
      }
      .getOrElse(java.nio.file.Files.createTempDirectory("graft_semprobe").toString)
    val embAll = spark.read.parquet(embPath).select("vec_id", "embedding")
    val kCells = graft.queries.SimilarityOps.scaledCellCount(embAll)
    val cents = embAll.filter(col("vec_id") < kCells)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    val staged = s"$work/emb"
    embAll.repartitionByRange(40, col("vec_id")).write.parquet(staged)
    val schema = spark.read.parquet(staged).schema
    sys.env.get("SEMPROBE_PARTS").foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p))
    sys.env.get("SEMPROBE_ASYNC").foreach(a =>
      spark.conf.set("spark.sql.streaming.asyncProgressTrackingEnabled", a))
    if (sys.env.get("SEMPROBE_ROCKS").contains("true")) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
    }
    (1 to reps).foreach { i =>
      val q = graft.streaming.FollowMode.semdedupStream(spark,
        graft.streaming.FollowMode.readAppendOnly(spark, staged, schema,
          maxFilesPerTrigger = 4).select("vec_id", "embedding"), cents)
        .toDF()
        .writeStream.outputMode("update").format("noop")
        .option("checkpointLocation", s"$work/ck_$i")
        .trigger(Trigger.AvailableNow()).start()
      val t0 = System.nanoTime()
      q.awaitTermination()
      println(f"[semprobe] rep $i wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (i == reps) q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2).map {
          case (k, v) => s"$k=$v" }.mkString(" ")
        val st = p.stateOperators.headOption.map(s =>
          s" stateRows=${s.numRowsTotal} updated=${s.numRowsUpdated} " +
          s"commitMs=${s.allUpdatesTimeMs}/${s.allRemovalsTimeMs}/${s.commitTimeMs}")
          .getOrElse("")
        println(s"[semprobe]   batch=${p.batchId} rows=${p.numInputRows} $d$st")
      }
    }
    spark.stop()
  }
}
