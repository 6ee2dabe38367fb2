package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the CC adversarial layout (VERDICT r16 item 7 /
  * OPTIMIZATION_r16 "Not yet optimized"): an id-MONOTONE path graph is
  * the propagate+contract worst case — the contraction strips O(1)
  * nodes per level, and before the r17 constraint barrier each level's
  * localCheckpoint re-derived the ACCUMULATED constraint set per
  * self-join re-analysis (measured r16: 17 s → 258 s per level at
  * levels 7→8 under a seam-forced cap). This probe forces the
  * distributed route (finish cap 0) on a monotone path and prints
  * per-level wall times so the fix is a number, not an argument:
  *
  *   runMain graft.tools.CcPathProbe [nNodes] [maxRounds]
  *
  * With GRAFT_CC_DEBUG=1 the per-level [cc] lines carry the timings.
  */
object CcPathProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(4096)
    val maxRounds = args.lift(1).map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pairs = (0 until n - 1).map(i => (i.toLong, i + 1L))
      .toDF("id_a", "id_b")
    graft.queries.TextOps.ccFinishCapOverride = Some(0)
    try {
      val t0 = System.nanoTime()
      val out = graft.queries.TextOps
        .clustersOf(pairs, maxRounds = maxRounds)
      val nOk = out.filter(org.apache.spark.sql.functions
        .col("cluster_id") === 0L).count()
      println(f"[probe] n=$n maxRounds=$maxRounds " +
        f"total=${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"labeled_to_min=$nOk/$n")
    } finally graft.queries.TextOps.ccFinishCapOverride = None
    spark.stop()
  }
}
