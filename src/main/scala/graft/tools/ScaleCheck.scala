package graft.tools

import org.apache.spark.sql.SparkSession

/** Heavy-hitter scale-proof runner (round-8 brief item 3): times the
  * top-5 bench queries against two ScaleGen corpora (m=1 ≈ sf0.1 and
  * m=10 ≈ sf1) and prints per-query seconds plus a physical-plan
  * summary (exchange / broadcast-hash / sort-merge node counts) at each
  * scale, so the sidecar shows BOTH ≤~linear runtime scaling and that
  * no join strategy flipped under 10× data.
  *
  * Usage: runMain graft.tools.ScaleCheck <dirSmall> <dirLarge>
  */
object ScaleCheck {

  val queries = Seq("q_doc_dup_spans", "q_doc_dup_span_strip",
    "q_doc_dedup_clusters", "q_embed_dedup_clusters",
    "q16_supplier_diversity")

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ScaleCheck <dirSmall> <dirLarge>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def planSummary(name: String, dir: String): String = {
      // same cold-memo discipline as time(): a summary built over one
      // corpus's materialized audit cache and the other's fresh
      // derivation would diff cache-plan nodes, not join strategy
      graft.queries.TextOps.clearAuditCache()
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      def n(pat: String) = pat.r.findAllIn(plan).length
      // shuffle exchanges only — a bare "Exchange" also matches
      // BroadcastExchange and double-signals broadcast-side changes
      s"exchanges=${n("(?<!Broadcast)Exchange")} bhj=${n("BroadcastHashJoin")} " +
        s"smj=${n("SortMergeJoin")} bnlj=${n("BroadcastNestedLoopJoin")}"
    }
    def time(name: String, dir: String): Double = {
      // every timed run pays the FULL derivation: the doc-dedup family
      // memoizes its LSH+CC audit per (session, dir), and a timed run
      // riding the warmup's cache would report cache-read time (60 ms)
      // as if it were the operator's scaling behavior
      graft.queries.TextOps.clearAuditCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val Seq(small, large) = args.toSeq
    // warm codegen/JIT once per query on the small corpus (the same
    // discipline Bench uses), then time small and large
    queries.foreach(q => time(q, small))
    val results = queries.map { q =>
      val ts = time(q, small)
      val tl = time(q, large)
      val ps = planSummary(q, small)
      val pl = planSummary(q, large)
      println(f"$q%-24s small=$ts%7.2fs large=$tl%7.2fs ratio=${tl / ts}%5.2f  " +
        s"planSmall[$ps] planLarge[$pl] planFlip=${ps != pl}")
      (q, ts, tl, ps, pl)
    }
    val qs = results.map { case (q, ts, tl, ps, pl) =>
      s""""$q":{"small_sec":${f"$ts%.3f"},"large_sec":${f"$tl%.3f"},""" +
        s""""ratio":${f"${tl / ts}%.2f"},"plan_flip":${ps != pl}}"""
    }.mkString("{", ",", "}")
    println(s"""{"scalecheck":$qs,"small":"$small","large":"$large"}""")
    spark.stop()
  }
}
