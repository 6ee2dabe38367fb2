package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the training-data pipeline operators (dedup,
  * similarity, text analysis, event streams) beyond the oracle hash gate.
  */
class PipelineOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** ADVICE r16: every `Window [` node in a plan must be PAIRED with a
    * map-side partial WindowGroupLimit (the bounded-shuffle contract) —
    * a plan-wide substring disjunction would let one bounded top-k mask
    * another sub-plan's regression to a bare unbounded Window. */
  private def windowsAllBounded(plan: String): Boolean = {
    val nWindow = "Window \\[".r.findAllIn(plan).length
    val nPartialLimit = plan.linesIterator
      .count(l => l.contains("WindowGroupLimit") && l.contains(", Partial"))
    nWindow == nPartialLimit
  }

  test("cosine top-k: 5 neighbors per query, cosine within [-1, 1], ranked") {
    val rows = SparkEntry.queries("q_embed_cosine_topk")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5))
    rows.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0001 && c <= 1.0001)
    }
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rk"))
      val cs = sorted.map(_.getAs[Double]("cosine"))
      assert(cs.sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("ANN assign/encode are scan-shaped; cosine top-k partial-aggregates") {
    // the nearest-centroid / nearest-codeword argmin runs INSIDE a
    // row-local expression over the driver-held (bounded) index — the
    // plan must be a projection over the scan: no window, no exchange,
    // no x-k expansion join of the corpus
    val assign = SparkEntry.queries("q_embed_ivf_assign")(spark, sf)
    val p1 = assign.queryExecution.executedPlan.toString
    assert(p1.contains("nearest_centroid_f32"))
    assert(!p1.contains("Window") && !p1.contains("Exchange") && !p1.contains("Join"))
    val encode = SparkEntry.queries("q_embed_pq_encode")(spark, sf)
    val p2 = encode.queryExecution.executedPlan.toString
    assert(p2.contains("pq_encode_f32"))
    assert(!p2.contains("Window") && !p2.contains("Exchange") && !p2.contains("Join"))
    // the brute-force top-k ranks through TopKPerKey's bounded group
    // limit: a PARTIAL WindowGroupLimit must run BEFORE the exchange
    // (only |Q|*k rows per input partition cross) — never a bare
    // Window over the unbounded scored relation (r16: the typed
    // aggregator became the native WindowGroupLimit form; the shuffle
    // bound is the invariant, not the operator spelling)
    val topk = SparkEntry.queries("q_embed_cosine_topk")(spark, sf)
    val p3 = topk.queryExecution.executedPlan.toString
    assert(p3.contains("WindowGroupLimit"))
    val partialIdx = p3.indexOf(", Partial")
    val exchangeIdx = p3.indexOf("Exchange hashpartitioning")
    assert(partialIdx > 0 && exchangeIdx > 0 && exchangeIdx < partialIdx,
      "partial group limit must sit BELOW the exchange (map side)")
  }

  test("prep audit cache survives an external clearCache") {
    // the bench clears all cached data between its cold and warm passes;
    // the memoized audit must re-persist and recompute its (already
    // built) plan rather than re-deriving a new CC pipeline
    val a = SparkEntry.queries("q_doc_corpus_prep")(spark, sf)
    assert(a.count() > 0) // materialize + persist
    spark.sharedState.cacheManager.clearCache()
    val before = graft.queries.TextOps.clustersInvocations.get()
    val funnel = SparkEntry.queries("q_doc_prep_funnel")(spark, sf)
    assert(funnel.count() == 5) // recomputes the memoized plan fine
    // no NEW clustersOf derivation — the plan was built exactly once
    assert(graft.queries.TextOps.clustersInvocations.get() == before)
  }

  test("ANN plan shape holds at nlist=256, K=256 (sf0.1)") {
    // The fixture index is 16 cells / M=8, K=16. Same machinery at 16x
    // the cells and codewords on the 2000-vector sf0.1 corpus: the
    // driver-held index stays KB-sized and the PLAN SHAPE must not
    // change — that is what makes the design parameter-independent at
    // 100 TB (the index scales with nlist*K, the corpus cost stays one
    // scan + one broadcast probe join + one partial-agg top-k).
    val sf01 = "/root/testdata/sf0.1"
    val e = Tables(spark, sf01, "embeddings")
    val (assign, encode) = graft.queries.SimilarityOps
      .annScaleParts(e, nlist = 256, kCodes = 256)
    // assignment/encode stay scan-shaped projections: row-local argmin
    // over the driver-held index, no exchange/window/join at any size
    val p1 = assign.queryExecution.executedPlan.toString
    assert(p1.contains("nearest_centroid_f32"))
    assert(!p1.contains("Window") && !p1.contains("Exchange") && !p1.contains("Join"))
    val p2 = encode.queryExecution.executedPlan.toString
    assert(p2.contains("pq_encode_f32"))
    assert(!p2.contains("Window") && !p2.contains("Exchange") && !p2.contains("Join"))
    // assignment actually uses the widened index: >16 distinct cells
    val nCells = assign.select("centroid_id").distinct().count()
    assert(nCells > 16 && nCells <= 256, s"got $nCells cells")
    // full search at scale: the codes side must meet the probe LUT by
    // BROADCAST (never a shuffled join of the corpus-sized codes), and
    // no sort-merge join may appear anywhere in the plan
    val search = graft.queries.SimilarityOps
      .ivfpqAtScale(e, nlist = 256, kCodes = 256)
    val p3 = search.queryExecution.executedPlan.toString
    assert(p3.contains("BroadcastHashJoin"))
    assert(!p3.contains("SortMergeJoin"))
    // top-k still bounds the shuffle map-side (r16: partial
    // WindowGroupLimit below the exchange, was partial_topkagg) — and
    // EVERY window in the plan is paired with one (ADVICE r16)
    assert(windowsAllBounded(p3), s"plan:\n$p3")
    val rows = search.collect()
    assert(rows.length == 30) // 10 queries x k=3, same contract as fixture
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 3))
  }

  test("minhash pairs are a subset of true-jaccard >= 0.5 and symmetric-free") {
    val pairs = SparkEntry.queries("q_doc_minhash_pairs")(spark, sf).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }

  test("LSH bucket cap drops degenerate buckets, keeps small clusters") {
    import spark.implicits._
    // 20 identical clones: every band bucket has size 20 — over the cap
    // of 8, so the would-be 190 quadratic pairs are all suppressed.
    val clones = (1 to 20).map(i => (100L + i, "alpha beta gamma delta epsilon zeta eta theta"))
    // one genuine duplicate pair: bucket size 2, under the cap.
    val dup = Seq((1L, "one two three four five six seven"),
      (2L, "one two three four five six seven"))
    // unrelated singletons share no shingles with anything.
    val singles = (1 to 5).map(i => (200L + i, s"u$i$i v$i w$i x$i y$i z$i"))
    val docs = (clones ++ dup ++ singles).toDF("doc_id", "text")
    val res = graft.queries.TextOps.minhashPairsOf(docs, bucketCap = 8).collect()
    val ids = res.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids == Set((1L, 2L)))
  }

  test("embedding near-dup bucket cap suppresses degenerate buckets") {
    import spark.implicits._
    // 30 identical negative vectors: one bucket of 30 — over cap 8, the
    // 435 quadratic pairs are suppressed.
    val clones = (1 to 30).map(i => (100L + i, Array.fill(8)(-1.0f)))
    // one genuine near-dup pair in a different (positive-sign) bucket.
    val pair = Seq(
      (1L, Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
      (2L, Array(1f, 0.9f, 1f, 1f, 1f, 1f, 1f, 0.8f)))
    val docs = (clones ++ pair).toDF("vec_id", "embedding")
    val res = graft.queries.SimilarityOps
      .neardupOf(docs, bits = 6, threshold = 0.25, bucketCap = 8).collect()
    assert(res.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(res.head.getDouble(2) > 0.9)
  }

  test("bigram LM score: corpus-frequent phrasing outranks hapax phrasing") {
    import spark.implicits._
    // 5 copies of one phrase: its bigrams dominate the corpus counts.
    // One doc of globally-unique bigrams: without the add-5 smoothing
    // every hapax would score the grid max (c2=1, c1=1); with it the
    // hapax doc must land strictly below the common docs.
    val common = (1 to 5).map(i => (i.toLong, "the cat sat on the mat"))
    val unique = Seq((99L, "zx qy wv ut sr"))
    val got = graft.queries.TextOps
      .lmScoreOf((common ++ unique).toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_grid"),
          r.getAs[Double]("lm_score"))))
      .toMap
    // hand-computed: c1(the)=10, c1(cat|sat|on|mat)=5; each bigram c2=5.
    // grid("the cat")=grid("the mat")=5*2^20 div 15=349525;
    // grid("cat sat")=grid("sat on")=grid("on the")=5*2^20 div 10=524288.
    (1 to 5).foreach { i =>
      assert(got(i.toLong) == ((5L, 2271914L, 454382.8)))
    }
    // hapax: grid = 2^20 div 6 = 174762 for each of 4 bigrams.
    assert(got(99L) == ((4L, 699048L, 174762.0)))
  }

  test("semdedup: same-cell near-identical vectors drop, obliques keep") {
    import spark.implicits._
    def unit(i: Int, s: Float): Array[Float] =
      Array.tabulate(64)(j => if (j == i) s else 0f)
    // 16 orthogonal seeds = their own centroids (one per cell), plus:
    // two scaled copies of seed 0 (cosine 1.0 -> both drop against the
    // lower-id seed), and one oblique e1+e2 vector (cosine 1/sqrt(2) ≈
    // .707 to seeds 1 and 2 — tie-break assigns cell 1, kept under .8).
    val seeds = (0 until 16).map(i => (i.toLong, unit(i, 1f)))
    val extra = Seq(
      (100L, unit(0, 2f)),
      (101L, unit(0, 3f)),
      (102L, Array.tabulate(64)(j => if (j == 1 || j == 2) 1f else 0f)))
    val got = graft.queries.SimilarityOps
      .semdedupOf((seeds ++ extra).toDF("vec_id", "embedding"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("centroid_id"), Option(r.get(2)).map(_ => r.getAs[Double]("max_prior_cosine")),
          r.getAs[Boolean]("keep"))))
      .toMap
    assert(got.size == 19)
    assert(got(100L)._1 == 0L && !got(100L)._3 && got(100L)._2.get > 0.999)
    assert(got(101L)._1 == 0L && !got(101L)._3)
    assert(got(102L)._1 == 1L && got(102L)._3 &&
      math.abs(got(102L)._2.get - 1.0 / math.sqrt(2)) < 1e-12)
    (0 until 16).foreach(i => assert(got(i.toLong)._3, s"seed $i must keep"))
    assert(got(0L)._2.isEmpty) // no lower-id cellmate for the first seed
  }

  test("dedup clusters: multi-hop chains collapse to the min label") {
    import spark.implicits._
    // two components: a 4-node chain (diameter 3 — needs >1 propagation
    // round) and a disjoint pair; labels must be each component's min id
    val pairs = Seq((10L, 20L), (20L, 30L), (30L, 40L), (7L, 8L))
      .toDF("id_a", "id_b")
    val got = graft.queries.TextOps.clustersOf(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
      7L -> 7L, 8L -> 7L))
  }

  test("dedup clusters: random graphs match a driver union-find oracle") {
    import spark.implicits._
    // seeded generator over mixed shapes — long chains (force several
    // contraction levels), cliques (collapse level 1), stars, isolated
    // pairs, duplicate rows, self-loops, shuffled non-contiguous ids —
    // checked against a driver-side union-find with min-id roots
    val rnd = new scala.util.Random(20260814L)
    def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      // min-id root: path-compress, then map every seen node
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      // union-by-smaller-root above already makes every root the min
      nodes.map(n => n -> find(n)).toMap
    }
    (0 until 6).foreach { trial =>
      val ids = rnd.shuffle((0L until 400L).toVector).take(120 + rnd.nextInt(200))
      val pairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var i = 0
      while (i < ids.size) {
        rnd.nextInt(4) match {
          case 0 => // chain segment
            val len = math.min(2 + rnd.nextInt(40), ids.size - i)
            (0 until len - 1).foreach(j => pairs += ((ids(i + j), ids(i + j + 1))))
            i += len
          case 1 => // clique
            val len = math.min(2 + rnd.nextInt(6), ids.size - i)
            for (a <- 0 until len; b <- a + 1 until len)
              pairs += ((ids(i + a), ids(i + b)))
            i += len
          case 2 => // star
            val len = math.min(2 + rnd.nextInt(8), ids.size - i)
            (1 until len).foreach(j => pairs += ((ids(i), ids(i + j))))
            i += len
          case 3 => // isolated pair + a duplicate row + a self-loop
            if (ids.size - i >= 2) {
              pairs += ((ids(i), ids(i + 1)))
              pairs += ((ids(i + 1), ids(i))) // reversed duplicate
              pairs += ((ids(i), ids(i)))     // self-loop
            }
            i += 2
        }
      }
      val expected = unionFind(pairs.toSeq)
      val rpa = 1 + rnd.nextInt(3)
      val got = graft.queries.TextOps
        .clustersOf(pairs.toSeq.toDF("id_a", "id_b"), roundsPerAction = rpa)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected,
        s"trial $trial (rpa=$rpa): ${got.toSet.diff(expected.toSet).take(5)} vs " +
          s"${expected.toSet.diff(got.toSet).take(5)}")
    }
  }

  test("dedup clusters: driver finish is bit-equal to the distributed route") {
    import spark.implicits._
    // r16: clustersOf finishes on the driver (bounded collect + exact
    // union-find) once the edge set fits CcFinishEdgeCap. Pin the
    // three routes to identical labels on a shape that needs several
    // levels: a 30-edge chain + a clique + an isolated pair. Chain ids
    // are SHUFFLED along the path — an id-monotone path is the
    // propagate+contract worst case (contraction strips O(1) nodes per
    // level and per-level plan costs compound; see the CcFinishEdgeCap
    // scaladoc), which is exactly what the driver finish avoids in the
    // default route; the seam-forced distributed run here needs a
    // realistically-converging shape to terminate in test time.
    val perm = new scala.util.Random(20260817L).shuffle((0 to 30).toVector)
    val chain = (0 until 30).map(i => (perm(i) * 3L, perm(i + 1) * 3L))
    val clique = for (a <- 200L to 204L; b <- a + 1 to 204L) yield (a, b)
    val pairs = (chain ++ clique :+ (500L, 501L)).toDF("id_a", "id_b")
    def run(): Map[Long, Long] = graft.queries.TextOps.clustersOf(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val finished = run() // default cap: driver finish at level 0
    try {
      graft.queries.TextOps.ccFinishCapOverride = Some(0)
      val distributed = run() // seam-forced: never finishes locally
      graft.queries.TextOps.ccFinishCapOverride = Some(8)
      val mixed = run() // distributed batches until <=8 edges, then UF
      assert(distributed == finished)
      assert(mixed == finished)
    } finally graft.queries.TextOps.ccFinishCapOverride = None
    // sanity: the chain collapses to min id 0, the clique to 200
    assert(finished(90L) == 0L && finished(204L) == 200L &&
      finished(501L) == 500L)
  }

  test("dedup clusters: adversarial monotone path contracts deep levels " +
    "at stable per-level cost (constraint/stats barrier)") {
    import spark.implicits._
    // VERDICT r16 item 7: an id-MONOTONE path strips O(1) nodes per
    // contraction level, so a seam-forced distributed run reaches deep
    // levels — where, before the r17 GraftSql.constraintBarrier, the
    // checkpoint's carried constraint set and double-exponentially
    // multiplied sizeInBytes stats compounded per level (r16 measured
    // 17 s -> 258 s PER LEVEL at levels 7->8; the r17 probe found the
    // driver pinned in BigInteger.multiply over million-digit
    // sizeInBytes). With the barrier, 8 levels on this shape run in a
    // few seconds flat — the time budget below fails by an order of
    // magnitude if either compounding returns. Default route unchanged
    // (it driver-finishes at level 0; route equality is pinned by the
    // bit-equality spec above).
    val n = 600
    val pairs = (0 until n - 1).map(i => (i.toLong, i + 1L))
      .toDF("id_a", "id_b")
    graft.queries.TextOps.ccFinishCapOverride = Some(0)
    try {
      val t0 = System.nanoTime()
      // maxRounds 16 at 2 rounds/action = 8 contraction levels
      val out = graft.queries.TextOps
        .clustersOf(pairs, maxRounds = 16).collect()
      val elapsed = (System.nanoTime() - t0) / 1e9
      assert(out.length == n)
      // labels never exceed ids and are monotone toward the min
      assert(out.forall(r => r.getLong(1) <= r.getLong(0)))
      assert(elapsed < 90.0,
        f"8 seam-forced contraction levels took $elapsed%.1f s — " +
          "per-level plan cost is compounding again")
    } finally graft.queries.TextOps.ccFinishCapOverride = None
  }

  test("dedup clusters: reliable checkpoint dir yields identical labels") {
    import spark.implicits._
    // a 9-node chain (diameter 8) forces several batches, exercising the
    // reliable-checkpoint cut repeatedly; plus a disjoint pair
    val chain = (1 until 9).map(i => (i.toLong * 10, (i + 1).toLong * 10))
    val pairs = (chain :+ (7L, 8L)).toDF("id_a", "id_b")
    val local = graft.queries.TextOps.clustersOf(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val reliable = graft.queries.TextOps
      .clustersOf(pairs, checkpointDir = Some(dir)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == local)
    assert(local.filterNot(_._1 < 10L).values.toSet == Set(10L))
    assert(local(7L) == 7L && local(8L) == 7L)
    // the reliable run actually wrote RDD checkpoints to the dir
    assert(new java.io.File(dir).listFiles().nonEmpty)
  }

  test("dedup keep: one canonical per cluster, corpus fully covered") {
    val docs = Tables(spark, sf, "documents").count()
    val keep = SparkEntry.queries("q_doc_dedup_keep")(spark, sf).collect()
    assert(keep.length == docs) // every doc gets a verdict, exactly once
    val byCluster = keep.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      val kept = members.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id"))
      assert(kept.toSeq == Seq(cid)) // exactly the min id survives
      assert(members.forall(_.getAs[Long]("doc_id") >= cid))
    }
  }

  test("split/mix assignments are stable under repartitioning") {
    def collectSorted(q: String, parts: Int) = {
      val df = SparkEntry.queries(q)(spark, sf)
      (if (parts > 0) df.repartition(parts) else df)
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    }
    // hash-based assignment must not depend on physical layout
    assert(collectSorted("q_doc_split", 0).sameElements(collectSorted("q_doc_split", 7)))
    assert(collectSorted("q_doc_mix", 0).sameElements(collectSorted("q_doc_mix", 5)))
    val splits = SparkEntry.queries("q_doc_split")(spark, sf)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "valid", "test")))
  }

  test("token budget: kept docs form a quality-prefix per shard") {
    val rows = SparkEntry.queries("q_doc_token_budget")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("source")).values.foreach { shard =>
      val ordered = shard.sortBy(r =>
        (-r.getAs[Double]("q_score"), r.getAs[Long]("doc_id")))
      // cum_tokens is the running sum in quality order...
      val cums = ordered.map(_.getAs[Long]("cum_tokens"))
      val toks = ordered.map(_.getAs[Long]("n_tokens"))
      assert(cums.head == toks.head)
      (1 until ordered.length).foreach(i => assert(cums(i) == cums(i - 1) + toks(i)))
      // ...and the kept set is a prefix of that order
      val kept = ordered.map(_.getAs[Boolean]("kept"))
      assert(!kept.sliding(2).exists(w => w.length == 2 && !w(0) && w(1)))
    }
  }

  test("embedding dedup clusters are consistent with the near-dup pairs") {
    // r12: the clusters' pair source is the cell-blocked neardupCellsOf
    // at the corpus-scaled cell count; r13: over TRAINED cells (the
    // graded scale path) — assert consistency against exactly that
    // source
    val e = Tables(spark, sf, "embeddings")
    val k = graft.queries.SimilarityOps.scaledCellCount(e)
    val pairs = graft.queries.SimilarityOps
      .neardupCellsOf(e, nCents = k, centsOverride =
        Some(graft.queries.SimilarityOps.trainedCentsOf(spark, sf, k)))
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val clusters = SparkEntry.queries("q_embed_dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(clusters(a) == clusters(b)) }
    clusters.foreach { case (v, c) => assert(c <= v) }
  }

  test("trained-cells entries: deterministic training, memoized build, " +
      "same pair/keep contracts as the seed twins") {
    // r13 promotion guardrails. (a) kmeansOf is bit-deterministic —
    // two independent trainings produce identical float centroids
    // (exact integer-grid means; this is what lets the DuckDB oracle
    // mirror training instead of treating it as opaque).
    val e = Tables(spark, sf, "embeddings")
    def train() = graft.queries.SimilarityOps.kmeansOf(e, k = 16, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toVector)
      .sortBy(_._1)
    val t1 = train(); val t2 = train()
    assert(t1.map(_._1).sameElements(t2.map(_._1)))
    t1.zip(t2).foreach { case ((_, v1), (_, v2)) => assert(v1 == v2) }
    // (b) trainedCentsOf memoizes per (session, dir, k): the SAME frame
    // comes back, so repeated plan construction (bench, scale sweeps)
    // never re-pays the Lloyd build
    val c1 = graft.queries.SimilarityOps.trainedCentsOf(spark, sf, 16)
    assert(c1 eq graft.queries.SimilarityOps.trainedCentsOf(spark, sf, 16))
    // (c) contracts match the seed twins: pairs ordered and thresholded,
    // semdedup emits every vector exactly once with a sound keep verdict
    val pairs = SparkEntry.queries("q_embed_neardup_cells_trained")(spark, sf)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cosine") > 0.25)
    }
    val sem = SparkEntry.queries("q_embed_semdedup_trained")(spark, sf).collect()
    assert(sem.length == e.count())
    sem.foreach { r =>
      val mpc = Option(r.getAs[java.lang.Double]("max_prior_cosine"))
      val keep = r.getAs[Boolean]("keep")
      assert(keep == mpc.forall(_ <= graft.queries.SimilarityOps.SemdedupTau))
    }
  }

  test("2level recall sweep: one row per probe count, monotone in probes") {
    // candidates re-rank by EXACT cosine, so widening the probe set can
    // only add higher-cosine candidates — a displaced hit implies the
    // displacer is a deeper true-top member, i.e. hits never decrease
    val rows = SparkEntry.queries("q_embed_2level_recall")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("nprobe") -> r.getAs[Double]("recall_at_3"))
      .toMap
    assert(rows.keySet == Set(1L, 2L, 4L))
    assert(rows(1L) <= rows(2L) && rows(2L) <= rows(4L))
    assert(rows.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("TrainedCellConsumers registry matches the query definitions: " +
      "every listed entry builds the trained memo, seed twins don't") {
    // the bench warm-up derives its list from this registry (ADVICE
    // r13) — pin it BEHAVIORALLY so a future trained-cell consumer
    // that forgets to register is caught here, not by a cold first
    // timed reading in a subset bench run
    val reg = graft.queries.SimilarityOps.TrainedCellConsumers
    assert(reg.subsetOf(SparkEntry.queries.keySet))
    reg.foreach { name =>
      graft.queries.SimilarityOps.clearTrainedCentsCache()
      SparkEntry.queries(name)(spark, sf) // construction routes on trained cells
      assert(graft.queries.SimilarityOps.trainedCentsCacheSize > 0,
        s"$name is registered but did not touch the trained memo")
    }
    // the seed twins must NOT silently depend on the trained build
    for (seed <- Seq("q_embed_neardup_cells", "q_embed_semdedup",
        "q_doc_sem_decontam_ivf")) {
      graft.queries.SimilarityOps.clearTrainedCentsCache()
      SparkEntry.queries(seed)(spark, sf)
      assert(graft.queries.SimilarityOps.trainedCentsCacheSize == 0,
        s"$seed unexpectedly builds the trained memo — register it")
    }
  }

  test("graded 2-level assignment (r15): flat below TwoLevelAssignK, " +
      "the trained-supers route at/above it, entry == explicit twin") {
    import graft.queries.SimilarityOps
    // the threshold arithmetic itself
    assert(SimilarityOps.gradedAssignSupers(
      SimilarityOps.TwoLevelAssignK - 1) == 0)
    assert(SimilarityOps.gradedAssignSupers(
      SimilarityOps.TwoLevelAssignK) == -1)
    val e = Tables(spark, sf, "embeddings")
    val k = SimilarityOps.scaledCellCountOf(spark, sf)
    assert(k < SimilarityOps.TwoLevelAssignK,
      "fixture corpus must sit under the threshold for this spec")
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("centroid_id"),
        r.getAs[Boolean]("keep"))).sortBy(_._1).toSeq
    def trained() = SimilarityOps.trainedCentsOf(spark, sf, k)
    // below the threshold the registered entry IS the flat form
    val flat = rowsOf(SimilarityOps.semdedupOf(e, nCents = k,
      centsOverride = Some(trained())))
    assert(rowsOf(
      SparkEntry.queries("q_embed_semdedup_trained")(spark, sf)) == flat)
    // force the route on the same corpus (seam): the entry must equal
    // the explicit auto-sized trained-supers twin — the same swap the
    // 10× oracle gate hash-checks at the real constant (k=160 ≥ 128)
    val prev = SimilarityOps.twoLevelAssignKOverride
    SimilarityOps.twoLevelAssignKOverride = Some(k)
    try {
      val two = rowsOf(
        SparkEntry.queries("q_embed_semdedup_trained")(spark, sf))
      val twin = rowsOf(SimilarityOps.semdedupOf(e, nCents = k,
        centsOverride = Some(trained()),
        assignSupers = -1, trainSupers = true))
      assert(two == twin)
      // not vacuous: the coarse route genuinely re-assigns some vectors
      // on this corpus (measured at 10×: 1559/20000 differ, 3 verdicts)
      assert(two.map(t => (t._1, t._2)) != flat.map(t => (t._1, t._2)),
        "2-level route coincided with flat — spec corpus exercises nothing")
      // the decontamination family takes the same branch
      val sem2 = graft.queries.TextOps.semDecontamIvfOf(e, nCents = k,
        centsOverride = Some(trained()), twoLevelTrained = true)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("centroid_id"))).sortBy(_._1).toSeq
      val semEntry = SparkEntry.queries("q_doc_sem_decontam_ivf_trained")(
        spark, sf).collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("centroid_id"))).sortBy(_._1).toSeq
      assert(semEntry == sem2)
    } finally SimilarityOps.twoLevelAssignKOverride = prev
  }

  test("collectCentroids refuses a corpus-scale collect LOUDLY " +
      "(CentroidCollectCap) instead of OOMing the driver") {
    import graft.queries.SimilarityOps
    val over = spark.range(SimilarityOps.CentroidCollectCap + 1L)
      .select(col("id").as("centroid_id"), array(lit(0.5f)).as("c_emb"))
    val ex = intercept[IllegalStateException] {
      SimilarityOps.collectCentroidsOf(over)
    }
    assert(ex.getMessage.contains("CentroidCollectCap"))
    assert(ex.getMessage.contains("2-level"))
    // the cap is a ceiling, not a behavior change: a bounded table
    // still collects whole
    assert(SimilarityOps.collectCentroidsOf(
      over.limit(64)).ids.length == 64)
  }

  test("distributed 2-level construction (r16): above a seam-lowered " +
      "collect cap the trained index builds WITHOUT a full-table " +
      "driver collect, bit-equal to the driver-built index") {
    import graft.queries.SimilarityOps
    import graft.functions.{Centroid2LevelIndex, CentroidIndex}
    def eqIdx(a: CentroidIndex, b: CentroidIndex, what: String): Unit = {
      assert(a.ids.toSeq == b.ids.toSeq, s"$what ids")
      assert(a.vecs.length == b.vecs.length &&
        a.vecs.indices.forall(i => a.vecs(i).sameElements(b.vecs(i))),
        s"$what vecs (bit-equality)")
      // norms compare as raw bits — "close" is not the contract
      assert(a.norms.map(java.lang.Double.doubleToLongBits).toSeq ==
        b.norms.map(java.lang.Double.doubleToLongBits).toSeq, s"$what norms")
    }
    def eq2(a: Centroid2LevelIndex, b: Centroid2LevelIndex): Unit = {
      eqIdx(a.supers, b.supers, "supers")
      assert(a.children.length == b.children.length)
      a.children.indices.foreach(j =>
        eqIdx(a.children(j), b.children(j), s"children($j)"))
    }
    val e = Tables(spark, sf, "embeddings")
    // a trained centroid set with real structure (more supers than the
    // fixture's 4, uneven cells) — k=64 over the sf corpus
    val cents = SimilarityOps.kmeansOf(e, k = 64, iters = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val k = cents.count().toInt
      assert(k > 16, "need a non-trivial survivor count")
      val driver = Centroid2LevelIndex.buildTrained(
        SimilarityOps.collectCentroidsOf(cents),
        math.max(2, math.floor(math.sqrt(k.toDouble)).toInt))
      val prev = SimilarityOps.centroidCollectCapOverride
      SimilarityOps.centroidCollectCapOverride = Some(k - 1)
      try {
        // under the lowered cap the driver path is IMPOSSIBLE — the
        // flat collect refuses loudly and names the distributed route
        val ex = intercept[IllegalStateException] {
          SimilarityOps.collectCentroidsOf(cents)
        }
        assert(ex.getMessage.contains("buildTrainedDistributed"))
        // ...while the shared constructor routes to the distributed
        // build and yields the driver index BIT-FOR-BIT
        eq2(SimilarityOps.trained2LevelIndexOf(cents, -1), driver)
      } finally SimilarityOps.centroidCollectCapOverride = prev
      // degenerate corpus: identical centroids collapse every super —
      // the empty-super keep-prior-mean rounds AND the anchor backfill
      // must match the driver build too
      val dup = spark.range(10).select(col("id").as("centroid_id"),
        array((0 until 4).map(_ => lit(0.25f)): _*).as("c_emb"))
      val dDriver = Centroid2LevelIndex.buildTrained(
        SimilarityOps.collectCentroidsOf(dup), 3)
      // direct distributed call (a mega-group under a lowered cap
      // refuses by design — the refusal is pinned below)
      eq2(SimilarityOps.buildTrainedDistributed(dup, 3), dDriver)
      // a super whose children outgrow the cap refuses LOUDLY with the
      // fix named (nSupers), never a silent unbounded group collect
      SimilarityOps.centroidCollectCapOverride = Some(3)
      try {
        val ex2 = intercept[IllegalStateException] {
          SimilarityOps.buildTrainedDistributed(dup, 2)
        }
        assert(ex2.getMessage.contains("nSupers") &&
          ex2.getMessage.contains("CentroidCollectCap"))
      } finally SimilarityOps.centroidCollectCapOverride = prev
    } finally cents.unpersist()
  }

  test("distributed 2-level construction (r16): the graded trained " +
      "entry's RESULTS are identical whichever construction ran") {
    import graft.queries.SimilarityOps
    val k = SimilarityOps.scaledCellCountOf(spark, sf)
    def rowsOf() = SparkEntry.queries("q_embed_semdedup_trained")(
      spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("centroid_id"),
        r.getAs[Boolean]("keep"))).sortBy(_._1).toSeq
    val prevK = SimilarityOps.twoLevelAssignKOverride
    val prevCap = SimilarityOps.centroidCollectCapOverride
    // force the 2-level route on the fixture corpus (the 10× gate's
    // real-constant swap), then flip ONLY the construction under it
    SimilarityOps.twoLevelAssignKOverride = Some(k)
    try {
      val viaDriver = rowsOf()
      // cap sits ≥ nSupers (the seeds must fit) but below the survivor
      // count, so the flip to the distributed construction is real
      val survivors = SimilarityOps.trainedCentsOf(spark, sf, k).count().toInt
      assert(survivors > 8, "fixture survivors must exceed the lowered cap")
      SimilarityOps.centroidCollectCapOverride = Some(8)
      val viaDistributed = try rowsOf()
        finally SimilarityOps.centroidCollectCapOverride = prevCap
      assert(viaDriver == viaDistributed)
    } finally SimilarityOps.twoLevelAssignKOverride = prevK
  }

  test("corpus_prep verdicts agree with each standalone stage query") {
    def q(n: String) = SparkEntry.queries(n)(spark, sf)
    val prep = q("q_doc_corpus_prep").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(prep.size == Tables(spark, sf, "documents").count())
    val langPred = q("q_doc_langid").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    val qualKeep = q("q_doc_quality").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val dedupKeep = q("q_doc_dedup_keep").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val split = q("q_doc_split").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val exactCanon = q("q_doc_dedup_exact").collect()
      .map(_.getAs[Long]("canonical_id")).toSet
    prep.foreach { case (id, r) =>
      assert(r.getAs[Boolean]("lang_ok") == (langPred(id) == "en"))
      assert(r.getAs[Boolean]("quality_ok") == qualKeep(id))
      assert(r.getAs[Boolean]("exact_canonical") == exactCanon.contains(id))
      assert(r.getAs[Boolean]("neardup_canonical") == dedupKeep(id))
      assert(r.getAs[String]("split") == split(id))
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Boolean]("lang_ok") && r.getAs[Boolean]("quality_ok") &&
          r.getAs[Boolean]("exact_canonical") && r.getAs[Boolean]("neardup_canonical")))
    }
  }

  test("pq: seed vectors encode to themselves, adc ranks by distance") {
    val enc = SparkEntry.queries("q_embed_pq_encode")(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("codes_csv")).toMap
    assert(enc.size == Tables(spark, sf, "embeddings").count())
    // a codebook seed vector is at distance 0 from its own codeword in
    // every subspace, and random floats make that minimum unique
    (0L until 16L).foreach { id =>
      assert(enc(id) == Array.fill(8)(id.toString).mkString(","))
    }
    enc.values.foreach { csv =>
      val codes = csv.split(",").map(_.toInt)
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
    }
    val adc = SparkEntry.queries("q_embed_pq_adc")(spark, sf).collect()
    assert(adc.length == 10 * 3)
    adc.groupBy(_.getAs[Long]("q_id")).values.foreach { rows =>
      val byRk = rows.sortBy(_.getAs[Int]("rk"))
      assert(byRk.map(_.getAs[Int]("rk")).toSeq == Seq(1, 2, 3))
      // approximate distances are sorted ascending in rank order
      val d = byRk.map(_.getAs[Long]("adc_q"))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b })
    }
  }

  test("pq training: joint Lloyd is deterministic and improves the objective") {
    import graft.queries.SimilarityOps
    val e = Tables(spark, sf, "embeddings")
    val cb0 = SimilarityOps.pqTrainOf(e, iters = 0) // the fixed seed codebook
    val cb3 = SimilarityOps.pqTrainOf(e, iters = 3)
    val o0 = SimilarityOps.pqObjectiveOf(e, cb0)
    val o3 = SimilarityOps.pqObjectiveOf(e, cb3)
    // Lloyd never worsens the quantization objective, and on random data
    // it strictly improves from the arbitrary seed
    assert(o3 < o0)
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code"),
        r.getAs[scala.collection.Seq[Float]]("c_v").toSeq))
      .sortBy(t => (t._1, t._2))
    assert(snap(cb3).sameElements(snap(SimilarityOps.pqTrainOf(e, iters = 3))))
    // every subspace keeps a usable codebook (degenerate cells may drop,
    // but most codewords survive on random data)
    val perSub = cb3.groupBy("sub").count().collect()
      .map(r => r.getAs[Int]("sub") -> r.getAs[Long]("count")).toMap
    (0 until 8).foreach(sub => assert(perSub(sub) >= 8))
  }

  test("ivfpq: codebook seeds encode to themselves within their cell") {
    val enc = SparkEntry.queries("q_embed_ivfpq_encode")(spark, sf).collect()
    assert(enc.length == Tables(spark, sf, "embeddings").count())
    val assign = SparkEntry.queries("q_embed_ivf_assign")(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("centroid_id")).toMap
    enc.foreach { r =>
      // the stored cell is the IVF assignment, codes are 8 values in [0,16)
      assert(r.getAs[Long]("centroid_id") == assign(r.getAs[Long]("vec_id")))
      val codes = r.getAs[String]("codes_csv").split(",").map(_.toInt)
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
    }
    // a residual-codebook seed vector (vec_id in [16,32)) is at distance
    // zero from its own codeword in every subspace
    enc.filter(r => r.getAs[Long]("vec_id") >= 16 && r.getAs[Long]("vec_id") < 32)
      .foreach { r =>
        val id = r.getAs[Long]("vec_id") - 16
        assert(r.getAs[String]("codes_csv") ==
          Array.fill(8)(id.toString).mkString(","))
      }
    val res = SparkEntry.queries("q_embed_ivfpq_search")(spark, sf).collect()
    assert(res.length == 10 * 3)
    res.groupBy(_.getAs[Long]("q_id")).values.foreach { rows =>
      val byRk = rows.sortBy(_.getAs[Int]("rk"))
      assert(byRk.map(_.getAs[Int]("rk")).toSeq == Seq(1, 2, 3))
      val d = byRk.map(_.getAs[Long]("adc_q"))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b })
      assert(rows.forall(r => r.getAs[Long]("c_id") != r.getAs[Long]("q_id")))
    }
  }

  test("dup span strip: untouched docs pass through, stripped are subsequences") {
    val strip = SparkEntry.queries("q_doc_dup_span_strip")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val frac = SparkEntry.queries("q_doc_dup_spans")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_fraction")).toMap
    val texts = Tables(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(strip.size == texts.size)
    strip.foreach { case (id, r) =>
      val clean = r.getAs[String]("clean_text")
      val nKept = r.getAs[Long]("n_kept_tokens")
      val orig = texts(id).split(" ")
      if (frac.getOrElse(id, 0.0) == 0.0) {
        assert(clean == texts(id) && nKept == orig.length) // no dup → identity
      } else {
        assert(nKept < orig.length) // something was stripped
        if (clean.isEmpty) assert(nKept == 0L)
        else {
          val kept = clean.split(" ")
          assert(kept.length == nKept)
          // kept tokens form a subsequence of the original token stream
          var i = 0
          kept.foreach { t =>
            while (i < orig.length && orig(i) != t) i += 1
            assert(i < orig.length); i += 1
          }
        }
      }
    }
  }

  test("bpe training learns the planted merges; compiled counter matches encoder") {
    import graft.queries.TextOps
    val s = spark
    import s.implicits._
    // planted corpus: every word is "ab" → the only learnable merges are
    // (a,b) then (ab,</w>), in exactly that order, then training stops
    val tiny = Seq((0L, "ab ab ab"), (1L, "ab")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrainOf(tiny, nMerges = 10)
    assert(merges == Seq(("a", "b"), ("ab", TextOps.BpeEnd)))
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    assert(TextOps.bpeSegment("ab", ranks) == Seq("ab" + TextOps.BpeEnd))
    assert(TextOps.bpeSegment("abab", ranks) == Seq("ab", "ab" + TextOps.BpeEnd))
    // real corpus: deterministic training, and the compiled BpeCount
    // expression agrees with the spec-side encoder document by document
    val docs = Tables(spark, sf, "documents")
    val m1 = TextOps.bpeTrainOf(docs, nMerges = 30, vocabCap = 1000)
    assert(m1 == TextOps.bpeTrainOf(docs, nMerges = 30, vocabCap = 1000))
    assert(m1.length == 30 && m1.distinct.length == 30)
    val ranks1 = m1.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val sample = docs.filter(col("doc_id") < 50)
    val counted = TextOps.bpeTokenizeOf(sample, m1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_subwords")).toMap
    sample.collect().foreach { r =>
      val expect = r.getAs[String]("text").split(" ").filter(_.nonEmpty)
        .map(w => TextOps.bpeSegment(w, ranks1).length.toLong).sum
      assert(counted(r.getAs[Long]("doc_id")) == expect)
    }
  }

  test("exact dedup covers all docs") {
    val total = Tables(spark, sf, "documents").count()
    val deduped = SparkEntry.queries("q_doc_dedup_exact")(spark, sf)
      .agg(sum("n_copies")).collect()(0).getLong(0)
    assert(deduped == total)
  }

  test("sessionize: session count per user >= 1, events conserved") {
    val sessions = SparkEntry.queries("q_events_sessionize")(spark, sf)
    val totalEvents = Tables(spark, sf, "events").count()
    val sessionEvents = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    assert(sessionEvents == totalEvents)
    val bad = sessions.filter(col("session_start") > col("session_end")).count()
    assert(bad == 0)
  }

  test("image neardup: pairs share a band; hamming matches byte recompute") {
    val rows = SparkEntry.queries("q_mm_image_neardup")(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent recompute of the aHash bands straight from the source
    // bytes (no codec) — proves the PNG decode round trip is faithful
    def bandsOf(t: String): Array[Int] = {
      val c = t.getBytes("UTF-8")
      val n = c.length
      val w = math.min(64, math.max(n, 1))
      val h = (math.max(n, 1) + w - 1) / w
      val s = Array.tabulate(64) { k =>
        val idx = ((k / 8) * h / 8) * w + ((k % 8) * w / 8)
        if (idx < n) c(idx) & 0xff else 0
      }
      val m = s.foldLeft(0L)(_ + _) / 64
      val b = new Array[Int](4)
      for (k <- 0 until 64) if (s(k) > m) b(k / 16) |= 1 << (k % 16)
      b
    }
    rows.foreach { r =>
      val (a, bId) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      assert(a < bId)
      val (ba, bb) = (bandsOf(texts(a)), bandsOf(texts(bId)))
      val ham = (0 until 4).map(i => Integer.bitCount(ba(i) ^ bb(i))).sum
      assert(ham == r.getAs[Int]("hamming") && ham <= 8)
      // LSH invariant: a surviving pair collided on at least one band
      assert((0 until 4).exists(i => ba(i) == bb(i)))
    }
  }

  test("decode_resize round-trips real pixels through the PNG codec") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("q_mm_decode_resize")(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val n = text.getBytes("UTF-8").length
      val w = math.min(64, math.max(n, 1))
      assert(r.getAs[Int]("width") == w)
      assert(r.getAs[Int]("height") == (math.max(n, 1) + w - 1) / w)
      // nn_0_0 samples pixel (0,0) of the DECODED raster = byte 0 of the
      // original text — only true if ImageIO really round-tripped pixels
      assert(r.getAs[Int]("nn_0_0") == (text.getBytes("UTF-8")(0) & 0xff))
      assert(r.getAs[Long]("mean_gray") >= 0L && r.getAs[Long]("mean_gray") <= 255L)
    }
  }

  test("IVF-PQ index round-trips through parquet with identical search results") {
    val e = Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx").toString
    graft.queries.SimilarityOps.saveIvfPqIndex(e, dir)
    // the persisted layout is complete: centroids + codebook + codes —
    // ALL on the pointer layout since r11 (resolve, don't assume)
    for (part <- Seq("centroids", "codebook", "codes"))
      assert(spark.read.parquet(graft.operators.IndexCompact
        .resolvePath(dir, s"$part.parquet")).count() > 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id", "rk", "adc_q").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .sortBy(t => (t._1, t._3))
    val loaded = rows(graft.queries.SimilarityOps.searchIvfPqIndex(
      spark, e.filter(col("vec_id") < 10), dir))
    val direct = rows(SparkEntry.queries("q_embed_ivfpq_search")(spark, sf))
    // bit-identical: integer-grid distances, same LUT arithmetic from
    // the loaded floats — not just the same neighbor ids
    assert(loaded.nonEmpty && loaded.sameElements(direct))
  }

  test("jpeg tier emits genuine JFIF bytes and decodes within the MAE bound") {
    // the payloads really are JPEG: SOI + JFIF/APP0 magic, not PNG
    val payloads = graft.queries.MultimodalOps.jpegAssets(spark, sf)
      .select("content").collect().map(_.getAs[Array[Byte]](0))
    assert(payloads.nonEmpty)
    payloads.foreach { b =>
      assert((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff)
    }
    // decode really ran and the lossy error envelope is sane: every doc
    // within the published bound (the oracle asserts the same verdict)
    val rows = SparkEntry.queries("q_mm_jpeg_decode")(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      assert(r.getAs[Boolean]("mae_ok"))
      val n = r.getAs[Int]("src_bytes")
      val w = math.min(64, math.max(n, 1))
      assert(r.getAs[Int]("width") == w)
      assert(r.getAs[Int]("height") == (math.max(n, 1) + w - 1) / w)
    }
  }

  test("ivfpq rerank: exact re-ranking of the ADC shortlist, broadcast fetch") {
    val df = SparkEntry.queries("q_embed_ivfpq_rerank")(spark, sf)
    // the raw-vector fetch must be broadcast joins (the shortlist
    // broadcasts INTO the corpus scan) — a shuffled join here would
    // move corpus vectors, the exact thing two-stage retrieval avoids.
    // (Index DERIVATION upstream may shuffle; the explicit broadcast()
    // hints pin the two fetch joins themselves to BroadcastHashJoin.)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    val rows = df.collect()
    assert(rows.length == 10 * 3)
    // embeddings in hand, replay stage 2 exactly: per query, the final
    // top-3 must be the exact-cosine ordering over SOME 10-candidate
    // superset — verify rank order + cosine monotonicity + no self-hit
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { g =>
      val byRk = g.sortBy(_.getAs[Int]("rk"))
      assert(byRk.map(_.getAs[Int]("rk")).toSeq == Seq(1, 2, 3))
      val cs = byRk.map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      assert(g.forall(r => r.getAs[Long]("c_id") != r.getAs[Long]("q_id")))
    }
    // stage-2 exactness: rerank cosines match the brute-force exact
    // cosines for the same (q, c) pairs bit-for-bit
    val exact = SparkEntry.queries("q_embed_cosine_topk")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")) -> r.getAs[Double]("cosine"))
      .toMap
    rows.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))
      exact.get(key).foreach(c => assert(c == r.getAs[Double]("cosine")))
    }
  }

  test("shard shuffle: dense per-shard positions, stable under repartitioning") {
    val df = SparkEntry.queries("q_doc_shard_shuffle")(spark, sf)
    val rows = df.collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    rows.foreach(r => assert(r.getAs[Long]("shard") >= 0 && r.getAs[Long]("shard") < 8))
    // positions are dense 1..n within each shard (a usable training order)
    rows.groupBy(_.getAs[Long]("shard")).values.foreach { g =>
      assert(g.map(_.getAs[Long]("pos")).sorted.sameElements(1L to g.length))
    }
    // hash-derived order must not depend on physical layout
    def snap(parts: Int) = {
      val d = SparkEntry.queries("q_doc_shard_shuffle")(spark, sf)
      (if (parts > 0) d.repartition(parts) else d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    }
    assert(snap(0).sameElements(snap(7)))
  }

  test("pii scrub redacts every planted email and digit run") {
    val rows = SparkEntry.queries("q_doc_pii_scrub")(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_emails") >= 1)     // the planted address
      // the planted id doc_id*7919 only forms a 4+-digit run for id >= 1
      if (r.getAs[Long]("doc_id") >= 1) {
        assert(r.getAs[Long]("n_digit_runs") >= 1)
        assert(r.getAs[String]("clean_text").contains("<NUM>"))
      }
      val clean = r.getAs[String]("clean_text")
      // nothing PII-shaped survives the scrub
      assert(!clean.matches(".*[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}.*"))
      assert(!clean.matches(".*[0-9]{4,}.*"))
      assert(clean.contains("<EMAIL>"))
    }
    // scan-shaped: a map-only projection, no shuffle
    val plan = SparkEntry.queries("q_doc_pii_scrub")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("url stats: planted hosts fully accounted, refs conserve") {
    val rows = SparkEntry.queries("q_doc_url_stats")(spark, sf).collect()
    val nDocs = Tables(spark, sf, "documents").count()
    val hosts = rows.map(_.getAs[String]("host")).toSet
    assert(hosts == ((0 until 7).map(i => s"site$i.example.org") ++
      (0 until 3).map(i => s"www.ref$i.net")).toSet)
    // every doc plants exactly 2 refs; totals conserve
    assert(rows.map(_.getAs[Long]("n_refs")).sum == 2 * nDocs)
    assert(rows.filter(_.getAs[String]("host").startsWith("site"))
      .map(_.getAs[Long]("n_docs")).sum == nDocs)
  }

  test("wav tier emits genuine RIFF/WAVE bytes and round-trips samples losslessly") {
    // the payloads really are WAV: RIFF magic + WAVE form type
    val payloads = graft.queries.MultimodalOps.wavAssets(spark, sf)
      .select("doc_id", "content").collect()
      .map(r => r.getAs[Long](0) -> r.getAs[Array[Byte]](1))
    assert(payloads.nonEmpty)
    payloads.foreach { case (_, b) =>
      assert(new String(b.take(4), "US-ASCII") == "RIFF")
      assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    }
    // PCM is lossless: decoding any payload returns the source bytes exactly
    val texts = Tables(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    payloads.take(20).foreach { case (id, b) =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      val got = ais.readAllBytes()
      val want = texts(id).getBytes("UTF-8")
      assert(got.sameElements(if (want.isEmpty) Array[Byte](0) else want))
    }
    val rows = SparkEntry.queries("q_mm_wav_decode")(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      assert(r.getAs[Int]("sample_rate") == 8000 && r.getAs[Int]("bits") == 8)
      assert(r.getAs[Int]("peak_amp") <= 255)
      assert(r.getAs[Long]("mean_amp") <= r.getAs[Int]("peak_amp"))
    }
  }

  test("gif tier emits genuine multi-frame GIF containers, frames lossless") {
    // the payloads really are GIF containers
    val payloads = graft.queries.MultimodalOps.gifAssets(spark, sf)
      .select("doc_id", "content").collect()
      .map(r => r.getAs[Long](0) -> r.getAs[Array[Byte]](1))
    assert(payloads.nonEmpty)
    payloads.foreach { case (_, b) =>
      val magic = new String(b.take(6), "US-ASCII")
      assert(magic == "GIF89a" || magic == "GIF87a")
    }
    // identity-gray palette => every frame round-trips its 256-byte
    // slice exactly (zero-padded tail); verify ALL frames of 20 docs
    val texts = Tables(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    var sawMulti = false
    payloads.take(20).foreach { case (id, b) =>
      val src = texts(id).getBytes("UTF-8")
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      assert(n == math.max(1, (src.length + 255) / 256))
      if (n > 1) sawMulti = true
      (0 until n).foreach { f =>
        val img = reader.read(f)
        assert(img.getWidth == 16 && img.getHeight == 16)
        (0 until 256).foreach { i =>
          val want = if (f * 256 + i < src.length) src(f * 256 + i) & 0xff else 0
          assert((img.getRGB(i % 16, i / 16) & 0xff) == want,
            s"doc $id frame $f pixel $i")
        }
      }
      reader.dispose()
    }
    assert(sawMulti, "fixture must exercise multi-frame containers")
  }

  test("source overlap counts shared distinct shingles per source pair") {
    import spark.implicits._
    // sources A and B share the phrase (2 distinct 3-gram shingles;
    // B repeats it — dedup must count each shingle once); C is disjoint.
    val docs = Seq(
      (1L, "one two three four", "A"),
      (2L, "one two three four one two three four", "B"),
      (3L, "five six seven eight", "C"))
      .toDF("doc_id", "text", "source")
    val got = graft.queries.TextOps.sourceOverlapOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_shared_shingles"))
      .toMap
    // B's self-overlapping repeat adds shingles "four one", "three four
    // one", "four one two" — none shared with A, so the pair count
    // stays the 2 phrase shingles.
    assert(got == Map(("A", "B") -> 2L))
  }

  test("new r6 ops keep scale-safe plans: no cartesian, overlap join-free") {
    // lm_score: model joins may broadcast (AQE) but never cartesian
    val p1 = SparkEntry.queries("q_doc_lm_score")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("CartesianProduct"))
    // bm25: the 1-row stats side must ride a broadcast, not a cartesian
    val p2 = SparkEntry.queries("q_doc_bm25")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("CartesianProduct"))
    assert(p2.contains("BroadcastNestedLoopJoin") || p2.contains("BroadcastHashJoin"))
    // source_overlap: the pair matrix must build WITHOUT any join —
    // collect_set + map-side Generate only
    val p3 = SparkEntry.queries("q_doc_source_overlap")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p3.contains("Join") && p3.contains("Generate") &&
      p3.contains("HashAggregate"))
  }

  test("gopher rules: scan-only plan, keep is the rule conjunction") {
    val df = SparkEntry.queries("q_doc_gopher_rules")(spark, sf)
    // the rule battery must never shuffle: one codegen pass over the scan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"))
    val rows = df.collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      val expect = r.getAs[Boolean]("r_words") && r.getAs[Boolean]("r_mean_len") &&
        r.getAs[Boolean]("r_stop") && r.getAs[Boolean]("r_uniq")
      assert(r.getAs[Boolean]("keep") == expect)
    }
    // the battery must actually discriminate on the test corpus
    assert(rows.exists(_.getAs[Boolean]("keep")) &&
      rows.exists(!_.getAs[Boolean]("keep")))
  }

  test("temperature mix: shares normalize, rare langs boosted, head damped") {
    val rows = SparkEntry.queries("q_doc_temperature_mix")(spark, sf).collect()
    val nat = rows.map(_.getAs[Double]("nat_share")).sum
    val temp = rows.map(_.getAs[Double]("temp_share")).sum
    assert(math.abs(nat - 1.0) < 1e-9 && math.abs(temp - 1.0) < 1e-9)
    val byLang = rows.map(r => r.getAs[String]("lang") -> r).toMap
    // en dominates the corpus -> damped; every minority lang -> boosted
    assert(byLang("en").getAs[Double]("boost") < 1.0)
    rows.filter(_.getAs[String]("lang") != "en")
      .foreach(r => assert(r.getAs[Double]("boost") > 1.0))
    // target allocation never exceeds the corpus total
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(rows.map(_.getAs[Long]("target_docs")).sum <= total)
  }

  test("knn label: one prediction per query, vote bounds, bounded argmax") {
    val df = SparkEntry.queries("q_embed_knn_label")(spark, sf)
    // both the top-k and the vote argmax must bound the shuffle on the
    // map side — the top-k through TopKPerKey's partial
    // WindowGroupLimit (r16), never a bare Window that exchanges and
    // sorts every scored/vote row per key
    val plan = df.queryExecution.executedPlan.toString
    assert(windowsAllBounded(plan), plan)
    val rows = df.collect()
    assert(rows.length == 10 && rows.map(_.getAs[Long]("q_id")).distinct.length == 10)
    rows.foreach { r =>
      val v = r.getAs[Long]("n_votes")
      assert(v >= 1 && v <= 5)
      assert(r.getAs[Boolean]("correct") ==
        (r.getAs[Int]("q_label") == r.getAs[Int]("pred_label")))
    }
  }

  test("contam frac: permille bounds, flag threshold, all train docs kept") {
    val rows = SparkEntry.queries("q_doc_contam_frac")(spark, sf).collect()
    // every train doc (>= 3 tokens, doc_id % 10 != 0) gets a verdict row
    val expected = Tables(spark, sf, "documents")
      .filter(col("doc_id") % 10 =!= 0 && size(split(col("text"), " ")) >= 3)
      .count()
    assert(rows.length == expected)
    rows.foreach { r =>
      val pm = r.getAs[Long]("contam_permille")
      assert(pm >= 0 && pm <= 1000)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Boolean]("flagged") == (pm >= 200))
    }
  }

  test("ppl buckets: terciles balanced per source, scores ordered by stratum") {
    val rows = SparkEntry.queries("q_doc_ppl_buckets")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("source")).values.foreach { g =>
      val sizes = g.groupBy(_.getAs[Int]("bucket")).view.mapValues(_.length)
      // ntile: bucket sizes differ by at most 1
      assert(sizes.values.max - sizes.values.min <= 1)
      // head scores dominate middle dominate tail (weak, ties allowed)
      def scores(b: Int) = g.filter(_.getAs[Int]("bucket") == b)
        .map(_.getAs[Double]("lm_score"))
      assert(scores(1).min >= scores(2).max - 1e-12)
      assert(scores(2).min >= scores(3).max - 1e-12)
    }
  }

  test("scaledCellCount: floors at the oracle convention, scales at ~125/cell") {
    // the knob every graded density entry runs (r12): floor 16 keeps
    // the sf0.01 oracle convention; above the floor, cells hold ~125
    // vectors so within-cell pairwise stays linear in total
    import graft.queries.SimilarityOps.scaledCellCount
    val e = Tables(spark, sf, "embeddings")
    assert(scaledCellCount(e) == math.max(16L, e.count() / 125L).toInt)
    assert(scaledCellCount(e.limit(500)) == 16)   // sf0.01 scale: the floor
    assert(scaledCellCount(e.limit(2000)) == 16)  // 2000/125 = 16: boundary
    val big = e.crossJoin(spark.range(100).select(col("id").as("rep")))
      .select(col("vec_id"), col("embedding"))
    assert(scaledCellCount(big) == big.count() / 125) // scaling regime
  }

  test("sem decontam: OR of signals, cell-scoped semantic side bounded by " +
      "the exact form's recall ceiling") {
    // r12: the registered query routes its semantic side through the
    // IVF cell blocking at the corpus-scaled cell count; the flat
    // |train|×|eval| form survives as semDecontamExactOf, pinned HERE
    // (fixed fixture scale) as the recall ceiling — out of the graded
    // scale path.
    val df = SparkEntry.queries("q_doc_sem_decontam")(spark, sf)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("flagged") ==
        (r.getAs[Boolean]("flagged_lex") || r.getAs[Boolean]("flagged_sem")))
      if (!r.isNullAt(r.fieldIndex("max_cell_cosine"))) {
        val c = r.getAs[Double]("max_cell_cosine")
        assert(c >= -1.0001 && c <= 1.0001)
        assert(r.getAs[Long]("nearest_eval_id") % 10 == 0)
      } else assert(!r.getAs[Boolean]("flagged_sem"),
        "a doc with no eval in its cell cannot be semantically flagged")
    }
    // the semantic signal must actually discriminate on this corpus
    assert(rows.exists(_.getAs[Boolean]("flagged_sem")) &&
      rows.exists(!_.getAs[Boolean]("flagged_sem")))
    // ceiling audit: cell-scoping only REMOVES candidates, so the cell
    // max never exceeds the exact max and IVF flags ⊆ exact flags
    // (genuine contamination, cosine ≈ 1, co-assigns by construction)
    val e = Tables(spark, sf, "embeddings")
    val exact = graft.queries.TextOps.semDecontamExactOf(e).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val ivf = graft.queries.TextOps.semDecontamIvfOf(e,
      nCents = graft.queries.SimilarityOps.scaledCellCount(e)).collect()
    assert(ivf.length == exact.size)
    var ivFlags = 0
    ivf.foreach { r =>
      val ex = exact(r.getAs[Long]("doc_id"))
      if (!r.isNullAt(r.fieldIndex("max_cell_cosine")))
        assert(r.getAs[Double]("max_cell_cosine") <=
          ex.getAs[Double]("max_eval_cosine") + 1e-12,
          s"cell max exceeded the exact ceiling for doc ${r.getAs[Long]("doc_id")}")
      if (r.getAs[Boolean]("flagged_sem")) {
        ivFlags += 1
        assert(ex.getAs[Boolean]("flagged_sem"),
          s"IVF flagged doc ${r.getAs[Long]("doc_id")} the exact form didn't")
      }
    }
    val exFlags = exact.values.count(_.getAs[Boolean]("flagged_sem"))
    println(s"[semdecon] exact flags=$exFlags, ivf flags=$ivFlags " +
      s"(k=${graft.queries.SimilarityOps.scaledCellCount(e)})")
    assert(ivFlags > 0, "the IVF path lost every semantic flag")
    // r13: the TRAINED-cells blocking (the graded default's semantic
    // side since the router promotion) obeys the same ceiling — cell
    // scoping only removes candidates under ANY blocking, Lloyd or seed
    val k = graft.queries.SimilarityOps.scaledCellCount(e)
    val trained = graft.queries.TextOps.semDecontamIvfOf(e, nCents = k,
      centsOverride =
        Some(graft.queries.SimilarityOps.trainedCentsOf(spark, sf, k)))
      .collect()
    assert(trained.length == exact.size)
    var trFlags = 0
    trained.foreach { r =>
      val ex = exact(r.getAs[Long]("doc_id"))
      if (!r.isNullAt(r.fieldIndex("max_cell_cosine")))
        assert(r.getAs[Double]("max_cell_cosine") <=
          ex.getAs[Double]("max_eval_cosine") + 1e-12,
          s"trained cell max exceeded the exact ceiling for doc ${r.getAs[Long]("doc_id")}")
      if (r.getAs[Boolean]("flagged_sem")) {
        trFlags += 1
        assert(ex.getAs[Boolean]("flagged_sem"),
          s"trained IVF flagged doc ${r.getAs[Long]("doc_id")} the exact form didn't")
      }
    }
    assert(trFlags > 0, "the trained path lost every semantic flag")
  }

  test("chunk windows: scan-only Generate, chunks tile every document") {
    val df = SparkEntry.queries("q_doc_chunk_windows")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Generate") && !p.contains("Exchange") && !p.contains("Join"))
    val byDoc = df.collect().groupBy(_.getAs[Long]("doc_id"))
    val nToks = Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    byDoc.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Int]("chunk_idx"))
      // contiguous indices from 0; last chunk reaches the doc's end
      assert(sorted.map(_.getAs[Int]("chunk_idx")).toSeq ==
        sorted.indices.map(identity))
      val last = sorted.last
      assert(last.getAs[Int]("start_tok") + last.getAs[Int]("n_chunk") == nToks(id))
      // every chunk's text has exactly n_chunk tokens
      sorted.foreach { c =>
        assert(c.getAs[String]("chunk_text").split(" ").length ==
          c.getAs[Int]("n_chunk"))
      }
    }
  }

  test("text index: round trip covers shard, planted dups hit both tiers") {
    import spark.implicits._
    // the driver query round-trips through parquet; every shard doc
    // must come back with a verdict and keep == no-dup-found
    val rows = SparkEntry.queries("q_doc_index_dedup")(spark, sf).collect()
    val shard = Tables(spark, sf, "documents")
      .filter(col("doc_id") % 3 =!= 0).count()
    assert(rows.length == shard)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("keep") ==
        (r.isNullAt(r.fieldIndex("dup_exact_of")) &&
          r.isNullAt(r.fieldIndex("dup_near_of"))))
    }
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("dup_near_of"))))
    // planted corpus: the synthetic docs have no exact dups, so freeze
    // a tiny index and send a shard with one exact copy, one near copy
    // (one token appended), and one fresh doc
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val idx = Seq((1L, base), (2L, "alpha beta gamma delta epsilon zeta " +
      "eta theta iota kappa lambda mu nu xi omicron pi rho sigma"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_tidx").toString
    graft.queries.TextOps.saveTextIndex(idx, dir)
    // index artifacts must carry no text (hashes and sketches only)
    Seq("fps", "bands", "sigs").foreach { a =>
      assert(!spark.read.parquet(graft.operators.IndexCompact
        .resolvePath(dir, s"$a.parquet"))
        .schema.fieldNames.contains("text"))
    }
    val shard2 = Seq((10L, base), (11L, idx.collect()(1).getString(1) + " tau"),
      (12L, "completely different content with no overlap at all here " +
        "nothing shared between these two corpora whatsoever today"))
      .toDF("doc_id", "text")
    val out = graft.queries.TextOps.dedupAgainstIndex(spark, shard2, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(10L).getAs[Long]("dup_exact_of") == 1L)
    assert(!out(10L).getAs[Boolean]("keep"))
    assert(out(11L).getAs[Long]("dup_near_of") == 2L)
    assert(out(11L).isNullAt(out(11L).fieldIndex("dup_exact_of")))
    assert(out(12L).getAs[Boolean]("keep"))
  }

  test("bm25: every doc scored, zero without query terms, exact column sum") {
    val rows = SparkEntry.queries("q_doc_bm25")(spark, sf).collect()
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.length == nDocs)
    val texts = Tables(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.foreach { r =>
      val s = Seq("s_spark", "s_join", "s_window").map(r.getAs[Double])
      assert(s.forall(_ >= 0.0))
      // fixed-order sum is the exact bm25 column
      assert(r.getAs[Double]("bm25") == s(0) + s(1) + s(2))
      val toks = texts(r.getAs[Long]("doc_id")).split(" ").toSet
      if (!toks.exists(Set("spark", "join", "window")))
        assert(r.getAs[Double]("bm25") == 0.0)
    }
    // the fixture must exercise nonzero scores
    assert(rows.exists(_.getAs[Double]("bm25") > 0.0))
  }

  test("simhash is stable across runs (deterministic)") {
    val a = SparkEntry.queries("q_doc_simhash")(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = SparkEntry.queries("q_doc_simhash")(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b && a.nonEmpty)
  }

  test("langid predicts only known languages") {
    val langs = SparkEntry.queries("q_doc_langid")(spark, sf)
      .select("lang_pred").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "fr", "de", "es")))
  }

  test("kmeans converges to planted cluster means") {
    import spark.implicits._
    // two tight planted clusters along opposite axes; seeds (vec_id 0, 1)
    // start one in each cluster, so 3 Lloyd rounds must land each
    // centroid on its cluster's mean.
    def jitter(base: Float, i: Int): Array[Float] =
      Array.tabulate(4)(d => if (d == 0) base + i * 0.01f else if (d == 1) 1f - base + i * 0.01f else 0.1f)
    val a = (0 until 10 by 2).map(i => (i.toLong, jitter(1f, i / 2)))     // even ids: x-axis
    val b = (1 until 10 by 2).map(i => (i.toLong, jitter(0f, i / 2)))     // odd ids: y-axis
    val e = (a ++ b).toDF("vec_id", "embedding")
    val cents = graft.queries.SimilarityOps.kmeansOf(e, k = 2, iters = 3).collect()
    assert(cents.length == 2)
    val byId = cents.map(r => r.getAs[Long]("centroid_id") ->
      r.getAs[scala.collection.Seq[Float]]("c_emb")).toMap
    // centroid 0 captured the x-heavy cluster, centroid 1 the y-heavy one
    assert(byId(0L)(0) > byId(0L)(1))
    assert(byId(1L)(1) > byId(1L)(0))
    // each centroid ~= its members' mean (quantized grid error < 1e-5)
    val meanA0 = a.map(_._2(0)).sum / a.length
    assert(math.abs(byId(0L)(0) - meanA0) < 1e-4)
  }

  test("kmeans step output covers k*d cells with members partitioning the corpus") {
    val rows = SparkEntry.queries("q_embed_kmeans_step")(spark, sf).collect()
    val n = Tables(spark, sf, "embeddings").count()
    val cells = rows.map(r => (r.getAs[Long]("centroid_id"), r.getAs[Int]("dim")))
    assert(cells.distinct.length == cells.length)
    // every dim of a surviving centroid is present
    val dims = rows.groupBy(_.getAs[Long]("centroid_id")).values.map(_.length).toSet
    assert(dims == Set(64))
    // summed members over any fixed dim = corpus size (assignment is a partition)
    val dim0 = rows.filter(_.getAs[Int]("dim") == 0).map(_.getAs[Long]("n_members")).sum
    assert(dim0 == n)
  }

  test("dup spans: planted verbatim overlap is detected, unique docs score zero") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"$shared one two three four five six"),
      (2L, s"zero $shared nine eight seven six five"),
      (3L, "p q r s t u v w x y z")).toDF("doc_id", "text")
    // run the same plan as the registered query, against planted docs
    val spans = docs.select(col("doc_id"),
        org.apache.spark.sql.GraftSql.column(graft.functions.ExplodeShingles(
          org.apache.spark.sql.GraftSql.expression(split(col("text"), " ")), 5)).as("span"))
    val hot = spans.groupBy("span").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).collect()
    assert(hot.length == 1) // exactly the planted 5-gram
    val res = SparkEntry.queries("q_doc_dup_spans")(spark, sf).collect()
    res.foreach { r =>
      val f = r.getAs[Double]("dup_fraction")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("n_dup_windows") <= r.getAs[Long]("n_windows"))
    }
  }

  test("pack: offsets stay under budget and packs fill sequentially per shard") {
    val rows = SparkEntry.queries("q_doc_pack")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("pack_offset") >= 0 && r.getAs[Long]("pack_offset") < 2048)
      assert(r.getAs[Long]("pack_id") >= 0)
    }
    // within a shard, pack_id is non-decreasing in doc_id order
    rows.groupBy(_.getAs[String]("source")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("doc_id"))
      val ids = sorted.map(_.getAs[Long]("pack_id"))
      assert(ids.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("retention matrix: offset-0 equals cohort size; D1/D7 tie out") {
    val m = SparkEntry.queries("q_events_retention_matrix")(spark, sf)
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("cohort"),
        r.getAs[Int]("day_offset")) -> r.getAs[Long]("n_users")).toMap
    assert(m.nonEmpty && m.keys.forall { case (_, o) => o >= 0 && o <= 7 })
    val flat = SparkEntry.queries("q_events_retention")(spark, sf).collect()
    flat.foreach { r =>
      val c = r.getAs[java.sql.Timestamp]("cohort")
      // every user is active on their own first day
      assert(m((c, 0)) == r.getAs[Long]("cohort_users"))
      assert(m.getOrElse((c, 1), 0L) == r.getAs[Long]("retained_d1"))
      assert(m.getOrElse((c, 7), 0L) == r.getAs[Long]("retained_d7"))
    }
  }

  test("round-6 plan shapes: single-exchange sample, bounded top-k") {
    // stratified sample: both windows (rank + count) share ONE exchange
    // on the source key — the shard-parallel discipline
    val p1 = SparkEntry.queries("q_doc_stratified_sample")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p1).length == 1, s"plan:\n$p1")
    // hard negatives ranks through TopKPerKey's bounded group limit
    // (r16: partial WindowGroupLimit below the exchange), never a bare
    // window over the k×-expanded scored relation
    val p2 = SparkEntry.queries("q_embed_hard_negatives")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(windowsAllBounded(p2), s"plan:\n$p2")
    // collocations ends in a global top-50: TakeOrdered, no Window
    val p3 = SparkEntry.queries("q_doc_collocations")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p3.contains("TakeOrderedAndProject") && !p3.contains("Window"),
      s"plan:\n$p3")
    // anomaly: hourly rollup + stats join — no window anywhere either
    val p4 = SparkEntry.queries("q_events_anomaly")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p4.contains("Window"), s"plan:\n$p4")
  }

  test("round-10 plan shapes: dup-span agg and window share one exchange") {
    // the explicit repartition(h) satisfies BOTH the (h, doc_id)
    // aggregate's ClusteredDistribution (subset rule) and the
    // partitionBy(h) window — the pair table shuffles ONCE. Detector:
    // that exchange + the per-doc rollup = 2; the unhinted shape hashes
    // the agg on (h, doc_id) and re-shuffles the pairs for the window.
    val p1 = SparkEntry.queries("q_doc_dup_spans")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("(?<!Broadcast)Exchange".r.findAllIn(p1).length == 2, s"plan:\n$p1")
    // strip: the shared exchange + the doc-keyed span collapse + the
    // final per-doc rebuild = 3 shuffles (its joins ride broadcasts,
    // which the lookbehind excludes)
    val p2 = SparkEntry.queries("q_doc_dup_span_strip")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("(?<!Broadcast)Exchange".r.findAllIn(p2).length == 3, s"plan:\n$p2")
    // repetition scoring is row-local (RepetitionStats) — a projection
    // over the scan, zero shuffles, zero joins
    val p3 = SparkEntry.queries("q_doc_repetition")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p3.contains("repetition_stats") && !p3.contains("Exchange") &&
      !p3.contains("Join"), s"plan:\n$p3")
  }

  test("langid confusion: cells partition the corpus; diagonal dominates") {
    val rows = SparkEntry.queries("q_doc_langid_confusion")(spark, sf).collect()
    val total = Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("n_docs")).sum == g.head.getAs[Long]("n_lang"))
      g.foreach { r =>
        assert(r.getAs[Long]("permille") ==
          r.getAs[Long]("n_docs") * 1000 / r.getAs[Long]("n_lang"))
      }
    }
    // the classifier must at least beat chance on its own label set:
    // some diagonal cell holds a majority of its labeled row
    assert(rows.exists(r => r.getAs[String]("lang") == r.getAs[String]("lang_pred")
      && r.getAs[Long]("permille") > 500))
  }

  test("quality-vs-dup: deciles cover every doc; keep counts bounded") {
    val rows = SparkEntry.queries("q_doc_quality_vs_dup")(spark, sf).collect()
    val total = Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_keep"))
      assert(k >= 0 && k <= n)
      assert(r.getAs[Long]("keep_permille") == k * 1000 / n)
      val d = r.getAs[Int]("decile")
      assert(d >= 1 && d <= 10)
    }
    // keep totals agree with the dedup-keep operator
    val keepTotal = SparkEntry.queries("q_doc_dedup_keep")(spark, sf)
      .filter(col("keep")).count()
    assert(rows.map(_.getAs[Long]("n_keep")).sum == keepTotal)
  }

  test("collocations: top-50 descending, pair count bounded by unigrams") {
    val rows = SparkEntry.queries("q_doc_collocations")(spark, sf).collect()
    assert(rows.length == 50)
    val scores = rows.map(_.getAs[Long]("pmi_grid"))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    rows.foreach { r =>
      val (c12, c1a, c1b) = (r.getAs[Long]("c12"),
        r.getAs[Long]("c1a"), r.getAs[Long]("c1b"))
      assert(c12 >= 1 && c12 <= math.min(c1a, c1b))
    }
  }

  test("events anomaly: integer flag agrees with z; full hourly coverage") {
    val rows = SparkEntry.queries("q_events_anomaly")(spark, sf).collect()
    val hourly = SparkEntry.queries("q_events_hourly")(spark, sf).count()
    assert(rows.length == hourly)
    rows.foreach { r =>
      val zIdx = r.fieldIndex("z")
      val flagged = r.getAs[Boolean]("flagged")
      if (r.isNullAt(zIdx)) assert(!flagged) // σ=0 series never flag
      else {
        val z = r.getDouble(zIdx)
        // the flag is decided in exact long arithmetic; z is its float
        // shadow — they may only disagree within float eps of |z|=2
        if (flagged) assert(math.abs(z) > 2.0 - 1e-9)
        else assert(math.abs(z) < 2.0 + 1e-9)
      }
    }
    assert(rows.exists(_.getAs[Boolean]("flagged"))) // not vacuous
  }

  test("dim recall: 64-dim row is exact by construction; hits bounded") {
    val rows = SparkEntry.queries("q_embed_dim_recall")(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getAs[Long]("n_hits") <= 30))
    val full = rows.find(_.getAs[Long]("d") == 64L).get
    assert(full.getAs[Long]("n_hits") == 30L &&
      full.getAs[Double]("recall_at_3") == 1.0)
  }

  test("prep funnel: monotone survivors, endpoints tie to the audit") {
    val rows = SparkEntry.queries("q_doc_prep_funnel")(spark, sf)
      .collect().sortBy(_.getAs[Int]("stage_idx"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("raw", "lang_id", "quality", "exact_dedup", "near_dedup"))
    val ns = rows.map(_.getAs[Long]("n_surviving"))
    assert(ns.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    val audit = SparkEntry.queries("q_doc_corpus_prep")(spark, sf).collect()
    assert(ns(0) == audit.length)
    assert(ns(4) == audit.count(_.getAs[Boolean]("keep")))
  }

  test("dsir: target-source docs outweigh the rest; weights exact-grid") {
    val rows = SparkEntry.queries("q_doc_dsir_weight")(spark, sf).collect()
    val nDocs = Tables(spark, sf, "documents")
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      // weight = sum_grid / n_bigrams exactly (one double division)
      assert(r.getAs[Double]("dsir_weight") ==
        r.getAs[Long]("sum_grid").toDouble / r.getAs[Long]("n_bigrams"))
    }
    val (tgt, rest) = rows.partition(_.getAs[String]("source") == "src0")
    // every target doc's own bigrams are in the target counts → > 0
    assert(tgt.nonEmpty && tgt.forall(_.getAs[Double]("dsir_weight") > 0))
    def mean(xs: Array[Double]) = xs.sum / xs.length
    assert(mean(tgt.map(_.getAs[Double]("dsir_weight"))) >
      mean(rest.map(_.getAs[Double]("dsir_weight"))))
  }

  test("stratified sample: exact 20% floor per source, repartition-stable") {
    val rows = SparkEntry.queries("q_doc_stratified_sample")(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    rows.groupBy(_.getAs[String]("source")).values.foreach { g =>
      val n = g.length
      assert(g.forall(_.getAs[Long]("n_source") == n))
      assert(g.count(_.getAs[Boolean]("keep")) == n / 5)
      // ranks are a permutation 1..n
      assert(g.map(_.getAs[Int]("sample_rank")).sorted.sameElements(1 to n))
    }
    // determinism: a different physical layout yields the same sample
    val docs = Tables(spark, sf, "documents").repartition(7, col("doc_id"))
    val bySrc = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val again = docs.select(col("doc_id"), col("source"))
      .withColumn("sample_rank", row_number().over(
        bySrc.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .withColumn("n_source", count(lit(1)).over(bySrc))
      .withColumn("keep", col("sample_rank") * 5 <= col("n_source"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep"))
      .toMap
    rows.foreach(r => assert(
      again(r.getAs[Long]("doc_id")) == r.getAs[Boolean]("keep")))
  }

  test("hard negatives: 3 per query, all cross-label, ranked by cosine") {
    val rows = SparkEntry.queries("q_embed_hard_negatives")(spark, sf).collect()
    val labels = Tables(spark, sf, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 3))
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("c_id")) != labels(r.getAs[Long]("q_id")))
    }
    byQ.values.foreach { g =>
      val cs = g.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cosine"))
      assert(cs.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }
  test("two-level assignment: agreement tracks super density; divergences never beat the argmax") {
    // The coarse quantizer's approximation, pinned with numbers at the
    // regime it exists for: k in the hundreds-plus (the k∝corpus
    // recipe), where ~√k supers sample the space densely. At the
    // fixture's oracle scale (k=16, 4 supers) routing is legitimately
    // coarse — the oracle pins those exact semantics — so the quality
    // bound is asserted at k=128/12 supers over the same corpus.
    // Invariant at ANY scale: a two-level pick can never exceed the
    // flat argmax's cosine (flat IS the argmax).
    import graft.functions.{Centroid2LevelIndex, NearestCentroidF32, NearestCentroid2LevelF32}
    // the corpus plus 20 planted CLONES (near-identical pairs — the
    // duplicate mass dedup exists for; this testdata slice has none of
    // its own, measured max pair cosine 0.51)
    val base = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding")
    val e = base.unionByName(
      base.filter(col("vec_id").between(200, 219))
        .select((col("vec_id") + lit(2000000L)).as("vec_id"),
          col("embedding")))
    // Label agreement is the WRONG quality metric here: the corpus has
    // ~10 natural clusters under 12 supers, so a cluster holding two
    // supers splits its members between near-tied routes — the labels
    // differ, the geometry doesn't. What cell-blocking actually needs
    // is tiny cosine REGRET: the routed cell's centroid is as close to
    // the vector as the argmax's, so co-located near-dups still
    // co-assign. Pinned: median regret ~0, p99 small. And the
    // statement the DEDUP use rests on: NEAR-IDENTICAL vectors (the
    // duplicate mass — cosine ≥ 0.9, the planted clones) take the same
    // route deterministically, so the router swap keeps every such
    // pair. LOOSE pairs (0.25 ≤ cos < 0.9) are route-sensitive at tiny
    // cells — the cell-boundary blocking trade the operator scaladocs
    // state, maximally magnified at 500 vectors over 128 cells; report
    // it, pin the dup mass. The r11 seed numbers (median 0.014,
    // p99 0.22, loose tail ~25%) were flagged "pessimistic because
    // fixture seeds stand in for trained centroids" — r12 measures
    // BOTH: the same harness runs on kmeansOf-TRAINED centroids and
    // the trained router must not be worse on any pinned metric.
    def measure(label: String, centsDf: org.apache.spark.sql.DataFrame,
        trainSupers: Boolean): (Double, Double, Int, Int) = {
      val flatIdx = graft.queries.SimilarityOps.collectCentroidsOf(centsDf)
      val twoIdx =
        if (trainSupers) Centroid2LevelIndex.buildTrained(flatIdx, nSupers = 12)
        else Centroid2LevelIndex.build(flatIdx, nSupers = 12)
      val both = e.select(col("vec_id"),
        NearestCentroidF32(col("embedding"), flatIdx).as("f"),
        NearestCentroid2LevelF32(col("embedding"), twoIdx).as("t"))
        .select(col("vec_id"),
          col("f.centroid_id").as("cf"), col("f.cosine").as("sf"),
          col("t.centroid_id").as("ct"), col("t.cosine").as("st"))
        .collect()
      val n = both.length
      val agree = both.count(r => r.getAs[Long]("cf") == r.getAs[Long]("ct"))
      val regrets = both.map(r =>
        r.getAs[Double]("sf") - r.getAs[Double]("st")).sorted
      both.foreach(r => // never beats the argmax (flat IS the argmax)
        assert(r.getAs[Double]("st") <= r.getAs[Double]("sf") + 1e-12))
      def pairs(supers: Int) = graft.queries.SimilarityOps
        .neardupCellsOf(e, nCents = 128, assignSupers = supers,
          centsOverride = Some(centsDf), trainSupers = trainSupers)
        .select("id_a", "id_b", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val flatPairs = pairs(0)
      val twoPairs = pairs(12)
      val tight = flatPairs.filter(_._2 >= 0.9).keySet
      val tightKept = tight.count(twoPairs.contains)
      val loose = flatPairs.size - tight.size
      val looseKept = (flatPairs.keySet & twoPairs.keySet).size - tightKept
      println(f"[2level/$label] k=${flatIdx.ids.length}/12-super agreement " +
        f"$agree/$n, regret median=${regrets(n / 2)}%.4f " +
        f"p99=${regrets(n * 99 / 100)}%.4f max=${regrets.last}%.4f; " +
        s"dup-mass retention $tightKept/${tight.size}, " +
        s"loose-tail retention $looseKept/$loose " +
        s"(2-level found ${twoPairs.size} total)")
      assert(tight.size >= 20, s"$label: planted clones missing") // the clones
      assert(tightKept == tight.size,
        s"$label: 2-level routing lost ${tight.size - tightKept} " +
          "NEAR-IDENTICAL pairs — co-routing of duplicates is broken")
      (regrets(n / 2), regrets(n * 99 / 100), looseKept, loose)
    }
    // seed centroids (the fixture/oracle stand-in convention); bounds
    // sit just above the r11-measured values (median 0.014, p99 0.22)
    // to catch a router regression, not to flatter the stand-ins
    val cents = e.filter(col("vec_id") < 128)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    val (medS, p99S, looseKeptS, looseS) =
      measure("seed", cents, trainSupers = false)
    assert(medS <= 0.05, f"median regret $medS%.4f — router broken")
    assert(p99S <= 0.30, f"p99 regret $p99S%.4f — boundary misses too costly")
    // TRAINED centroids (kmeansOf, the spec-pinned multi-round Lloyd
    // trainer). Measured honestly in r12: trained centroids under the
    // UNTRAINED first-12 super anchors made regret WORSE (median 0.20
    // vs 0.014) — k-means pulls every centroid into the data's dense
    // regions, so 12 arbitrary anchors no longer sample the space.
    // The production pairing trains BOTH levels (buildTrained's
    // driver-side Lloyd over the centroid set); that configuration
    // must hold the dup-mass guarantee (inside measure) and the regret
    // bounds. The trained/untrained line is kept as the recorded
    // negative so the pairing rule stays measured, not asserted.
    val trained = graft.queries.SimilarityOps.kmeansOf(e, k = 128, iters = 3)
    val (medTU, p99TU, _, _) =
      measure("trained-cents/anchor-supers", trained, trainSupers = false)
    val (medT, p99T, looseKeptT, looseT) =
      measure("trained-cents/trained-supers", trained, trainSupers = true)
    // measured r12 (this corpus): agreement 353/520 vs seed 230/520,
    // median regret 0.0000 vs 0.0138, loose-tail retention 212/433
    // (49%) vs 108/430 (25%) — the trained pairing improves every
    // routing-quality metric the dedup use rests on. The p99 regret
    // MAGNITUDE is larger (0.557 vs 0.218): trained cells are tight,
    // so the rare boundary miss costs more cosine — that tail is rare
    // (p99) and loose-only (dup mass 20/20); bounds sit just above the
    // measured values per configuration.
    assert(medT <= 0.02, f"trained median regret $medT%.4f — regression")
    assert(p99T <= 0.60, f"trained p99 regret $p99T%.4f — regression")
    assert(medT <= medTU && p99T <= p99TU,
      "training the super level should never hurt a trained centroid set")
    assert(looseKeptT.toDouble / math.max(1, looseT) >=
      looseKeptS.toDouble / math.max(1, looseS),
      "trained routing should retain at least the seed loose tail")
    println(f"[2level] trained/trained vs seed: median $medT%.4f vs " +
      f"$medS%.4f, p99 $p99T%.4f vs $p99S%.4f, loose tail " +
      f"${100.0 * looseKeptT / math.max(1, looseT)}%.0f%% vs " +
      f"${100.0 * looseKeptS / math.max(1, looseS)}%.0f%% kept")
  }
}
