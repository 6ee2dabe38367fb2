package graft.operators

import graft.chain.LakeFs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Maintenance for persisted index artifacts (IVF-PQ vector index,
  * text dedup index). The streaming ingest twins (encodeStream,
  * indexDedupStream) append one small parquet file per micro-batch
  * forever — correct, but after days of ingest a search pays thousands
  * of file opens and the probe join loses its pruning leverage.
  * `compact` rewrites the accumulating artifact into key-partitioned
  * files — `codes` by `centroid_id` (the probe join then prunes whole
  * directories of unprobed cells at PLANNING time), `bands` by
  * `band_idx` — and coalesces the small flat artifacts (fps, sigs)
  * into shuffle-partition-count files. Search results are
  * hash-identical before/after (spec-pinned): compaction moves bytes,
  * never rows.
  *
  * Directory-partitioned parquet re-infers partition-column types on
  * read (a 0-15 long key comes back int) and appends partition columns
  * last, so each compaction writes a schema sidecar
  * (`<artifact>_schema.json`) and `read` restores the recorded column
  * order and types — loaders see ONE schema whether the artifact is
  * flat (fresh build), fragmented (post-ingest) or compacted. Repeated
  * compaction is idempotent for the same reason: the rewrite reads
  * through the same pinned schema.
  *
  * Compact-during-ongoing-ingest: a directory-partitioned artifact
  * must never receive flat per-micro-batch appends at its root —
  * Spark's partition discovery rejects the mixed layout ("Conflicting
  * directory structures"). Streaming sinks therefore target the FLAT
  * side-artifact `streamArtifact(artifact)` (e.g.
  * `codes_stream.parquet`), which `read` unions with the main layout
  * through the pinned schema. `compact` rewrites only the main
  * artifact, so an active ingest stream is never disturbed; once the
  * stream is STOPPED, `compact(foldStream = true)` folds the side
  * rows into the partitioned layout and removes the side-artifact
  * (folding under an active writer would strand the sink's
  * `_spark_metadata` log, so the fold path requires ingest stopped —
  * enforced as a documented contract, spec-pinned for the stopped
  * case).
  *
  * The swap is the freeze-sink discipline (tmp dir + rename): readers
  * never observe a half-written artifact. Crash windows: the schema
  * sidecar is written BEFORE the swap (its content is
  * layout-independent — same columns either way — so an aborted
  * compact leaving a fresh sidecar next to the old layout is
  * harmless), and the old layout is parked at `.compact_old` until the
  * new one is live; `recover` (run at the top of both `read` and
  * `compact`) moves `.compact_old` back if a crash between the two
  * directory renames left no live artifact, and drops it if the swap
  * completed. Every crash point therefore leaves a readable artifact
  * with a pinned schema.
  *
  * Filesystem contract: all file operations go through the Hadoop
  * FileSystem of the index dir (LakeFs), so artifacts live on local
  * disk or HDFS interchangeably. The swap protocol REQUIRES atomic
  * directory rename — true on local/HDFS, NOT on object stores (s3a
  * renames a tree per-object); the recovery matrix's existence probes
  * would mis-read a half-copied tree there, so object-store index
  * dirs are out of contract (PLANS.md swap-site audit). */
object IndexCompact {

  private def sidecarPath(dir: String, artifact: String) =
    s"$dir/${artifact.stripSuffix(".parquet")}_schema.json"

  /** flat side-artifact streaming sinks append to (never the main
    * artifact root, which may be directory-partitioned post-compact) */
  def streamArtifact(artifact: String): String =
    s"${artifact.stripSuffix(".parquet")}_stream.parquet"

  /** absolute sink path for a streaming ingest targeting `artifact` */
  def streamPath(dir: String, artifact: String): String =
    s"$dir/${streamArtifact(artifact)}"

  /** fold-in-progress marker: present iff a foldStream rewrite has
    * folded the side-artifact's rows into the pending layout but the
    * side-artifact may still be on disk (see recover) */
  private def foldMarkerPath(dir: String, artifact: String) =
    s"$dir/$artifact.fold_pending"

  /** per-(dir, artifact) in-process lock: read()'s recovery and
    * rewrite()'s swap are mutually exclusive, so a concurrent search
    * can never mistake an IN-FLIGHT compact's tmp dir or fold marker
    * for crash leftovers and destroy them (previously a read during a
    * fold could delete the marker a post-swap crash needed, silently
    * double-counting folded stream rows forever, or delete the tmp a
    * running compact was about to move). Cross-PROCESS concurrent
    * compaction remains out of contract (class doc). */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]
  private def lockFor(dir: String, artifact: String): Object =
    locks.computeIfAbsent(s"$dir/$artifact", _ => new Object)

  /** Restore a crash-interrupted swap: a crash between the two
    * ATOMIC_MOVEs leaves only `.compact_old` → move it back; a crash
    * just after the second move leaves both → the new layout is live,
    * drop the stale `.compact_old`. The fold marker disambiguates the
    * side-artifact: it is written after the tmp layout (which contains
    * the folded side rows) is complete, so marker + tmp still present
    * means the swap never happened (side rows live ONLY in the
    * side-artifact → keep it), while marker + no tmp means the folded
    * layout went live (the side rows are now IN the main artifact →
    * finish the crash-interrupted side delete, or read() would union
    * them in twice). Idempotent, cheap (few stats).
    *
    * `destructive = false` (the read path) performs only the RESTORE
    * actions — moving `.compact_old` back and finishing a completed
    * fold's side delete. Dropping a stale tmp dir, a pre-swap fold
    * marker, or a stale `.compact_old` is left to the compact path:
    * those states are also exactly what an in-flight rewrite looks
    * like, and only compact (serialized by the lock) can know the
    * difference. */
  private def recover(spark: SparkSession, dir: String, artifact: String,
      destructive: Boolean = false): Unit = lockFor(dir, artifact).synchronized {
    val target = s"$dir/$artifact"
    val tmp = s"$dir/$artifact.compact_tmp"
    val marker = foldMarkerPath(dir, artifact)
    if (LakeFs.exists(marker)) {
      if (!LakeFs.exists(tmp)) {
        // fold swap completed, crash before the side delete — finish it
        LakeFs.deleteTree(streamPath(dir, artifact))
        LakeFs.deleteFile(marker)
      } else if (destructive) LakeFs.deleteFile(marker) // pre-swap crash leftover
    }
    val old = s"$dir/$artifact.compact_old"
    if (LakeFs.exists(old)) {
      if (!LakeFs.exists(target)) {
        LakeFs.rename(old, target)
        spark.catalog.refreshByPath(target)
      } else if (destructive) LakeFs.deleteTree(old)
    }
    // a tmp dir with a live target is an aborted (or in-flight) rewrite
    // — only the compact path may drop it
    if (destructive && LakeFs.exists(tmp) && LakeFs.exists(target))
      LakeFs.deleteTree(tmp)
  }

  /** the main artifact read through its pinned sidecar schema (column
    * order AND types), regardless of physical layout — shared by read()
    * and the non-fold rewrite so compact and queries can never disagree
    * on the pinned schema */
  private def readMain(spark: SparkSession, dir: String, artifact: String): DataFrame = {
    val main = spark.read.parquet(s"$dir/$artifact")
    val sc = sidecarPath(dir, artifact)
    if (LakeFs.exists(sc)) {
      val schema = DataType.fromJson(LakeFs.readString(sc)).asInstanceOf[StructType]
      main.select(schema.fields.toSeq
        .map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    } else main
  }

  /** read an index artifact with its recorded schema restored (column
    * order AND types) regardless of physical layout, unioned with any
    * streaming side-artifact rows not yet folded in */
  def read(spark: SparkSession, dir: String, artifact: String): DataFrame = {
    recover(spark, dir, artifact)
    val pinned = readMain(spark, dir, artifact)
    val side = streamPath(dir, artifact)
    if (LakeFs.exists(side)) {
      val stream = spark.read.parquet(side)
      pinned.unionByName(stream.select(pinned.schema.fields.toSeq
        .map(f => col(f.name).cast(f.dataType).as(f.name)): _*))
    } else pinned
  }

  /** rewrite one artifact: read through the pinned schema (optionally
    * folding the streaming side-artifact), repartition on the cell
    * key, write directory-partitioned, swap atomically */
  private def rewrite(spark: SparkSession, dir: String, artifact: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      foldStream: Boolean): Unit = {
    recover(spark, dir, artifact, destructive = true)
    val sidePath = streamPath(dir, artifact)
    // non-fold: main artifact only — an active ingest keeps appending
    // to the side-artifact undisturbed; read() unions it at query time
    val cur =
      if (foldStream) read(spark, dir, artifact)
      else readMain(spark, dir, artifact)
    val schemaJson = cur.schema.json
    val target = s"$dir/$artifact"
    val tmp = s"$dir/$artifact.compact_tmp"
    val shaped =
      if (partitionCols.nonEmpty)
        cur.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else cur.repartition(cur.sparkSession.sessionState.conf.numShufflePartitions)
    val w = shaped.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp)
    // sidecar first (layout-independent content: same columns before
    // and after the swap), then — when folding — the fold marker (the
    // tmp layout now holds the side rows; recover() uses marker+tmp
    // state to finish or undo the side delete after any crash), then
    // swap old -> .old, tmp -> live, drop .old — every crash point
    // leaves a recoverable, schema-pinned, not-double-counted artifact
    // (see recover)
    // the swap runs under the artifact lock so a concurrent read()'s
    // recovery can neither restore the parked .compact_old mid-swap
    // nor observe the marker/tmp in a half-written state
    lockFor(dir, artifact).synchronized {
      LakeFs.writeString(sidecarPath(dir, artifact), schemaJson)
      val folding = foldStream && LakeFs.exists(sidePath)
      if (folding) LakeFs.writeString(foldMarkerPath(dir, artifact), "")
      val old = s"$dir/$artifact.compact_old"
      LakeFs.deleteTree(old)
      LakeFs.rename(target, old)
      LakeFs.rename(tmp, target)
      LakeFs.deleteTree(old)
      if (folding) {
        LakeFs.deleteTree(sidePath)
        LakeFs.deleteFile(foldMarkerPath(dir, artifact))
      }
      // the swap happened outside Spark's writers: drop any cached file
      // listings for the artifact path or later scans chase renamed
      // files
      spark.catalog.refreshByPath(target)
    }
  }

  /** number of parquet data files under an artifact (spec observability) */
  def dataFileCount(dir: String, artifact: String): Long = {
    val root = s"$dir/$artifact"
    if (!LakeFs.exists(root)) 0L
    else {
      val fs = LakeFs.fs(root)
      def walk(p: org.apache.hadoop.fs.Path): Long =
        fs.listStatus(p).map { st =>
          if (st.isDirectory) walk(st.getPath)
          else if (st.getPath.getName.endsWith(".parquet")) 1L else 0L
        }.sum
      walk(new org.apache.hadoop.fs.Path(root))
    }
  }

  /** Compact whatever index lives at `dir`: an IVF-PQ index (has
    * `codes.parquet`) gets centroid_id-partitioned codes; a text dedup
    * index (has `bands.parquet`) gets band_idx-partitioned bands and
    * coalesced fps/sigs. `foldStream = true` additionally merges the
    * flat streaming side-artifacts into the rewrite and removes them —
    * legal only with ingest STOPPED (see class doc). Returns the
    * artifacts rewritten. */
  def compact(spark: SparkSession, dir: String,
      foldStream: Boolean = false): Seq[String] = {
    // restore any crash-parked artifact BEFORE the existence probes —
    // a crash between the swap moves leaves only `.compact_old`, which
    // must count as the artifact being present
    for (a <- Seq("codes.parquet", "bands.parquet", "fps.parquet", "sigs.parquet"))
      recover(spark, dir, a, destructive = true)
    val done = scala.collection.mutable.ArrayBuffer.empty[String]
    if (LakeFs.exists(s"$dir/codes.parquet")) {
      // one directory per IVF cell; rows within a file sorted by
      // (vec_id, sub) so ADC scans run sequentially. At larger nlist
      // the repartition key keeps one shuffle partition per cell —
      // file count tracks nlist, not ingest history.
      rewrite(spark, dir, "codes.parquet",
        Seq("centroid_id"), Seq("vec_id", "sub"), foldStream)
      done += "codes.parquet"
    }
    if (LakeFs.exists(s"$dir/bands.parquet")) {
      rewrite(spark, dir, "bands.parquet",
        Seq("band_idx"), Seq("band_hash", "doc_id"), foldStream)
      done += "bands.parquet"
      for (flat <- Seq("fps.parquet", "sigs.parquet")
          if LakeFs.exists(s"$dir/$flat")) {
        rewrite(spark, dir, flat, Seq.empty, Seq.empty, foldStream)
        done += flat
      }
    }
    require(done.nonEmpty, s"no index artifacts found under $dir")
    done.toSeq
  }
}
