package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

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
  * The swap is the freeze-sink discipline (tmp dir + rename): readers
  * never observe a half-written artifact, and a crash mid-compact
  * leaves the original in place. */
object IndexCompact {

  private def sidecarPath(dir: String, artifact: String) =
    s"$dir/${artifact.stripSuffix(".parquet")}_schema.json"

  /** read an index artifact with its recorded schema restored (column
    * order AND types), regardless of physical layout */
  def read(spark: SparkSession, dir: String, artifact: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$artifact")
    val sc = Paths.get(sidecarPath(dir, artifact))
    if (Files.exists(sc)) {
      val schema = DataType.fromJson(Files.readString(sc)).asInstanceOf[StructType]
      df.select(schema.fields.toSeq
        .map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    } else df
  }

  /** rewrite one artifact: read through the pinned schema, repartition
    * on the cell key, write directory-partitioned, swap atomically */
  private def rewrite(spark: SparkSession, dir: String, artifact: String,
      partitionCols: Seq[String], sortCols: Seq[String]): Unit = {
    val cur = read(spark, dir, artifact)
    val schemaJson = cur.schema.json
    val target = Paths.get(s"$dir/$artifact")
    val tmp = Paths.get(s"$dir/$artifact.compact_tmp")
    val shaped =
      if (partitionCols.nonEmpty)
        cur.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else cur.repartition(cur.sparkSession.sessionState.conf.numShufflePartitions)
    val w = shaped.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    // swap: old -> .old, tmp -> live, drop .old (rename-visible, never half-written)
    val old = Paths.get(s"$dir/$artifact.compact_old")
    deleteRecursively(old)
    Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
    Files.writeString(Paths.get(sidecarPath(dir, artifact)), schemaJson)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }

  /** number of parquet data files under an artifact (spec observability) */
  def dataFileCount(dir: String, artifact: String): Long = {
    val root = Paths.get(s"$dir/$artifact")
    if (!Files.exists(root)) 0L
    else Files.walk(root).filter(p => p.toString.endsWith(".parquet") ||
      p.toString.endsWith(".snappy.parquet")).count()
  }

  /** Compact whatever index lives at `dir`: an IVF-PQ index (has
    * `codes.parquet`) gets centroid_id-partitioned codes; a text dedup
    * index (has `bands.parquet`) gets band_idx-partitioned bands and
    * coalesced fps/sigs. Returns the artifacts rewritten. */
  def compact(spark: SparkSession, dir: String): Seq[String] = {
    val done = scala.collection.mutable.ArrayBuffer.empty[String]
    if (Files.exists(Paths.get(s"$dir/codes.parquet"))) {
      // one directory per IVF cell; rows within a file sorted by
      // (vec_id, sub) so ADC scans run sequentially. At larger nlist
      // the repartition key keeps one shuffle partition per cell —
      // file count tracks nlist, not ingest history.
      rewrite(spark, dir, "codes.parquet",
        Seq("centroid_id"), Seq("vec_id", "sub"))
      done += "codes.parquet"
    }
    if (Files.exists(Paths.get(s"$dir/bands.parquet"))) {
      rewrite(spark, dir, "bands.parquet",
        Seq("band_idx"), Seq("band_hash", "doc_id"))
      done += "bands.parquet"
      for (flat <- Seq("fps.parquet", "sigs.parquet")
          if Files.exists(Paths.get(s"$dir/$flat"))) {
        rewrite(spark, dir, flat, Seq.empty, Seq.empty)
        done += flat
      }
    }
    require(done.nonEmpty, s"no index artifacts found under $dir")
    done.toSeq
  }
}
