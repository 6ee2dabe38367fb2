package graft.chain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timestamp syntax + timestamp→block resolution
  * (cryo cli/parse/timestamps.rs:229-311).
  *
  * Grammar: unix seconds (`1700000000`), or `now`-relative durations with
  * units s/m/h/d/w/M/y (`-1d:` = last day of blocks). Resolution maps a
  * timestamp to the greatest block with `block.timestamp <= t`
  * (≤-semantics, timestamps.rs:274-311) via binary search over the blocks
  * source — driver-side, memoized, O(log n) point lookups.
  */
/** `lookup(n)` is a FLOOR probe: the greatest EXISTING block ≤ n with
  * its timestamp. Probing by floor (not exact match) keeps the binary
  * search correct over a blocks source with coverage gaps — a lake with
  * ranges 0..999 and 2000..2999 frozen must resolve a timestamp inside
  * the 2000s to a 2000s block, not silently converge into the low
  * chunk because the exact probe at a missing block "looked late". */
class TimestampResolver(lookup: Long => Option[(Long, Long)],
    minBlock: Long, maxBlock: Long) {
  private val memo =
    scala.collection.mutable.HashMap.empty[Long, Option[(Long, Long)]]

  private def floorOf(block: Long): Option[(Long, Long)] =
    memo.getOrElseUpdate(block, lookup(block))

  /** greatest existing block with timestamp <= t; None if t precedes
    * the chain (gap-safe: a probe landing in a hole steps to the
    * nearest real block below it, or searches upward if none) */
  def blockAtOrBefore(t: Long): Option[Long] = {
    var lo = minBlock
    var hi = maxBlock
    var best: Option[Long] = None
    while (lo <= hi) {
      val mid = lo + (hi - lo) / 2
      floorOf(mid) match {
        case None => lo = mid + 1 // no block at or below mid
        case Some((b, ts)) =>
          if (ts <= t) { best = Some(b); lo = mid + 1 }
          else hi = b - 1 // skip the gap straight to below the floor
      }
    }
    best
  }
}

object TimestampSyntax {
  private val unitSeconds = Map(
    's' -> 1L, 'm' -> 60L, 'h' -> 3600L, 'd' -> 86400L,
    'w' -> 604800L, 'M' -> 2592000L, 'y' -> 31536000L)

  /** parse a timestamp token: unix seconds or now-relative `-<n><unit>` */
  def parseTimestamp(s: String, now: Long): Long = {
    val t = s.trim
    if (t.startsWith("-")) now - parseDuration(t.drop(1))
    else if (t.equalsIgnoreCase("now")) now
    else t.toLong
  }

  /** `<n><unit>` duration in seconds (timestamps.rs:229-272 units) */
  def parseDuration(s: String): Long = {
    val t = s.trim
    unitSeconds.get(t.last) match {
      case Some(mult) => t.dropRight(1).toDouble.longValue * mult
      case None => t.toLong // bare seconds
    }
  }

  /** resolver backed by a blocks DataFrame (fixture or bronze); the
    * floor probe is one ≤-filtered top-1 scan per UNIQUE probe
    * (memoized), with the predicate pushed to parquet row-group stats */
  def resolverFor(blocks: DataFrame): TimestampResolver = {
    val bounds = blocks.agg(min("block_number"), max("block_number")).collect()(0)
    val (lo, hi) = (bounds.getInt(0).toLong, bounds.getInt(1).toLong)
    val lookup = (n: Long) =>
      blocks.filter(col("block_number") <= n)
        .orderBy(col("block_number").desc).limit(1)
        .select(col("block_number").cast("long"), col("timestamp").cast("long"))
        .collect()
        .headOption.map(r => (r.getLong(0), r.getLong(1)))
    new TimestampResolver(lookup, lo, hi)
  }

  /** resolver over a FROZEN LAKE's own blocks dataset: the floor probe
    * bisects chunk-file NAMES first (driver-side string work — the
    * Lake.select discipline) and reads ONLY the one file that holds the
    * floor block. A DataFrame-backed probe scans the whole blocks
    * dataset per probe; over a 22k-file lake that is dozens of
    * full-lake list/plan/scan jobs per resolution, where this shape
    * pays one single-file scan per unique probe. Gap-safe like the
    * DataFrame path: a probe landing between files floors to the
    * nearest file below it. */
  def resolverForLake(spark: SparkSession, dir: String,
      network: Option[String] = None): TimestampResolver = {
    val files = Lake.select(dir, "blocks", network = network)
      .sortBy(_.start)
    require(files.nonEmpty, s"no blocks chunk files under $dir")
    val lo = files.head.start
    val hi = files.map(_.endInclusive).max
    val lookup = (n: Long) =>
      // greatest file starting at or below n holds the floor block (a
      // frozen chunk contains every block its name claims)
      files.takeWhile(_.start <= n).lastOption.flatMap { f =>
        // dispatch on the chunk's own format: a csv/json blocks lake
        // used with --timestamps previously hit spark.read.parquet and
        // died with a raw 'not a Parquet file' error. csv/json chunks
        // hexify binary columns but keep block_number/timestamp integral,
        // so inference is sound for the two columns the probe reads.
        val df = f.format match {
          case "parquet" => spark.read.parquet(f.path)
          case "csv" => spark.read.option("header", "true")
            .option("inferSchema", "true").csv(f.path)
          case "json" => spark.read.json(f.path)
          case other => throw new IllegalArgumentException(
            s"timestamp resolution cannot read '$other' chunk ${f.path}")
        }
        df.filter(col("block_number") <= n)
          .orderBy(col("block_number").desc).limit(1)
          .select(col("block_number").cast("long"),
            col("timestamp").cast("long"))
          .collect()
          .headOption.map(r => (r.getLong(0), r.getLong(1)))
      }
    new TimestampResolver(lookup, lo, hi)
  }

  /** `tsA:tsB` → block Range via ≤-resolution at both ends. Either end
    * may be EMPTY for an open bound — `-1d:` is "the last day of
    * blocks" (end = now), `:1700000000` is "chain start through t"
    * (split with limit -1: Java's split drops trailing empty tokens
    * otherwise, rejecting the documented open-end grammar). */
  def resolveRange(spec: String, blocks: DataFrame, now: Long): BlockSyntax.Range =
    resolveRange(spec, resolverFor(blocks), now)

  /** resolveRange against a pre-built resolver (lake or DataFrame) */
  def resolveRange(spec: String, r: TimestampResolver,
      now: Long): BlockSyntax.Range = {
    val parts = spec.split(":", -1)
    require(parts.length == 2, s"timestamp range needs a:b, got $spec")
    val a =
      if (parts(0).trim.isEmpty) None else Some(parseTimestamp(parts(0), now))
    val b = parseTimestamp(
      if (parts(1).trim.isEmpty) "now" else parts(1), now)
    val start = a.flatMap(r.blockAtOrBefore).getOrElse(0L)
    val end = r.blockAtOrBefore(b).getOrElse(
      throw new IllegalArgumentException(s"end timestamp $b precedes chain"))
    BlockSyntax.Range(start, end + 1)
  }
}
