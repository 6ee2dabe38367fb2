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
class TimestampResolver(lookup: Long => Option[Long], minBlock: Long, maxBlock: Long) {
  private val memo = scala.collection.mutable.HashMap.empty[Long, Option[Long]]

  private def tsOf(block: Long): Option[Long] =
    memo.getOrElseUpdate(block, lookup(block))

  /** greatest block with timestamp <= t; None if t precedes the chain */
  def blockAtOrBefore(t: Long): Option[Long] = {
    if (tsOf(minBlock).exists(_ > t)) return None
    var lo = minBlock
    var hi = maxBlock
    while (lo < hi) { // invariant: ts(lo) <= t
      val mid = lo + (hi - lo + 1) / 2
      tsOf(mid) match {
        case Some(ts) if ts <= t => lo = mid
        case _ => hi = mid - 1
      }
    }
    Some(lo)
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

  /** resolver backed by a blocks DataFrame (fixture or bronze) */
  def resolverFor(blocks: DataFrame): TimestampResolver = {
    val bounds = blocks.agg(min("block_number"), max("block_number")).collect()(0)
    val (lo, hi) = (bounds.getInt(0).toLong, bounds.getInt(1).toLong)
    val lookup = (n: Long) =>
      blocks.filter(col("block_number") === n)
        .select(col("timestamp").cast("long")).collect()
        .headOption.map(_.getLong(0))
    new TimestampResolver(lookup, lo, hi)
  }

  /** `tsA:tsB` → block Range via ≤-resolution at both ends */
  def resolveRange(spec: String, blocks: DataFrame, now: Long): BlockSyntax.Range = {
    val r = resolverFor(blocks)
    val parts = spec.split(':')
    require(parts.length == 2, s"timestamp range needs a:b, got $spec")
    val a = parseTimestamp(parts(0), now)
    val b = parseTimestamp(parts(1), now)
    val start = r.blockAtOrBefore(a).getOrElse(0L)
    val end = r.blockAtOrBefore(b).getOrElse(
      throw new IllegalArgumentException(s"end timestamp $b precedes chain"))
    BlockSyntax.Range(start, end + 1)
  }
}
