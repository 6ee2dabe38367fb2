package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded top-k per key — the scale-correct shuffle contract with a
  * fully native execution path (r16, guide §4):
  *
  * `row_number().over(window) <= k` plans with **WindowGroupLimit**
  * (Spark ≥3.5): a PARTIAL group-limit on the map side keeps ≤k rows
  * per key per input partition BEFORE the exchange, so only k rows per
  * key per partition cross the shuffle — never the whole scored
  * relation. At 100 TB with k=3 that is the difference between
  * shuffling the table and shuffling ~nothing. Earlier rounds got the
  * same bound from a typed Aggregator with a k-bounded buffer; the
  * window form keeps the bound while staying on UnsafeRows end to end
  * (no object boundary, no per-row encoder work) — measured faster at
  * every gated scale, and it spills through the standard sort path
  * instead of holding per-key heap buffers.
  *
  * Ordering semantics (spec-pinned in OperatorsSpec): score desc (or
  * asc), id-asc tie-break, Spark's NaN-greatest total order, UTF8
  * binary string comparison; null key/score/id/payload rows DROP
  * rather than rank (a bare window would rank null scores last).
  */
object TopKPerKey {

  /** The bounded-shuffle contract above depends on Catalyst's
    * InferWindowGroupLimit rule, which only inserts the partial group
    * limit when k is BELOW spark.sql.optimizer.windowGroupLimitThreshold
    * (default 1000) — a larger k silently reverts to shuffling the whole
    * scored relation (ADVICE r16). Make the config-sensitivity explicit:
    * every call site passes k ≪ 1000, so a violation is a programming
    * error, not a tuning choice. */
  private def requireBounded(spark: SparkSession, k: Int): Unit = {
    val threshold = spark.conf
      .get("spark.sql.optimizer.windowGroupLimitThreshold", "1000").toInt
    require(k < threshold,
      s"topK k=$k >= windowGroupLimitThreshold=$threshold: the partial " +
        "WindowGroupLimit would not fire and the whole scored relation " +
        "would shuffle — raise the threshold or lower k")
  }

  /** top-k rows of `df` per `keyCol`, ordered by `scoreCol` (desc by
    * default, asc with `asc = true`) with `idCol` asc tie-break; output
    * (key, rank, id, score). Long scores survive the double round-trip
    * exactly below 2^53 — cast the score column back at the call site.
    * Rows where any of the three columns is null (or casts to null)
    * are DROPPED — a null score can never belong to a top-k (a bare
    * desc-order window would rank nulls last instead). */
  def topK(spark: SparkSession, df: DataFrame, keyCol: String,
      scoreCol: String, idCol: String, k: Int, asc: Boolean = false): DataFrame = {
    // r16 (guide §4): row_number window + rank filter instead of the
    // typed Aggregator. Spark ≥3.5 plans this with WindowGroupLimit:
    // a PARTIAL group-limit on the map side keeps ≤k rows per key per
    // input partition BEFORE the exchange — the same bounded-shuffle
    // contract the Aggregator gave — but the whole pipeline stays on
    // UnsafeRows (no AppendColumns/DeserializeToObject object
    // boundary, no per-row encoder work, no List buffer
    // serialization). Ordering semantics are unchanged: Spark's sort
    // is the NaN-greatest total order Double.compare gave the
    // Aggregator, and the id tie-break is the same asc. Null
    // key/score/id rows still drop (the window form would otherwise
    // rank nulls last instead of dropping them).
    val base = df.select(
      col(keyCol).cast("long").as(keyCol),
      col(scoreCol).cast("double").as(scoreCol),
      col(idCol).cast("long").as(idCol))
      .where(col(keyCol).isNotNull && col(scoreCol).isNotNull &&
        col(idCol).isNotNull)
    requireBounded(spark, k)
    val ord = if (asc) col(scoreCol).asc else col(scoreCol).desc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(ord, col(idCol).asc)
    base.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(keyCol), col("rk"), col(idCol), col(scoreCol))
  }

  /** top-k (string-id) rows per key with two long payload columns
    * carried through the k-bounded group limit; output (key, rk, id, p1, p2)
    * — the ranking score is NOT emitted (rk already encodes the order;
    * a caller that needs the raw score must extend the output tuple).
    * Same contract as topK: the map-side partial WindowGroupLimit means
    * only k rows per key per input partition cross the shuffle. */
  def topKStr(spark: SparkSession, df: DataFrame, keyCol: String,
      scoreCol: String, idCol: String, p1Col: String, p2Col: String,
      k: Int): DataFrame = {
    // r16: window + WindowGroupLimit form, same rationale as topK.
    // The string tie-break is Spark's native UTF8 binary column order —
    // exactly the UTF8String.compareTo the Aggregator pinned. The
    // ranking score is still not emitted (rk encodes the order).
    val base = df.select(
      col(keyCol).cast("long").as(keyCol),
      col(scoreCol).cast("double").as(scoreCol),
      col(idCol).cast("string").as(idCol),
      col(p1Col).cast("long").as(p1Col),
      col(p2Col).cast("long").as(p2Col))
      .where(col(keyCol).isNotNull && col(scoreCol).isNotNull &&
        col(idCol).isNotNull && col(p1Col).isNotNull && col(p2Col).isNotNull)
    requireBounded(spark, k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(scoreCol).desc, col(idCol).asc)
    base.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(keyCol), col("rk"), col(idCol), col(p1Col), col(p2Col))
  }
}
