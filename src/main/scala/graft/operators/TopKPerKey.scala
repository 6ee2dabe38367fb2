package graft.operators

import org.apache.spark.sql.{Dataset, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per key as a typed Aggregator — the scale-correct
  * alternative to `row_number().over(window) <= k`:
  *
  * the window form shuffles EVERY row to its key's partition and sorts;
  * this aggregator keeps a k-bounded ordered buffer per key on the map
  * side (partial aggregation), so only k rows per key per input
  * partition cross the shuffle. At 100 TB with k=3 that is the
  * difference between shuffling the table and shuffling ~nothing.
  * Results are identical to the window form (same tie-break:
  * value desc, key asc) — oracle-checked against it.
  */
object TopKPerKey {

  /** (score, tiebreak-id) entry */
  case class Entry(score: Double, id: Long)

  /** `asc = false` ranks score DESC (similarity search), `asc = true`
    * ranks score ASC (distance search); the id tie-break is ASC in both. */
  class TopKAgg(k: Int, asc: Boolean = false)
      extends Aggregator[(Long, Double, Long), List[Entry], List[Entry]] {
    override def zero: List[Entry] = Nil

    private def insert(b: List[Entry], e: Entry): List[Entry] = {
      // k is tiny: insertion into a sorted list beats heap overhead.
      // Double.compare, not < / ==: primitive comparisons IGNORE NaN
      // (every NaN comparison is false), which would leave the buffer
      // unsorted and make results depend on arrival order the moment a
      // zero-norm embedding yields a 0/0 cosine. Double.compare is
      // Spark's NaN-greatest total order (AnnIndex pins the same rule),
      // so the window form and this aggregator agree on NaN rows too.
      def cmp(a: Double, c: Double) = java.lang.Double.compare(a, c)
      val (better, worse) = b.span(x =>
        (if (asc) cmp(x.score, e.score) < 0 else cmp(x.score, e.score) > 0) ||
          (cmp(x.score, e.score) == 0 && x.id < e.id))
      val merged = better ::: e :: worse
      if (merged.length > k) merged.take(k) else merged
    }

    override def reduce(b: List[Entry], row: (Long, Double, Long)): List[Entry] =
      insert(b, Entry(row._2, row._3))
    override def merge(x: List[Entry], y: List[Entry]): List[Entry] =
      y.foldLeft(x)(insert)
    override def finish(r: List[Entry]): List[Entry] = r
    override def bufferEncoder: Encoder[List[Entry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[List[Entry]] = ExpressionEncoder()
  }

  /** top-k rows of `df` per `keyCol`, ordered by `scoreCol` (desc by
    * default, asc with `asc = true`) with `idCol` asc tie-break; output
    * (key, rank, id, score). Long scores survive the double round-trip
    * exactly below 2^53 — cast the score column back at the call site.
    * Rows where any of the three columns is null (or casts to null)
    * are DROPPED — the primitive tuple encoder would otherwise abort
    * the job on the first null, and a null score can never belong to a
    * top-k anyway (desc-order windows rank nulls last). */
  def topK(spark: SparkSession, df: DataFrame, keyCol: String,
      scoreCol: String, idCol: String, k: Int, asc: Boolean = false): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, Double, Long)] = df.select(
      col(keyCol).cast("long"), col(scoreCol).cast("double"),
      col(idCol).cast("long"))
      .where(col(keyCol).isNotNull && col(scoreCol).isNotNull &&
        col(idCol).isNotNull)
      .as[(Long, Double, Long)]
    ds.groupByKey(_._1)
      .agg(new TopKAgg(k, asc).toColumn.name("top"))
      .flatMap { case (key, top) =>
        top.zipWithIndex.map { case (e, i) => (key, i + 1, e.id, e.score) }
      }
      .toDF(keyCol, "rk", idCol, scoreCol)
  }

  /** (score, string-payload, two long payloads) entry — the term-ranked
    * sibling of Entry for top-k where the ranked item is a string and
    * carries its own aggregates (tf, df) through the buffer, so no
    * join-back is needed to recover them. */
  case class StrEntry(score: Double, id: String, p1: Long, p2: Long)

  /** score DESC, string-id ASC tie-break — the id comparison runs in
    * UTF8 BINARY order (UTF8String.compareTo), matching Spark's column
    * ordering and the DuckDB oracle's default collation; Java
    * String.compareTo would diverge on non-ASCII (UTF-16 code units). */
  class TopKStrAgg(k: Int)
      extends Aggregator[(Long, Double, String, Long, Long),
        List[StrEntry], List[StrEntry]] {
    override def zero: List[StrEntry] = Nil

    private def idLt(a: String, b: String): Boolean =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

    private def insert(b: List[StrEntry], e: StrEntry): List[StrEntry] = {
      def cmp(a: Double, c: Double) = java.lang.Double.compare(a, c)
      val (better, worse) = b.span(x =>
        cmp(x.score, e.score) > 0 ||
          (cmp(x.score, e.score) == 0 && idLt(x.id, e.id)))
      val merged = better ::: e :: worse
      if (merged.length > k) merged.take(k) else merged
    }

    override def reduce(b: List[StrEntry],
        row: (Long, Double, String, Long, Long)): List[StrEntry] =
      insert(b, StrEntry(row._2, row._3, row._4, row._5))
    override def merge(x: List[StrEntry], y: List[StrEntry]): List[StrEntry] =
      y.foldLeft(x)(insert)
    override def finish(r: List[StrEntry]): List[StrEntry] = r
    override def bufferEncoder: Encoder[List[StrEntry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[List[StrEntry]] = ExpressionEncoder()
  }

  /** top-k (string-id) rows per key with two long payload columns
    * carried through the k-bounded buffer; output (key, rk, id, p1, p2)
    * — the ranking score is NOT emitted (rk already encodes the order;
    * a caller that needs the raw score must extend the output tuple).
    * Same contract as topK: map-side partial aggregation means
    * only k rows per key per input partition cross the shuffle, where
    * the window form re-shuffles and sorts the whole scored relation. */
  def topKStr(spark: SparkSession, df: DataFrame, keyCol: String,
      scoreCol: String, idCol: String, p1Col: String, p2Col: String,
      k: Int): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(keyCol).cast("long"), col(scoreCol).cast("double"),
      col(idCol).cast("string"), col(p1Col).cast("long"), col(p2Col).cast("long"))
      .where(col(keyCol).isNotNull && col(scoreCol).isNotNull &&
        col(idCol).isNotNull && col(p1Col).isNotNull && col(p2Col).isNotNull)
      .as[(Long, Double, String, Long, Long)]
    ds.groupByKey(_._1)
      .agg(new TopKStrAgg(k).toColumn.name("top"))
      .flatMap { case (key, top) =>
        top.zipWithIndex.map { case (e, i) => (key, i + 1, e.id, e.p1, e.p2) }
      }
      .toDF(keyCol, "rk", idCol, p1Col, p2Col)
  }
}
