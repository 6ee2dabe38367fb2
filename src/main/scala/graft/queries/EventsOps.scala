package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators over the `events` table (event_id, ts, user_id,
  * event_type, value, props-json). Batch forms of the streaming shapes:
  * tumbling-window aggregation, sessionization, funnel, latest-per-key
  * dedup, JSON extraction.
  *
  * Determinism: `ts` values are exactly microsecond-aligned (verified), so
  * Spark's parquet ns→us read is lossless vs DuckDB's TIMESTAMP_NS; the
  * oracle casts to TIMESTAMP to normalize. `value` doubles are exact at
  * 4 decimals → summed as DECIMAL.
  */
object EventsOps {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // Tumbling-window aggregation (batch form of a streaming windowed agg).
    "q_events_hourly" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("value").cast("decimal(18,4)")).cast("decimal(38,4)")
               .cast("double").as("total_value"))
    },

    // Hourly anomaly detection — the ops-table companion of
    // q_events_hourly: flag hours whose event count deviates more than
    // 2σ from that event type's mean. The z-score numerator/denominator
    // stay EXACT integers as long as possible (dev_n = cnt·n − Σx,
    // var_n2 = n·Σx² − (Σx)² — the textbook shift that avoids a mean
    // subtraction in floating point), the flag compares dev_n² > 4·var_n2
    // entirely in long arithmetic (no float at the decision boundary),
    // and z itself is ONE double division over ONE IEEE sqrt — both
    // correctly-rounded, hence bit-identical across engines (the cosine
    // discipline). Constant series (σ = 0) yield null z on both sides.
    // Plan: the hourly rollup is one shuffle; the per-type stats table is
    // |event types| rows, joined back unhinted (AQE broadcasts it).
    "q_events_anomaly" -> { (s, dir) =>
      val hourly = Tables(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val stats = hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum("n_events").as("sx"),
          sum(col("n_events") * col("n_events")).as("sxx"))
      hourly.join(stats, "event_type")
        .withColumn("dev_n",
          col("n_events") * col("n_hours") - col("sx"))
        .withColumn("var_n2",
          col("n_hours") * col("sxx") - col("sx") * col("sx"))
        .withColumn("z", when(col("var_n2") === 0, lit(null).cast("double"))
          .otherwise(col("dev_n").cast("double") /
            sqrt(col("var_n2").cast("double"))))
        .withColumn("flagged",
          col("dev_n") * col("dev_n") > lit(4L) * col("var_n2"))
        .select("event_type", "hour", "n_events", "z", "flagged")
    },

    // Sessionization: 30-min inactivity gap splits sessions. Single shuffle
    // on user_id; lag + running sum within sorted partitions. At 100 TB this
    // is the mapGroupsWithState shape — here the batch window-function form.
    "q_events_sessionize" -> { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(byUser)))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
               unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
        .withColumn("session_seq", sum(col("is_new")).over(run))
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
             min(col("ts")).as("session_start"),
             max(col("ts")).as("session_end"))
    },

    // Conversion funnel: users with view < click < purchase (min-event-time
    // ordering). One aggregate pass, no self-joins.
    "q_events_funnel" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
        .filter(col("t_view") < col("t_click") && col("t_click") < col("t_purchase"))
    },

    // Semi-structured extraction: JSON props → typed column → aggregate.
    "q_events_json_props" -> { (s, dir) =>
      Tables(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
                col("user_id"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_events"),
             countDistinct(col("user_id")).as("n_users"))
    },

    // Latest-event-per-key dedup (the compaction/upsert shape). One
    // lexicographic max(struct(ts, event_id, …)) IS "latest ts, highest
    // event_id on a tie" — a partial-aggregable groupBy that reduces to
    // one row per user per partition map-side, where the row_number
    // window re-shuffled and sorted EVERY event to keep one (the Q2
    // arg-min discipline; at 100 TB latest-per-key over the full event
    // stream is exactly the shape that must combine before the wire).
    // event_type rides as the struct's last field — consulted only on a
    // full (ts, event_id) tie, which event_id uniqueness rules out.
    "q_events_latest_per_user" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("w"))
        .select(col("user_id"), col("w.event_id").as("event_id"),
          col("w.ts").as("ts"), col("w.event_type").as("event_type"))
    },

    // Per-user behavior matrix (conditional aggregation fan-out).
    "q_events_user_matrix" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(
          sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_view"),
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
          sum(when(col("event_type") === "signup", 1).otherwise(0)).as("n_signup"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
          sum(col("value").cast("decimal(18,4)")).cast("decimal(38,4)")
            .cast("double").as("total_value"))
    },

    // Cohort retention: users grouped by first-seen day, with D1/D7
    // return counts — the engagement rollup next to sessionization in
    // any events pipeline. The cohort day rides a min-over-user window
    // on the distinct user-day rows (r10 — the r9 shape joined the
    // per-user aggregate back against its own input: one extra shuffle
    // and a join the window makes redundant), then one rollup shuffle.
    // Integer counts only — no float boundary anywhere. Dates emit as
    // midnight timestamps (comparator convention).
    "q_events_retention" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
        .withColumn("cohort", min(col("d")).over(Window.partitionBy("user_id")))
      e.groupBy("cohort")
        .agg(
          countDistinct(col("user_id")).as("cohort_users"),
          countDistinct(when(col("d") === date_add(col("cohort"), 1),
            col("user_id"))).as("retained_d1"),
          countDistinct(when(col("d") === date_add(col("cohort"), 7),
            col("user_id"))).as("retained_d7"))
        .select(col("cohort").cast("timestamp").as("cohort"),
          col("cohort_users"), col("retained_d1"), col("retained_d7"))
    },

    // Full retention MATRIX — the (cohort day × day offset) triangle
    // behind every retention curve, generalizing q_events_retention's
    // two fixed offsets to 0..7. Same r10 window shape as retention:
    // cohort from one min-over-user window on the distinct user-day
    // rows (no self-join), then one groupBy to ≤|days|·8 rows.
    // count_distinct expands to the two-level aggregate Catalyst plans
    // itself; day arithmetic is exact integer datediff (no timezone
    // float anywhere).
    "q_events_retention_matrix" -> { (s, dir) =>
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
        .withColumn("cohort", min(col("d")).over(Window.partitionBy("user_id")))
        .withColumn("day_offset", datediff(col("d"), col("cohort")))
        .filter(col("day_offset") <= 7)
        .groupBy("cohort", "day_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(col("cohort").cast("timestamp").as("cohort"),
          col("day_offset"), col("n_users"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        | count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4))::VARCHAR::DOUBLE AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_events_anomaly" ->
      """WITH hourly AS (
        | SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
        |  event_type, count(*) AS n_events
        | FROM events GROUP BY 1, 2),
        |stats AS (
        | SELECT event_type, count(*) AS n_hours,
        |  CAST(sum(n_events) AS BIGINT) AS sx,
        |  CAST(sum(n_events * n_events) AS BIGINT) AS sxx
        | FROM hourly GROUP BY event_type)
        |SELECT h.event_type, h.hour, h.n_events,
        | CASE WHEN s.n_hours * s.sxx - s.sx * s.sx = 0 THEN NULL
        |      ELSE CAST(h.n_events * s.n_hours - s.sx AS DOUBLE)
        |           / sqrt(CAST(s.n_hours * s.sxx - s.sx * s.sx AS DOUBLE))
        | END AS z,
        | (h.n_events * s.n_hours - s.sx) * (h.n_events * s.n_hours - s.sx)
        |   > 4 * (s.n_hours * s.sxx - s.sx * s.sx) AS flagged
        |FROM hourly h JOIN stats s USING (event_type)""".stripMargin,
    "q_events_sessionize" ->
      """WITH flagged AS (
        | SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        | SELECT user_id, ts,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        | FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        | count(*) AS n_events,
        | min(ts) AS session_start, max(ts) AS session_end
        |FROM sessions GROUP BY user_id, session_seq""".stripMargin,
    "q_events_funnel" ->
      """SELECT * FROM (
        | SELECT user_id,
        |  CAST(min(CASE WHEN event_type = 'view' THEN ts END) AS TIMESTAMP) AS t_view,
        |  CAST(min(CASE WHEN event_type = 'click' THEN ts END) AS TIMESTAMP) AS t_click,
        |  CAST(min(CASE WHEN event_type = 'purchase' THEN ts END) AS TIMESTAMP) AS t_purchase
        | FROM events GROUP BY user_id)
        |WHERE t_view < t_click AND t_click < t_purchase""".stripMargin,
    "q_events_json_props" ->
      """SELECT CAST(props->>'k' AS BIGINT) AS k, count(*) AS n_events,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin,
    "q_events_latest_per_user" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM (
        | SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,
    "q_events_user_matrix" ->
      """SELECT user_id,
        | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        | CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4))::VARCHAR::DOUBLE AS total_value
        |FROM events GROUP BY user_id""".stripMargin,
    "q_events_retention" ->
      """WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY user_id)
        |SELECT CAST(cohort AS TIMESTAMP) AS cohort,
        | count(DISTINCT e.user_id) AS cohort_users,
        | count(DISTINCT CASE WHEN e.d = f.cohort + 1 THEN e.user_id END) AS retained_d1,
        | count(DISTINCT CASE WHEN e.d = f.cohort + 7 THEN e.user_id END) AS retained_d7
        |FROM f JOIN e ON f.user_id = e.user_id
        |GROUP BY cohort""".stripMargin,
    "q_events_retention_matrix" ->
      """WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY user_id)
        |SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
        | CAST(e.d - f.cohort AS INT) AS day_offset,
        | count(DISTINCT e.user_id) AS n_users
        |FROM f JOIN e ON f.user_id = e.user_id
        |WHERE e.d - f.cohort <= 7
        |GROUP BY 1, 2""".stripMargin
  )
}
