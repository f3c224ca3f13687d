package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Fill, Sessionize}
import Q._

/** Window functions and sessionization — SURVEY §2.5/§2.6 — hash-checked
  * against DuckDB. All windows partition by `user_id` and order by
  * `(ts, event_id)` so results are deterministic under parallel execution.
  */
object WindowQueries {
  private val GAP_US = 86400L * 1000000L // 1-day session gap

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1: lag-diff (inter-event time)
    "w1_lag_diff" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      sortAll(e.withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .filter(col("prev_ts").isNotNull)
        .select(col("event_id"), col("user_id"),
          round((unix_micros(col("ts")) - unix_micros(col("prev_ts"))).cast("double")
            / 1000000.0, 6).as("dt_sec")))
    }),

    // W2: state-change filter (keep rows whose state differs from previous)
    "w2_state_change" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      sortAll(e.withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .select("event_id", "user_id", "event_type"))
    }),

    // W3: forward-fill across nulls (errors carry no value → carry last known)
    "w3_ffill" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("v", when(col("event_type") =!= "error", cents(col("value"))))
      sortAll(Fill.ffill(e, Seq("v"), "ts", Seq("user_id"), tieBreak = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("v").as("v_filled")))
    }),

    // W4: centered moving sum/average with "same"-mode edge semantics
    "w4_moving_avg" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-5, 4)
      sortAll(e.select(col("event_id"), col("user_id"),
        round(sum(cents(col("value"))).over(w).cast("double") / 10.0 / 100.0, 6)
          .as("smoothed")))
    }),

    // W6: null-run detection (count + length of runs of missing values)
    "w6_null_runs" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("v", when(col("event_type") =!= "error", col("value")))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runs = e.withColumn("run_id", sum(when(col("v").isNotNull, 1L).otherwise(0L)).over(w))
        .filter(col("v").isNull)
        .groupBy("user_id", "run_id").agg(count(lit(1)).as("run_len"))
      sortAll(runs.groupBy("user_id")
        .agg(count(lit(1)).as("n_runs"), max("run_len").as("max_run")))
    }),

    // W8: row-number within group (pivot 2 entities into columns)
    "w8_row_number" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
      sortAll(e.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .groupBy("user_id", "event_type")
        .agg(min(when(col("rn") === 1, col("event_id"))).as("first_id"),
          min(when(col("rn") === 2, col("event_id"))).as("second_id")))
    }),

    // G1+G2: gap sessionization + per-session stats
    "g1_sessionize" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val sessed = Sessionize.sessionize(e, "ts", Seq("user_id"), GAP_US,
        tieBreak = Seq("event_id"))
      sortAll(sessed.groupBy("user_id", "session_id").agg(
        count(lit(1)).as("n_events"),
        min("ts").as("start_ts"), max("ts").as("end_ts"),
        sum(cents(col("value"))).as("sum_cents")))
    }),

    // G2: min-size session filter
    "g2_session_min_size" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val sessed = Sessionize.sessionize(e, "ts", Seq("user_id"), GAP_US,
        tieBreak = Seq("event_id"))
      val kept = Sessionize.filterMinSize(sessed, Seq("user_id"), "session_id", 3L)
      sortAll(kept.groupBy("user_id", "session_id").agg(count(lit(1)).as("n_events")))
    }),

    // G3: two-phase regroup — candidate rows + bridge rows, stricter gap,
    // keep only sessions containing ≥1 candidate
    "g3_regroup_bridged" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val tagged = e.withColumn("is_candidate", col("event_type") === "purchase")
        .filter(col("event_type").isin("purchase", "view"))
      val kept = Sessionize.regroupWithBridges(tagged, "ts", Seq("user_id"),
        600L * 1000000L, "is_candidate", tieBreak = Seq("event_id"))
      sortAll(kept.groupBy("user_id", "session_id").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("is_candidate"), 1L).otherwise(0L)).as("n_candidates")))
    }),

    // G5: event minimum-duration filter
    "g5_duration_filter" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val sessed = Sessionize.sessionize(e, "ts", Seq("user_id"), GAP_US,
        tieBreak = Seq("event_id"))
      sortAll(sessed.groupBy("user_id", "session_id")
        .agg(min("ts").as("start_ts"), max("ts").as("end_ts"), count(lit(1)).as("n"))
        .withColumn("duration_raw",
          (unix_micros(col("end_ts")) - unix_micros(col("start_ts"))).cast("double")
            / 1000000.0)
        .filter(col("duration_raw") > 600.0)
        .select(col("user_id"), col("session_id"),
          round(col("duration_raw"), 6).as("duration_sec"), col("n")))
    })
  )

  private val sessSql =
    """sess AS (
      |  SELECT *, CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 86400000000 THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
      |  FROM (
      |    SELECT *, epoch_us(ts) AS us,
      |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |    FROM events))""".stripMargin

  val oracle: Map[String, String] = Map(
    "w1_lag_diff" ->
      s"""SELECT event_id, user_id,
         |  round((epoch_us(ts) - epoch_us(prev_ts)) / 1000000.0, 6) AS dt_sec
         |FROM (SELECT event_id, user_id, ts,
         |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |      FROM events)
         |WHERE prev_ts IS NOT NULL
         |${orderBySql("event_id", "user_id", "dt_sec")}""".stripMargin,

    "w2_state_change" ->
      s"""SELECT event_id, user_id, event_type
         |FROM (SELECT event_id, user_id, event_type,
         |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
         |      FROM events)
         |WHERE prev_type IS NULL OR prev_type <> event_type
         |${orderBySql("event_id", "user_id", "event_type")}""".stripMargin,

    "w3_ffill" ->
      s"""SELECT event_id, user_id,
         |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
         |FROM (SELECT event_id, user_id, ts,
         |        CASE WHEN event_type <> 'error' THEN CAST(round(value*100) AS BIGINT) END AS v
         |      FROM events)
         |${orderBySql("event_id", "user_id", "v_filled")}""".stripMargin,

    "w4_moving_avg" ->
      s"""SELECT event_id, user_id,
         |  round(CAST(sum(CAST(round(value*100) AS BIGINT)) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN 5 PRECEDING AND 4 FOLLOWING) AS DOUBLE) / 10.0 / 100.0, 6) AS smoothed
         |FROM events
         |${orderBySql("event_id", "user_id", "smoothed")}""".stripMargin,

    "w6_null_runs" ->
      s"""WITH runs AS (
         |  SELECT user_id, run_id, count(*) AS run_len FROM (
         |    SELECT user_id, v,
         |      sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run_id
         |    FROM (SELECT user_id, ts, event_id,
         |            CASE WHEN event_type <> 'error' THEN value END AS v FROM events))
         |  WHERE v IS NULL GROUP BY user_id, run_id)
         |SELECT user_id, count(*) AS n_runs, max(run_len) AS max_run
         |FROM runs GROUP BY user_id
         |${orderBySql("user_id", "n_runs", "max_run")}""".stripMargin,

    "w8_row_number" ->
      s"""SELECT user_id, event_type,
         |  min(CASE WHEN rn = 1 THEN event_id END) AS first_id,
         |  min(CASE WHEN rn = 2 THEN event_id END) AS second_id
         |FROM (SELECT user_id, event_type, event_id,
         |        row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
         |      FROM events)
         |WHERE rn <= 2 GROUP BY user_id, event_type
         |${orderBySql("user_id", "event_type", "first_id", "second_id")}""".stripMargin,

    "g1_sessionize" ->
      s"""WITH $sessSql
         |SELECT user_id, session_id, count(*) AS n_events,
         |  min(ts) AS start_ts, max(ts) AS end_ts,
         |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
         |FROM sess GROUP BY user_id, session_id
         |${orderBySql("user_id", "session_id", "n_events", "start_ts", "end_ts", "sum_cents")}""".stripMargin,

    "g2_session_min_size" ->
      s"""WITH $sessSql
         |SELECT user_id, session_id, count(*) AS n_events
         |FROM sess GROUP BY user_id, session_id HAVING count(*) >= 3
         |${orderBySql("user_id", "session_id", "n_events")}""".stripMargin,

    "g3_regroup_bridged" ->
      s"""WITH base AS (
         |  SELECT *, event_type = 'purchase' AS is_candidate FROM events
         |  WHERE event_type IN ('purchase', 'view')),
         |sess AS (
         |  SELECT *, CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 600000000 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
         |  FROM (SELECT *, epoch_us(ts) AS us,
         |          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |        FROM base))
         |SELECT user_id, session_id, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN is_candidate THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates
         |FROM sess GROUP BY user_id, session_id
         |HAVING max(CASE WHEN is_candidate THEN 1 ELSE 0 END) = 1
         |${orderBySql("user_id", "session_id", "n_rows", "n_candidates")}""".stripMargin,

    "g5_duration_filter" ->
      s"""WITH $sessSql,
         |agg AS (
         |  SELECT user_id, session_id, min(ts) AS start_ts, max(ts) AS end_ts, count(*) AS n
         |  FROM sess GROUP BY user_id, session_id)
         |SELECT user_id, session_id,
         |  round((epoch_us(end_ts) - epoch_us(start_ts)) / 1000000.0, 6) AS duration_sec, n
         |FROM agg WHERE (epoch_us(end_ts) - epoch_us(start_ts)) / 1000000.0 > 600.0
         |${orderBySql("user_id", "session_id", "duration_sec", "n")}""".stripMargin
  )
}
