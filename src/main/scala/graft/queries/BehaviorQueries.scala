package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Intervals, Sessionize}
import Q._

/** Behavior-detector *prefilter* stages as an oracle-checked query: the
  * SQL-expressible front half of `detectFights` (feature derivation →
  * candidate conjunction → gap sessionization → min-size filter), exercised
  * over the events table since the synthetic star schema has no pose
  * streams. The sequential back half (W5 kernel) is covered by the golden
  * ScalaTest suite in `graft.behavior`.
  */
object BehaviorQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b1_fight_prefilter" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val x = col("value"); val y = (col("user_id") % 100).cast("double") / 10.0
      val stepped = e
        .withColumn("px", lag(x, 1).over(w))
        .withColumn("py", lag(y, 1).over(w))
        .filter(col("px").isNotNull)
      val dx = x - col("px"); val dy = y - col("py")
      val dist = sqrt(dx * dx + dy * dy)
      val orient = pmod(degrees(atan2(dy, dx)), lit(360.0))
      // candidate conjunction: proximity + orientation band + intensity
      val cand = stepped.filter(
        dist < 30.0 && abs(orient - 180.0) <= 90.0 && x > 50.0)
        .select("event_id", "user_id", "ts")
      val sessed = Sessionize.sessionize(cand, "ts", Seq("user_id"),
        86400L * 1000000L, tieBreak = Seq("event_id"))
      val kept = Sessionize.filterMinSize(sessed, Seq("user_id"), "session_id", 3L)
      sortAll(kept.groupBy("user_id", "session_id").agg(
        count(lit(1)).as("n_frames"),
        min("ts").as("start_ts"), max("ts").as("end_ts")))
    }),

    // Experiment-interval construction (reference get_experiment_times):
    // alternating env states → sentinel-padded, state-change-filtered,
    // zipped (start, stop) pairs. Env stream derived from one user's events.
    "iv1_experiment_intervals" -> ((s, dir) => {
      val env = t(s, dir, "events").filter(col("user_id") % 20 === 7)
        .select(col("ts"),
          when(col("event_type").isin("error", "purchase"), "Maintenance")
            .otherwise("Experiment").as("state"))
      sortAll(Intervals.experimentIntervals(env, "ts", "state",
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-20 00:00:00")))
    }),

    // Maintenance exclusion (reference exclude_maintenance_data): broadcast
    // interval semi-join over the full event stream, then aggregate.
    "iv2_maintenance_exclusion" -> ((s, dir) => {
      val env = t(s, dir, "events").filter(col("user_id") % 20 === 7)
        .select(col("ts"),
          when(col("event_type").isin("error", "purchase"), "Maintenance")
            .otherwise("Experiment").as("state"))
      val iv = Intervals.experimentIntervals(env, "ts", "state",
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
      val kept = Intervals.excludeOutside(t(s, dir, "events"), "ts", iv)
      sortAll(kept.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents")))
    })
  )

  /** Shared interval-construction CTE chain (get_experiment_times in SQL). */
  private val intervalsCte =
    s"""raw AS (
       |  SELECT ts AS t,
       |    CASE WHEN event_type IN ('error','purchase') THEN 'Maintenance'
       |         ELSE 'Experiment' END AS s, 0 AS pad
       |  FROM events
       |  WHERE user_id % 20 = 7
       |    AND ts >= TIMESTAMP '2024-01-05 00:00:00'
       |    AND ts <= TIMESTAMP '2024-01-20 00:00:00'),
       |padded AS (
       |  SELECT t, s, pad FROM raw
       |  UNION ALL SELECT TIMESTAMP '2024-01-20 00:00:00', 'Maintenance', 1),
       |dedup AS (
       |  SELECT t, s FROM (
       |    SELECT t, s, row_number() OVER (PARTITION BY t ORDER BY pad, s) AS rn
       |    FROM padded) WHERE rn = 1),
       |sliced AS (
       |  SELECT t, s FROM dedup
       |  WHERE t <= (SELECT max(t) FROM dedup WHERE s = 'Maintenance')),
       |chg AS (
       |  SELECT t, s FROM (
       |    SELECT t, s, lag(s) OVER (ORDER BY t) AS ps FROM sliced)
       |  WHERE ps IS NULL OR s <> ps),
       |fin AS (
       |  SELECT t, s FROM chg
       |  UNION ALL
       |  SELECT TIMESTAMP '2024-01-05 00:00:00', 'Experiment'
       |  WHERE (SELECT s FROM chg ORDER BY t LIMIT 1) = 'Maintenance'),
       |ivs AS (
       |  SELECT starts.t AS start, stops.t AS stop
       |  FROM (SELECT t, row_number() OVER (ORDER BY t) AS rn FROM fin
       |        WHERE s = 'Experiment') starts
       |  JOIN (SELECT t, row_number() OVER (ORDER BY t) AS rn FROM fin
       |        WHERE s = 'Maintenance') stops USING (rn))""".stripMargin

  val oracle: Map[String, String] = Map(
    "iv1_experiment_intervals" ->
      s"""WITH $intervalsCte
         |SELECT start, stop FROM ivs
         |${orderBySql("start", "stop")}""".stripMargin,

    "iv2_maintenance_exclusion" ->
      s"""WITH $intervalsCte
         |SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         |FROM events e
         |WHERE EXISTS (SELECT 1 FROM ivs i WHERE e.ts >= i.start AND e.ts <= i.stop)
         |GROUP BY event_type
         |${orderBySql("event_type", "n", "sum_cents")}""".stripMargin,

    "b1_fight_prefilter" ->
      s"""WITH stepped AS (
         |  SELECT event_id, user_id, ts, value AS x,
         |    CAST(user_id % 100 AS DOUBLE)/10.0 AS y,
         |    lag(value) OVER w AS px,
         |    lag(CAST(user_id % 100 AS DOUBLE)/10.0) OVER w AS py
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |cand AS (
         |  SELECT event_id, user_id, ts FROM stepped
         |  WHERE px IS NOT NULL
         |    AND sqrt((x-px)*(x-px) + (y-py)*(y-py)) < 30.0
         |    AND abs(((degrees(atan2(y-py, x-px)) % 360.0) + 360.0) % 360.0 - 180.0) <= 90.0
         |    AND x > 50.0),
         |sess AS (
         |  SELECT *, CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 86400000000 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
         |  FROM (
         |    SELECT *, epoch_us(ts) AS us,
         |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |    FROM cand))
         |SELECT user_id, session_id, count(*) AS n_frames,
         |  min(ts) AS start_ts, max(ts) AS end_ts
         |FROM sess GROUP BY user_id, session_id HAVING count(*) >= 3
         |${orderBySql("user_id", "session_id", "n_frames", "start_ts", "end_ts")}""".stripMargin
  )
}
