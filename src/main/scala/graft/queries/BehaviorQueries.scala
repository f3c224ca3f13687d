package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sessionize
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
    })
  )

  val oracle: Map[String, String] = Map(
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
