package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Assignment, BandJoin}
import Q._

/** Optimal-assignment queries — SURVEY §2.3 J3/J4 and the §3.2 combine
  * pipeline shape (reference `combine_pose_id_chunk.py:83-141,201-331`).
  *
  * The oracle checks the *optimal total cost* and matched cardinality per
  * group (brute-forced in SQL over ≤3×3 bipartite graphs): total min cost is
  * unique even when multiple optimal matchings tie, so the check is exact
  * and deterministic. Pair-level identity under ties is covered by the
  * ScalaTest kernel tests instead.
  */
object AssignQueries {

  /** Top-3 rows of `typ` per user, with integer-cents payload. */
  private def ranked(e: DataFrame, typ: String, keyOut: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    e.filter(col("event_type") === typ)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("user_id"), col("event_id").as(keyOut),
        cents(col("value")).as(keyOut + "_cents"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J3: per-group optimal bipartite assignment (≤3 purchases × ≤3 views
    // per user). Cost = SIGNED cents difference — deliberately mixed-sign:
    // the round-5 infeasibility-pad bug (a padded lower-cardinality
    // matching beating the max-cardinality optimum) only manifests with
    // negative finite costs, and the original |Δ| fixture sat entirely
    // above the oracle's floor. The combine pipeline's real costs are
    // −likelihood (negative), so this is also the representative shape.
    "j3_assignment" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val p = ranked(e, "purchase", "p_event")
      val v = ranked(e, "view", "v_event")
      val pairs = p.join(v, "user_id")
        .withColumn("cost",
          (col("p_event_cents") - col("v_event_cents")).cast("double"))
      val m = Assignment.assign(pairs, Seq("user_id"), "p_event", "v_event", "cost")
      sortAll(m.groupBy("user_id").agg(
        count(lit(1)).as("n_matched"),
        sum(col("cost")).cast("long").as("total_cost")))
    }),

    // §3.2 combine pipeline end-to-end: fixed-frequency grid (sequence +
    // explode) → band join both streams onto the grid → per-frame optimal
    // assignment (cost = |Δt|) → update join writeback → drop unmatched →
    // per-frame stats. Mirrors combine_pose_id_chunk.py:309-331.
    "j_combine_pipeline" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val bounds = e.agg(date_trunc("minute", min("ts")).as("t0"),
        date_trunc("minute", max("ts")).as("t1"))
      val grid = bounds.select(
        explode(sequence(col("t0"), col("t1"), expr("interval 1 minute"))).as("grid_t"))

      def onGrid(typ: String, keyOut: String, tsOut: String): DataFrame = {
        val src = e.filter(col("event_type") === typ)
          .select(col("event_id").as(keyOut), col("ts"))
        val j = BandJoin.bandJoin(grid, src, "grid_t", "ts", Nil, 0L, 59999999L)
        val w = Window.partitionBy("grid_t").orderBy(keyOut)
        j.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(col("grid_t"), col(keyOut), col("ts").as(tsOut))
      }
      val pj = onGrid("purchase", "p_event", "p_ts")
      val vj = onGrid("view", "v_event", "v_ts")
      val pairs = pj.join(vj, "grid_t")
        .withColumn("cost",
          abs(unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).cast("double"))
      val m = Assignment.assign(pairs, Seq("grid_t"), "p_event", "v_event", "cost")
      // J5 update-join writeback onto the pose (purchase) stream, then P8
      // drop-unmatched — rows whose identity was never overwritten vanish.
      val wrote = pj.join(m, Seq("grid_t", "p_event"), "left")
        .filter(col("v_event").isNotNull)
      sortAll(wrote.groupBy("grid_t").agg(
        count(lit(1)).as("n_matched"),
        sum(col("cost")).cast("long").as("total_cost_us")))
    })
  )

  /** Brute-force min-cost assignment totals for full bipartite groups with
    * ≤3 lefts (rank li) and ≤3 rights (rank ri): enumerate matchings of
    * size k = least(nl, nr) via ordered self-joins. `pairsCte` must define
    * pairs(g, li, ri, c).
    */
  private def bruteForceSql(pairsCte: String, gOut: String): String =
    s"""$pairsCte,
       |sizes AS (SELECT g, max(li) AS nl, max(ri) AS nr FROM pairs GROUP BY g),
       |m1 AS (SELECT g, min(c) AS best FROM pairs GROUP BY g),
       |m2 AS (SELECT a.g AS g, min(a.c + b.c) AS best
       |       FROM pairs a JOIN pairs b ON a.g = b.g AND a.li < b.li AND a.ri <> b.ri
       |       GROUP BY a.g),
       |m3 AS (SELECT a.g AS g, min(a.c + b.c + d.c) AS best
       |       FROM pairs a
       |       JOIN pairs b ON a.g = b.g AND a.li < b.li AND a.ri <> b.ri
       |       JOIN pairs d ON a.g = d.g AND b.li < d.li AND d.ri <> a.ri AND d.ri <> b.ri
       |       GROUP BY a.g)
       |SELECT s.g AS $gOut,
       |  CAST(least(s.nl, s.nr) AS BIGINT) AS n_matched,
       |  CAST(CASE least(s.nl, s.nr) WHEN 1 THEN m1.best WHEN 2 THEN m2.best
       |       ELSE m3.best END AS BIGINT)""".stripMargin

  val oracle: Map[String, String] = Map(
    "j3_assignment" ->
      s"""WITH p AS (
         |  SELECT user_id, event_id AS p_event, CAST(round(value*100) AS BIGINT) AS pc,
         |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS li
         |  FROM events WHERE event_type = 'purchase' QUALIFY li <= 3),
         |v AS (
         |  SELECT user_id, event_id AS v_event, CAST(round(value*100) AS BIGINT) AS vc,
         |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS ri
         |  FROM events WHERE event_type = 'view' QUALIFY ri <= 3),
         |${bruteForceSql(
             """pairs AS (
               |  SELECT p.user_id AS g, li, ri, (pc - vc) AS c
               |  FROM p JOIN v USING (user_id))""".stripMargin, "user_id")} AS total_cost
         |FROM sizes s JOIN m1 ON s.g = m1.g
         |LEFT JOIN m2 ON s.g = m2.g LEFT JOIN m3 ON s.g = m3.g
         |${orderBySql("user_id", "n_matched", "total_cost")}""".stripMargin,

    "j_combine_pipeline" ->
      s"""WITH p AS (
         |  SELECT g, p_event, pts, li FROM (
         |    SELECT date_trunc('minute', ts) AS g, event_id AS p_event, ts AS pts,
         |      row_number() OVER (PARTITION BY date_trunc('minute', ts) ORDER BY event_id) AS li
         |    FROM events WHERE event_type = 'purchase') WHERE li <= 3),
         |v AS (
         |  SELECT g, v_event, vts, ri FROM (
         |    SELECT date_trunc('minute', ts) AS g, event_id AS v_event, ts AS vts,
         |      row_number() OVER (PARTITION BY date_trunc('minute', ts) ORDER BY event_id) AS ri
         |    FROM events WHERE event_type = 'view') WHERE ri <= 3),
         |${bruteForceSql(
             """pairs AS (
               |  SELECT p.g AS g, li, ri, abs(epoch_us(pts) - epoch_us(vts)) AS c
               |  FROM p JOIN v ON p.g = v.g)""".stripMargin, "grid_t")} AS total_cost_us
         |FROM sizes s JOIN m1 ON s.g = m1.g
         |LEFT JOIN m2 ON s.g = m2.g LEFT JOIN m3 ON s.g = m3.g
         |${orderBySql("grid_t", "n_matched", "total_cost_us")}""".stripMargin
  )
}
