package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, BandJoin}
import Q._

/** Scans, projections, joins and aggregations — SURVEY §2.1-§2.4 — expressed
  * over the driver's synthetic tables and hash-checked against DuckDB.
  */
object CoreQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1: time-range pattern scan (partition-prunable predicate reaches parquet)
    "s1_time_range_scan" -> ((s, dir) => {
      val e = t(s, dir, "events")
      sortAll(e
        .filter(col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value"))
    }),

    // P1: subset filter + projection (predicate pushdown)
    "p1_subset_filter" -> ((s, dir) => {
      val e = t(s, dir, "events")
      sortAll(e.filter(col("event_type").isin("purchase", "signup"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          cents(col("value")).as("value_cents")))
    }),

    // P3: identity-code projection (string → dense integer code). The code
    // domain is tiny and bounded (identity/event-type strings), so collect it
    // once and broadcast a literal mapping — no global single-partition
    // window at any scale.
    "p3_identity_code" -> ((s, dir) => {
      val e = t(s, dir, "events")
      // one lazy plan: the code table is a rank over the DISTINCT types
      // (a handful of rows after aggregation — the single-partition window
      // is on that tiny set), not a driver-side collect + re-parallelize,
      // so the query is one job instead of an eager collect plus the agg
      val codes = e.select("event_type").distinct()
        .withColumn("type_code",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(lit(0)).orderBy("event_type")).cast("long") - 1)
      sortAll(e.join(broadcast(codes), "event_type")
        .groupBy("event_type", "type_code").agg(count(lit(1)).as("n")))
    }),

    // P4: frame-id derivation from timestamp at fixed fps — the stream
    // start rides as a broadcast 1-row aggregate (one lazy plan, no eager
    // driver job, no NPE on an empty table), through the shared
    // Cols.frameId combinator
    "p4_frame_id" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val bounds = e.agg(min(unix_micros(col("ts"))).as("_t0us"))
      sortAll(e
        .filter(col("event_id") < 3000)
        .crossJoin(broadcast(bounds))
        .select(col("event_id"),
          graft.functions.Cols.frameId(unix_micros(col("ts")), col("_t0us"), 50.0)
            .as("frame_id")))
    }),

    // P5: homography projection via the shared Cols combinators (the same
    // expression tree Combine.projectAndUnion uses — no duplicated math)
    "p5_homography" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val h = Seq(0.866, -0.5, 10.0, 0.5, 0.866, -5.0, 0.0001, 0.0002, 1.0)
      val x = col("value"); val y = (col("user_id") % 100).cast("double") / 10.0
      sortAll(e.filter(col("event_id") < 3000).select(
        col("event_id"),
        round(graft.functions.Cols.homographyX(h, x, y), 6).as("x_top"),
        round(graft.functions.Cols.homographyY(h, x, y), 6).as("y_top")))
    }),

    // P7: duplicate-timestamp dedup (first row per truncated second)
    "p7_dedup_time" -> ((s, dir) => {
      val e = t(s, dir, "events")
      sortAll(e.groupBy(date_trunc("second", col("ts")).as("sec"))
        .agg(min("event_id").as("first_event"), count(lit(1)).as("n"))
        .filter(col("n") > 1))
    }),

    // P9: strict timestamp format/parse round trip
    "p9_ts_parse" -> ((s, dir) => {
      val e = t(s, dir, "events")
      sortAll(e.filter(col("event_id") < 2000).select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH-mm-ss").as("formatted"),
        to_timestamp(date_format(col("ts"), "yyyy-MM-dd'T'HH-mm-ss"),
          "yyyy-MM-dd'T'HH-mm-ss").as("reparsed")))
    }),

    // A1+A2: distinct values + scalar min/max aggregates
    "a1_distinct_minmax" -> ((s, dir) => {
      val e = t(s, dir, "events")
      sortAll(e.groupBy("event_type").agg(
        min("ts").as("min_ts"), max("ts").as("max_ts"),
        min(cents(col("value"))).as("min_cents"),
        max(cents(col("value"))).as("max_cents"),
        countDistinct("user_id").as("n_users")))
    }),

    // A3: group-first (first row per key by time)
    "a3_group_first" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      sortAll(e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type"))
    }),

    // A7: per-key mode with deterministic tie-break
    "a7_mode" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val counts = e.groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("user_id").orderBy(col("cnt").desc, col("event_type").asc)
      sortAll(counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "event_type", "cnt"))
    }),

    // Q1: wide aggregation (TPC-H Q1 flavor; exact integer-cents sums)
    "q1_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      sortAll(li.filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          sum(cents(col("l_discount"))).as("sum_disc_cents"),
          count(lit(1)).as("n")))
    }),

    // star join: orders ⋈ customer ⋈ nation ⋈ region, dims broadcast
    "j_star_join" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      sortAll(o
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(cents(col("o_totalprice"))).as("revenue_cents"),
          count(lit(1)).as("n_orders")))
    }),

    // J1: tolerance band join — minute grid × events within [t, t+30s)
    "j1_band_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val grid = e.select(date_trunc("minute", col("ts")).as("grid_t")).distinct()
      val joined = BandJoin.bandJoin(grid, e.select("ts", "value"),
        "grid_t", "ts", Nil, 0L, 29999999L)
      sortAll(joined.groupBy("grid_t")
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents")))
    }),

    // J2: as-of join, backward with tolerance (purchases ← latest view ≤ 10 min)
    "j2_asof_backward" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val p = e.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
      val j = AsOfJoin.asofJoin(p, v, "ts", Seq("user_id"),
        AsOfJoin.Backward, Some(172800000000L), tieBreak = Seq("view_id"))
      sortAll(j.filter(col("view_id").isNotNull).select(
        col("event_id"), col("user_id"), col("view_id"),
        round((unix_micros(col("ts")) - unix_micros(col("_asof_time"))).cast("double")
          / 1000000.0, 6).as("delta_sec")))
    }),

    // J2 nearest flavor (ties → backward, pandas semantics)
    "j2_asof_nearest" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val p = e.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
      val j = AsOfJoin.asofJoin(p, v, "ts", Seq("user_id"),
        AsOfJoin.Nearest, Some(172800000000L), tieBreak = Seq("view_id"))
      sortAll(j.filter(col("view_id").isNotNull).select(
        col("event_id"), col("user_id"), col("view_id"),
        round(abs(unix_micros(col("ts")) - unix_micros(col("_asof_time"))).cast("double")
          / 1000000.0, 6).as("delta_sec")))
    }),

    // J5: update (left) join + coalesce overwrite
    "j5_update_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val upd = e.groupBy("user_id").agg(sum(cents(col("value"))).as("tot"))
        .filter(col("tot") > 100000).select(col("user_id"), lit("vip").as("label"))
      sortAll(e.join(broadcast(upd), Seq("user_id"), "left")
        .withColumn("label", coalesce(col("label"), lit("std")))
        .groupBy("label", "event_type").agg(count(lit(1)).as("n")))
    }),

    // J6: interval anti-join (maintenance-window exclusion) via bucketed band join
    "j6_interval_exclusion" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val err = e.filter(col("event_type") === "error").select(col("ts").as("err_ts"))
      // events within [err_ts, err_ts+300s] of any error → excluded
      val hit = BandJoin.bandJoin(
          e.select("event_id", "ts"), err, "ts", "err_ts", Nil, -300000000L, 0L)
        .select("event_id").distinct()
      sortAll(e.join(hit, Seq("event_id"), "left_anti")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents")))
    }),

    // J7/J8: key-set intersection/union/difference — folded into ONE
    // groupBy pass (per-user membership flags + conditional counts + stack)
    // instead of six distinct/intersect/except shuffles; same result, one
    // shuffle, and the shape that survives 100× the keys.
    "j7_set_ops" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val flags = e.groupBy("user_id").agg(
        max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("b"))
      val counts = flags.agg(
        sum(when(col("c") === 1 && col("b") === 1, 1L).otherwise(0L)).as("n_both"),
        sum(when(col("c") === 1 || col("b") === 1, 1L).otherwise(0L)).as("n_either"),
        sum(when(col("c") === 1 && col("b") === 0, 1L).otherwise(0L)).as("n_click_only"))
      sortAll(counts.selectExpr(
        "stack(3, 'both', n_both, 'either', n_either, 'click_only', n_click_only)" +
          " AS (set_kind, n_users)")
        .filter(col("n_users") > 0))
    }),

    // O1/O5: multi-key sort + top-k
    "o1_topk" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      sortAll(li.orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
        .select(col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice")).as("price_cents")))
    }),

    // O2: union/concat with sentinel padding
    "o2_union" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val a = e.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), lit("real").as("origin"))
      val sentinel = s.range(1).select(lit(-1L).as("event_id"),
        lit(-1L).as("user_id"), lit("sentinel").as("origin"))
      sortAll(a.unionByName(sentinel).groupBy("origin").agg(
        count(lit(1)).as("n"), min("event_id").as("min_id")))
    })
  )

  val oracle: Map[String, String] = Map(
    "s1_time_range_scan" ->
      s"""SELECT event_id, ts, user_id, event_type, value FROM events
         |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-04 00:00:00'
         |${orderBySql("event_id", "ts", "user_id", "event_type", "value")}""".stripMargin,

    "p1_subset_filter" ->
      s"""SELECT event_id, user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents
         |FROM events WHERE event_type IN ('purchase','signup')
         |${orderBySql("event_id", "user_id", "event_type", "value_cents")}""".stripMargin,

    "p3_identity_code" ->
      s"""WITH codes AS (SELECT event_type, DENSE_RANK() OVER (ORDER BY event_type) - 1 AS type_code
         |  FROM (SELECT DISTINCT event_type FROM events))
         |SELECT e.event_type, c.type_code, count(*) AS n
         |FROM events e JOIN codes c USING (event_type)
         |GROUP BY e.event_type, c.type_code
         |${orderBySql("event_type", "type_code", "n")}""".stripMargin,

    "p4_frame_id" ->
      s"""SELECT event_id,
         |  CAST(round((epoch_us(ts) - (SELECT min(epoch_us(ts)) FROM events)) * 50.0 / 1000000.0) AS BIGINT) AS frame_id
         |FROM events WHERE event_id < 3000
         |${orderBySql("event_id", "frame_id")}""".stripMargin,

    "p5_homography" ->
      s"""SELECT event_id,
         |  round((0.866*value - 0.5*(CAST(user_id % 100 AS DOUBLE)/10.0) + 10.0) / (0.0001*value + 0.0002*(CAST(user_id % 100 AS DOUBLE)/10.0) + 1.0), 6) AS x_top,
         |  round((0.5*value + 0.866*(CAST(user_id % 100 AS DOUBLE)/10.0) - 5.0) / (0.0001*value + 0.0002*(CAST(user_id % 100 AS DOUBLE)/10.0) + 1.0), 6) AS y_top
         |FROM events WHERE event_id < 3000
         |${orderBySql("event_id", "x_top", "y_top")}""".stripMargin,

    "p7_dedup_time" ->
      s"""SELECT date_trunc('second', ts) AS sec, min(event_id) AS first_event, count(*) AS n
         |FROM events GROUP BY 1 HAVING count(*) > 1
         |${orderBySql("sec", "first_event", "n")}""".stripMargin,

    "p9_ts_parse" ->
      s"""SELECT event_id, strftime(ts, '%Y-%m-%dT%H-%M-%S') AS formatted,
         |  strptime(strftime(ts, '%Y-%m-%dT%H-%M-%S'), '%Y-%m-%dT%H-%M-%S') AS reparsed
         |FROM events WHERE event_id < 2000
         |${orderBySql("event_id", "formatted", "reparsed")}""".stripMargin,

    "a1_distinct_minmax" ->
      s"""SELECT event_type, min(ts) AS min_ts, max(ts) AS max_ts,
         |  min(CAST(round(value*100) AS BIGINT)) AS min_cents,
         |  max(CAST(round(value*100) AS BIGINT)) AS max_cents,
         |  count(DISTINCT user_id) AS n_users
         |FROM events GROUP BY event_type
         |${orderBySql("event_type", "min_ts", "max_ts", "min_cents", "max_cents", "n_users")}""".stripMargin,

    "a3_group_first" ->
      s"""SELECT user_id, event_id, event_type FROM (
         |  SELECT user_id, event_id, event_type,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |  FROM events) WHERE rn = 1
         |${orderBySql("user_id", "event_id", "event_type")}""".stripMargin,

    "a7_mode" ->
      s"""SELECT user_id, event_type, cnt FROM (
         |  SELECT user_id, event_type, cnt,
         |    row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
         |  FROM (SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1,2))
         |WHERE rn = 1
         |${orderBySql("user_id", "event_type", "cnt")}""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
         |  CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
         |  count(*) AS n
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |${orderBySql("l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "sum_disc_cents", "n")}""".stripMargin,

    "j_star_join" ->
      s"""SELECT r_name, n_name,
         |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
         |  count(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |${orderBySql("r_name", "n_name", "revenue_cents", "n_orders")}""".stripMargin,

    "j1_band_join" ->
      s"""WITH grid AS (SELECT DISTINCT date_trunc('minute', ts) AS grid_t FROM events)
         |SELECT g.grid_t, count(*) AS n, CAST(sum(CAST(round(e.value*100) AS BIGINT)) AS BIGINT) AS sum_cents
         |FROM grid g JOIN events e
         |  ON epoch_us(e.ts) - epoch_us(g.grid_t) BETWEEN 0 AND 29999999
         |GROUP BY g.grid_t
         |${orderBySql("grid_t", "n", "sum_cents")}""".stripMargin,

    "j2_asof_backward" ->
      s"""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         |     v AS (SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view')
         |SELECT p.event_id AS event_id, p.user_id AS user_id, v.view_id AS view_id,
         |  round((epoch_us(p.ts) - epoch_us(v.ts)) / 1000000.0, 6) AS delta_sec
         |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
         |WHERE epoch_us(p.ts) - epoch_us(v.ts) <= 172800000000
         |${orderBySql("event_id", "user_id", "view_id", "delta_sec")}""".stripMargin,

    "j2_asof_nearest" ->
      s"""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         |     v AS (SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view'),
         |cand AS (
         |  SELECT p.event_id, p.user_id, v.view_id,
         |    abs(epoch_us(p.ts) - epoch_us(v.ts)) AS d_us, v.ts AS vts
         |  FROM p JOIN v ON p.user_id = v.user_id
         |  WHERE abs(epoch_us(p.ts) - epoch_us(v.ts)) <= 172800000000)
         |SELECT event_id, user_id, view_id, round(d_us / 1000000.0, 6) AS delta_sec
         |FROM (SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY d_us, vts, view_id) AS rn FROM cand)
         |WHERE rn = 1
         |${orderBySql("event_id", "user_id", "view_id", "delta_sec")}""".stripMargin,

    "j5_update_join" ->
      s"""WITH upd AS (
         |  SELECT user_id, 'vip' AS label FROM (
         |    SELECT user_id, sum(CAST(round(value*100) AS BIGINT)) AS tot
         |    FROM events GROUP BY user_id) WHERE tot > 100000)
         |SELECT coalesce(u.label, 'std') AS label, e.event_type, count(*) AS n
         |FROM events e LEFT JOIN upd u USING (user_id)
         |GROUP BY 1, 2
         |${orderBySql("label", "event_type", "n")}""".stripMargin,

    "j6_interval_exclusion" ->
      s"""SELECT event_type, count(*) AS n, CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
         |FROM events e
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM events x WHERE x.event_type = 'error'
         |  AND e.ts >= x.ts AND epoch_us(e.ts) - epoch_us(x.ts) <= 300000000)
         |GROUP BY event_type
         |${orderBySql("event_type", "n", "sum_cents")}""".stripMargin,

    "j7_set_ops" ->
      s"""WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         |     buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         |     sets AS (
         |  SELECT 'both' AS set_kind, user_id FROM (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers)
         |  UNION ALL
         |  SELECT 'either', user_id FROM (SELECT user_id FROM clickers UNION SELECT user_id FROM buyers)
         |  UNION ALL
         |  SELECT 'click_only', user_id FROM (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers))
         |SELECT set_kind, count(*) AS n_users FROM sets GROUP BY set_kind
         |${orderBySql("set_kind", "n_users")}""".stripMargin,

    "o1_topk" ->
      s"""SELECT * FROM (
         |  SELECT l_orderkey, l_linenumber, CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
         |  FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10)
         |${orderBySql("l_orderkey", "l_linenumber", "price_cents")}""".stripMargin,

    "o2_union" ->
      s"""WITH a AS (
         |  SELECT event_id, user_id, 'real' AS origin FROM events WHERE event_type = 'signup'
         |  UNION ALL SELECT -1, -1, 'sentinel')
         |SELECT origin, count(*) AS n, min(event_id) AS min_id FROM a GROUP BY origin
         |${orderBySql("origin", "n", "min_id")}""".stripMargin
  )
}
