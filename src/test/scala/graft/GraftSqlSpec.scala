package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL façade exposes the tables to spark.sql so relational operators
  * run from SQL text and interleave with the typed operator APIs. */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registered views answer SQL and interleave with typed operators") {
    GraftSql.register(spark, TestSpark.sfDir)
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE event_type = 'purchase'").head.getLong(0)
    assert(n > 0)
    // typed operator output flows back into SQL via a view
    val sessed = graft.operators.Sessionize.sessionize(
      spark.table("events"), "ts", Seq("user_id"), 86400L * 1000000L)
    sessed.createOrReplaceTempView("sessions")
    val m = spark.sql(
      "SELECT count(DISTINCT user_id) FROM sessions WHERE session_id >= 1").head.getLong(0)
    assert(m > 0)
  }

  test("graft_sessionize from SQL equals the typed Sessionize operator") {
    GraftSql.register(spark, TestSpark.sfDir)
    val gap = 86400L * 1000000L
    val fromSql = spark.sql(
      s"""SELECT user_id, us, sid FROM (
         |  SELECT user_id,
         |    inline(arrays_zip(ts_arr, graft_sessionize(ts_arr, $gap))) AS (us, sid)
         |  FROM (
         |    SELECT user_id, sort_array(collect_list(unix_micros(ts))) AS ts_arr
         |    FROM events GROUP BY user_id))""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fromScala = graft.operators.Sessionize.sessionize(
        spark.table("events"), "ts", Seq("user_id"), gap)
      .selectExpr("user_id", "unix_micros(ts) AS us", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromSql === fromScala)
  }

  test("graft_assign from SQL equals the typed Assignment operator") {
    GraftSql.registerFunctions(spark)
    import spark.implicits._
    val pairs = Seq(
      (1L, 10L, "a", 0.5), (1L, 10L, "b", 0.1), (1L, 11L, "a", 0.2),
      (1L, 11L, "b", 0.9), (2L, 20L, "a", 0.3),
      (2L, 21L, "a", Double.PositiveInfinity))
      .toDF("grp", "l", "r", "cost")
    pairs.createOrReplaceTempView("cand_pairs")
    val fromSql = spark.sql(
      """SELECT grp, l, r, cost FROM (
        |  SELECT grp,
        |    inline(graft_assign(collect_list(struct(l, r, cost)))) AS (l, r, cost)
        |  FROM cand_pairs GROUP BY grp)
        |WHERE cost < cast('Infinity' as double)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    val fromScala = graft.operators.Assignment.assign(
        pairs, Seq("grp"), "l", "r", "cost")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(fromSql === fromScala)
    // the optimum: in group 1, b→10 (0.1) + a→11 (0.2) beats the greedy mix
    assert(fromSql.contains((1L, 10L, "b", 0.1)) && fromSql.contains((1L, 11L, "a", 0.2)))
  }
}
