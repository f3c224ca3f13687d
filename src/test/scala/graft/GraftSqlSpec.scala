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
}
