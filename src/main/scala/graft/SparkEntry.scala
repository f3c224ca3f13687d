package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented SURVEY §2 operator to a DataFrame
  * pipeline over the driver's synthetic tables; `oracleSql` carries the
  * DuckDB-equivalent SQL for hash-differential checking. Entries without
  * oracle SQL (typed kernels: Hungarian assignment, behavior detectors,
  * hash-dependent dedup) get the driver's rows-only check and are covered
  * by ScalaTest golden tests instead.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * sessionized per-user activity joined as-of with the latest view event.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("g1_sessionize")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ WindowQueries.queries ++ CoverageQueries.queries ++
      AssignQueries.queries ++ LlmQueries.queries ++ BehaviorQueries.queries

  /** Oracle SQL may reference source parquet via the `{SFDIR}` placeholder,
    * which Verify substitutes with the actual scale-factor directory. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ WindowQueries.oracle ++ CoverageQueries.oracle ++
      AssignQueries.oracle ++ LlmQueries.oracle ++ BehaviorQueries.oracle
}
