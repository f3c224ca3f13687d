package graft

import org.apache.spark.sql.SparkSession

/** SQL façade (SURVEY §7.1 item 9): register the scale-factor tables as temp
  * views so every relational operator of the engine is reachable from
  * `spark.sql(...)` — the §2.8 scalar surface (string/date/math/array/map/
  * JSON) is Spark SQL built-ins and needs no registration. Typed operators
  * (as-of/band/sessionize/assignment/detectors) remain Scala APIs by design:
  * they compose DataFrames and return DataFrames, so they interleave freely
  * with SQL via `df.createOrReplaceTempView`.
  */
object GraftSql {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { t =>
      try Tables.table(spark, dir, t).createOrReplaceTempView(t)
      catch { case _: Throwable => () } // tolerate absent tables
    }
}
