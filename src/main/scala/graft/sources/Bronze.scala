package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze stream layout (SURVEY §1.4): the reference's
  * `root/<epoch>/<Camera>/<Camera>_<register>_<ts>.bin` hour-chunk files
  * become a Hive-partitioned parquet dataset
  * `camera=<cam>/register=<reg>/date=<d>/hour=<h>`, so the reference's
  * manual file-name pruning (`api.load(start, end)` + glob patterns) turns
  * into Catalyst partition pruning — a time-range + camera predicate never
  * touches non-matching files, at any corpus size.
  */
object Bronze {

  /** Write a timestamped stream into the partitioned bronze layout.
    * `dynamic` partition overwrite keeps re-runs idempotent per partition
    * (the reference's exists-check, S9). */
  def write(stream: DataFrame, root: String, camera: String, register: Int): Unit =
    stream
      .withColumn("camera", lit(camera))
      .withColumn("register", lit(register))
      .withColumn("date", to_date(col("time")))
      .withColumn("hour", hour(col("time")))
      .write
      .partitionBy("camera", "register", "date", "hour")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(root)

  /** Time-range pattern scan (S1): camera/register selection + [start, end)
    * pruning — both resolve against partition values before any file I/O.
    * For ranges up to 14 days the exact (date, hour) pairs are enumerated
    * driver-side (≤ 336 tuples) so the HOUR partitions prune too — a
    * one-hour query touches 1 partition, not the day's 24; longer ranges
    * fall back to date-level pruning (hour pruning buys nothing there).
    */
  def scan(spark: SparkSession, root: String, camera: String, register: Int,
      start: java.sql.Timestamp, end: java.sql.Timestamp): DataFrame = {
    val base = spark.read.parquet(root)
      .filter(col("camera") === camera && col("register") === register)
    val startHourMs = start.getTime - start.getTime % 3600000L
    val hours = (end.getTime - 1 - startHourMs) / 3600000L + 1
    val pruned =
      if (hours <= 14 * 24 && hours > 0) {
        // OR of (date = d AND hour = h) conjunctions — the form Catalyst's
        // partition pruning handles (struct-isin would not prune)
        // Both sides derived with Spark functions so date AND hour evaluate
        // in the session timezone — the same zone `write` used to produce the
        // partition values. (A JVM-local getHour here would silently drop
        // rows whenever spark.sql.session.timeZone != JVM default: this
        // filter is a row filter, not just a pruning hint.)
        val cond = (0L until hours).map { h =>
          val t = new java.sql.Timestamp(startHourMs + h * 3600000L)
          col("date") === to_date(lit(t)) &&
            col("hour") === hour(lit(t))
        }.reduce(_ || _)
        base.filter(cond)
      } else
        base.filter(col("date").between(to_date(lit(start)), to_date(lit(end))))
    pruned.filter(col("time") >= lit(start) && col("time") < lit(end))
  }
}
