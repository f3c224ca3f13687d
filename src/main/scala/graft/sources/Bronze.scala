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
    // a bronze layout populated by an external writer (pandas default)
    // carries NTZ timestamps — imposed as instant TimestampType at the
    // reader (wall clock as UTC) rather than wrapped in a cast expression,
    // so the range predicate below reaches the parquet row groups as a
    // PushedFilter (see Cols.readNtzAsInstant)
    val base = graft.functions.Cols.readNtzAsInstant(spark, root)
      .filter(col("camera") === camera && col("register") === register)
    // floorDiv: `t - t % h` truncates toward zero, so a pre-1970 start
    // would round UP and the enumeration below would miss its hour
    val startHourMs = Math.floorDiv(start.getTime, 3600000L) * 3600000L
    val hours = (end.getTime - 1 - startHourMs) / 3600000L + 1
    val pruned =
      if (hours <= 14 * 24 && hours > 0) {
        // OR of (date = d AND hour = h) conjunctions — the form Catalyst's
        // partition pruning handles (struct-isin would not prune).
        // The partition values were written by `hour(time)`/`to_date(time)`
        // in the SESSION timezone, so enumerate the range's (date, hour)
        // pairs with java.time in that same zone (read from spark.conf) —
        // not with UTC-hour-aligned instants, which never produce the
        // session-local hour values of a zone at a non-whole-hour offset
        // (+05:30, +05:45, …), and this filter drops rows, it is not just
        // a pruning hint. Stepping every 15 min covers every real-world
        // offset granularity; the pairs dedup back to ~hours tuples.
        val zone = java.time.ZoneId.of(spark.conf.get(
          "spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID))
        val pairs = (0L to hours * 4).map { q =>
          val inst = java.time.Instant.ofEpochMilli(
            math.min(startHourMs + q * 900000L, end.getTime - 1))
          val z = inst.atZone(zone)
          (z.toLocalDate, z.getHour)
        }.distinct
        val cond = pairs.map { case (ld, h) =>
          col("date") === lit(java.sql.Date.valueOf(ld)) && col("hour") === h
        }.reduce(_ || _)
        base.filter(cond)
      } else
        base.filter(col("date").between(to_date(lit(start)), to_date(lit(end))))
    pruned.filter(col("time") >= lit(start) && col("time") < lit(end))
  }
}
