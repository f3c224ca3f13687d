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
    * pruning — both resolve against partition values before any file I/O. */
  def scan(spark: SparkSession, root: String, camera: String, register: Int,
      start: java.sql.Timestamp, end: java.sql.Timestamp): DataFrame =
    spark.read.parquet(root)
      .filter(col("camera") === camera && col("register") === register)
      .filter(col("date").between(to_date(lit(start)), to_date(lit(end))))
      .filter(col("time") >= lit(start) && col("time") < lit(end))
}
