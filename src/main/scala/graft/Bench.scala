package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Bench runner: executes every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * emits one JSON line with per-query wall seconds.
  *
  * Each query is fully materialized through a `noop`-format write (not
  * `.count()`): count() lets Catalyst prune every projected column, so
  * pure-projection queries would benchmark a scan instead of their math.
  * The JSON line goes to stdout AND to bench_out.json in the cwd so the
  * harness can parse it even when sbt prefixes stdout with [info].
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: pay JVM/codegen/parquet-reader initialization once, outside
    // the measured loop, so the first query's time is its own.
    try Tables.events(spark, sfDir).limit(10000)
      .groupBy("event_type").count()
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    try Files.writeString(Paths.get("bench_out.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
