package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization probe: `runMain graft.OptProbe <sfDir> <tag> <query...>` —
  * for each named [[SparkEntry.queries]] entry, times the noop-sink
  * materialization (min of SPARK_GRAFT_OPT_REPS, default 3, matching the
  * bench methodology) and writes the `explain("formatted")` plan to
  * `plans/r14/<query>_<tag>.txt` so plan claims in OPTIMIZATION_r14.md are
  * checkable without running Spark. Jobs are labeled for the UI.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val reps = sys.env.getOrElse("SPARK_GRAFT_OPT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r14"))
    // same warm-up as Bench so first-query numbers are comparable
    try {
      Tables.events(spark, sfDir).limit(10000)
        .groupBy("event_type").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      val df = q(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r14/${name}_$tag.txt"), plan)
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(s"optprobe: $name")
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[optprobe] $name%-32s min=${times.min}%6.2f s  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
