package graft
import org.apache.spark.sql.SparkSession

/** Scratch per-query timer: `runMain graft.TimeQ <sfDir> <query...>`. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val blob = (0 to 5000).map(f => (new java.sql.Timestamp(1700000000000L + f * 20L),
      f * 1.0, 0.0)).toDF("time", "x", "y")
    val plan = graft.behavior.Detectors.blobSpeed(blob, 50.0, 5.4)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    windows.foreach(l => println("WIN: " + l.trim.take(160)))
    spark.stop()
  }
}
