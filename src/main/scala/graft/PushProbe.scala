package graft
import org.apache.spark.sql.SparkSession
object PushProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = SparkEntry.queries("s1_time_range_scan")(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    plan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
      .foreach(l => println("PLAN: " + l.trim.take(220)))
    spark.stop()
  }
}
