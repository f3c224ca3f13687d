package graft
import org.apache.spark.sql.SparkSession

/** Scratch smoke-runner: `sbt "runMain graft.Probe"` runs the flagship
  * entry() on sf0.001 and prints its row count (driver smoke contract).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
