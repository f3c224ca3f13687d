package graft
import org.apache.spark.sql.SparkSession

/** Scratch per-query timer: `runMain graft.TimeQ <sfDir> <query...>` —
  * clearCache + noop-write per query, prints wall seconds. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = Tables.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { n =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"TIME $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
