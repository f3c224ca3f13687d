package graft
import org.apache.spark.sql.SparkSession

/** Scratch smoke-runner: `sbt "runMain graft.Probe"` runs the flagship
  * entry() on sf0.001 and prints its row count (driver smoke contract).
  */
object Probe {

  /** Peak JVM heap use (MB) across all heap pools since start — the
    * local[32] stand-in for per-executor peak memory in the scale probes
    * (single-JVM local mode: driver + all 32 executor threads share this
    * heap, so it upper-bounds any per-executor figure). */
  def peakHeapMb: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum / (1024L * 1024L)
  }

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
