package graft
import org.apache.spark.sql.SparkSession

/** Scratch per-query timer: `runMain graft.TimeQ <sfDir> <query...>` —
  * runs each named [[SparkEntry.queries]] entry against the parquet dir,
  * printing wall seconds, row count, and an order-insensitive checksum
  * (xor of row hashes) for quick before/after comparisons while tuning.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Tables.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val q = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val rows = q(spark, sfDir).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val sum = rows.foldLeft(0L)((acc, r) => acc ^ r.toString.hashCode.toLong)
      println(f"$name%-28s ${sec}%8.2f s  ${rows.length}%8d rows  checksum=$sum%016x")
    }
    spark.stop()
  }
}
