package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"${args.head}/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    def time[A](w: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$w%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    time("warm")(d.agg(sum(length(col("text")))).collect())
    time("plain length sum")(d.agg(sum(length(col("text")))).collect())
    time("LineChunkRe regexp_replace")(
      d.select(regexp_replace(col("text"), "((\\S+ ){3}\\S+) ", "$1\n").as("t"))
        .agg(sum(length(col("t")))).collect())
    time("split on chunked")(
      d.select(split(regexp_replace(col("text"), "((\\S+ ){3}\\S+) ", "$1\n"),
        "\n").as("l")).agg(sum(size(col("l")))).collect())
    time("md5low60 on lines")(
      d.select(graft.functions.Cols.elementMd5Low60(
        split(regexp_replace(col("text"), "((\\S+ ){3}\\S+) ", "$1\n"), "\n")).as("h"))
        .agg(sum(size(col("h")))).collect())
    time("xxhash on lines")(
      d.select(graft.functions.Cols.elementXxHash(
        split(regexp_replace(col("text"), "((\\S+ ){3}\\S+) ", "$1\n"), "\n")).as("h"))
        .agg(sum(size(col("h")))).collect())
    spark.stop()
  }
}
