package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage timer for the perplexity/DSIR family: breaks a query's
  * wall into train / score / sort components at a given sf dir —
  * `runMain graft.LmProbe <sfDir>`. Dev probe only. */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Tables.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm the page cache / JIT
    time("warm: count(text not null)")(
      d.filter(col("text").isNotNull).count())
    val uni = time("train: unigramLm(16) collect")(
      graft.llm.Quality.unigramLm(d, "text", 16).collect())
    println(s"  uni rows: ${uni.length}")
    val uniDf = graft.llm.Quality.unigramLm(d, "text", 16)
    val bi = time("train: bigramLm(64) collect")(
      graft.llm.Quality.bigramLm(d, "text", uniDf, 64).collect())
    println(s"  bi rows: ${bi.length}")
    time("score: lmPerplexity count")(
      graft.llm.Quality.lmPerplexity(d, uniDf, "doc_id", "text").count())
    val biDf = graft.llm.Quality.bigramLm(d, "text", uniDf, 64)
    time("score: ngramPerplexity count")(
      graft.llm.Quality.ngramPerplexity(d, uniDf, biDf, "doc_id", "text")
        .count())
    time("plain: scan+sortAll floor (tx-shape)")(
      d.filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), length(col("text")).as("n"))
        .orderBy("doc_id", "n").count())
    val (tgt, src) = time("fused: dsirModels(16)")(
      graft.llm.Quality.dsirModels(d, col("source") === "src0", "text", 16))
    time("fused: dsirModels collect both")((tgt.collect(), src.collect()))
    time("score: lmLogRatio count")(
      graft.llm.Quality.lmLogRatio(d, tgt, src, "doc_id", "text").count())
    val (u2, b2) = time("fused: ngramLm(16, 64)")(
      graft.llm.Quality.ngramLm(d, "text", 16, 64))
    time("fused: ngramLm collect both")((u2.collect(), b2.collect()))
    time("score: ngramPerplexity (fused models) count")(
      graft.llm.Quality.ngramPerplexity(d, u2, b2, "doc_id", "text").count())
    spark.stop()
  }
}
