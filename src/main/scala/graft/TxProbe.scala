package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Quality

/** Scratch diagnostic for the tx9/d18 gopher wall at sf1. */
object TxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "local/sf1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TX_PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val d = Tables.documents(spark, sfDir)
    d.limit(100).count() // warm
    time("raw_scan") {
      d.select("doc_id", "text").write.format("noop").mode("overwrite").save()
    }
    val g = Quality.gopherRules(d, "doc_id", "text")
    time("gopher_rules_noop") {
      g.write.format("noop").mode("overwrite").save()
    }
    time("gopher_rules_sorted") {
      queries.Q.sortAll(g).write.format("noop").mode("overwrite").save()
    }
    for (c <- Seq("n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
        "ellipsis_frac", "alpha_word_frac", "stop_hits")) {
      time(s"col_$c") {
        g.select("doc_id", c).write.format("noop").mode("overwrite").save()
      }
    }
    val q = SparkEntry.queries("tx9_gopher_rules")
    time("tx9_full") {
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
    }

    // d9/d16 stage decomposition
    for (name <- Seq("d9_span_removal", "d16_line_dedup")) {
      val f = SparkEntry.queries(name)
      time(s"${name}_full") {
        f(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    // span removal internals: d9's exact parameters (spanTokens=5,
    // minDocs=2, hashWindows=false — the string-keyed oracle-parity mode)
    time("d9_keys_only") {
      d.filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.Cols.windowStrings(
            split(col("text"), " "), 5).as("_w"))
        .select(col("doc_id"), posexplode(col("_w")).as(Seq("_p", "_k")))
        .groupBy("_k").agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("d9_removal_unsorted") {
      graft.llm.Dedup.removeDupSpans(d, "doc_id", "text", 5,
          minDocs = 2, hashWindows = false)
        .write.format("noop").mode("overwrite").save()
    }
    time("d9_removal_hashed") {
      graft.llm.Dedup.removeDupSpans(d, "doc_id", "text", 5,
          minDocs = 2, hashWindows = true)
        .write.format("noop").mode("overwrite").save()
    }

    // d16 stage decomposition
    val lineChunkRe = "((\\S+ ){3}\\S+) "
    val lined = d.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        regexp_replace(col("text"), lineChunkRe, "$1\n").as("text"))
    time("d16_staging_only") {
      lined.write.format("noop").mode("overwrite").save()
    }
    time("d16_removal_unsorted") {
      graft.llm.Dedup.removeDupLines(lined, "doc_id", "text", minDocs = 2,
          hashLines = false)
        .write.format("noop").mode("overwrite").save()
    }
    time("d16_removal_hashed") {
      graft.llm.Dedup.removeDupLines(lined, "doc_id", "text", minDocs = 2,
          hashLines = true)
        .write.format("noop").mode("overwrite").save()
    }
    time("d16_removal_md5keys") {
      graft.llm.Dedup.removeDupLines(lined, "doc_id", "text", minDocs = 2,
          hashLines = true, md5Keys = true)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
