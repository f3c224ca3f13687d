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
    spark.stop()
  }
}
