package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for the TF-IDF plan (tx10's sf1 wall). */
object TfidfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tfidf] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.table(spark, sfDir, "documents")
    // warm the file scan
    time("scan")(docs.agg(count(lit(1))).head)
    val base = docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        filter(split(lower(col("text")), " "), t => t =!= "").as("_toks"))
      .select(col("doc_id"), col("_toks"), size(col("_toks")).as("_dl"))
      .filter(col("_dl") >= 1)
    time("base+termCounts")(base.select(col("doc_id"),
      graft.functions.Cols.termCounts(col("_toks")).as("_tc"))
      .agg(sum(size(col("_tc")))).head)
    val dt = base.select(col("doc_id"), col("_dl"),
        explode(graft.functions.Cols.termCounts(col("_toks"))).as("_tc"))
      .select(col("doc_id"), col("_dl"), col("_tc.term").as("term"),
        col("_tc.tf").as("tf"))
    time("dt explode count")(dt.agg(count(lit(1))).head)
    val df = dt.groupBy("term").agg(count(lit(1)).as("_df"))
    time("df agg")(df.agg(count(lit(1))).head)
    val n = base.agg(count(lit(1)).as("_n"))
    val scored = dt.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("_idfm",
        round(log((col("_n") + 1).cast("double") / (col("_df") + 1)) * 1e6)
          .cast("long"))
      .withColumn("tfidf_micro", expr(
        s"""CASE WHEN _idfm = 0 OR tf <= ${Long.MaxValue}L div _idfm
           |  THEN (tf * _idfm) div _dl
           |  ELSE CAST((CAST(tf AS DECIMAL(38,0)) * _idfm) div _dl AS BIGINT)
           |END""".stripMargin))
    time("join+score")(scored.agg(sum(col("tfidf_micro"))).head)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf_micro").desc, col("term").asc)
    val ranked = scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("doc_id", "term", "tf", "tfidf_micro", "rk")
    time("window top-3")(ranked.agg(count(lit(1))).head)
    time("full query")(graft.queries.Q.sortAll(
      graft.llm.Relevance.tfidfTopTerms(docs, "doc_id", "text", 3))
      .agg(count(lit(1))).head)
    time("full query rep2")(graft.queries.Q.sortAll(
      graft.llm.Relevance.tfidfTopTerms(docs, "doc_id", "text", 3))
      .agg(count(lit(1))).head)
    // where do tasks go: count stage-level wall via listener
    val ranked2 = graft.llm.Relevance.tfidfTopTerms(docs, "doc_id", "text", 3)
    ranked2.explain("formatted")
    spark.stop()
  }
}
