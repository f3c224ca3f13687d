package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Corpus, Dedup, Quality, Sampling}

/** Scratch stage-count probe for the d21 full-pipeline composition:
  * survivors after each gate at a given sf dir. Dev probe only. */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Tables.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    val d0 = all.filter(col("doc_id").isNotNull && col("text").isNotNull &&
      col("source") =!= "src0")
    println(s"d0: ${d0.count()}")
    val spanRm = Dedup.removeDupSpans(d0, "doc_id", "text",
        spanTokens = 5, minDocs = 2, hashWindows = false)
      .select(col("doc_id"), col("clean_text").as("text"))
    val lined = spanRm.select(col("doc_id"),
      regexp_replace(col("text"), "((\\S+ ){3}\\S+) ", "$1\n").as("text"))
    val lineRm = Dedup.removeDupLines(lined, "doc_id", "text",
        minDocs = 2, md5Keys = true)
      .select(col("doc_id"), col("clean_text").as("text"))
    val normed = lineRm.select(col("doc_id"),
      Quality.normalizeText(col("text")).as("text")).localCheckpoint()
    println(s"normed: ${normed.count()}, empty: " +
      normed.filter(length(col("text")) === 0).count())
    println("token count deciles: " + normed.select(
      size(split(col("text"), " ")).as("n")).stat.approxQuantile("n",
        Array(0.1, 0.25, 0.5, 0.75, 0.9), 0.01).mkString(","))
    println(s"gopher pass: " + normed.filter(
      Quality.gopherPass(col("text"))).count())
    println(s"repetition pass (0.6/0.1): " + normed.filter(
      Quality.repetitionPass(col("text"), 0.6, 0.1)).count())
    println(s"repetition pass (0.6/0.4): " + normed.filter(
      Quality.repetitionPass(col("text"), 0.6, 0.4)).count())
    val (uni, bi) = Quality.ngramLm(normed, "text", 16, 64)
    val ppl = Quality.ngramPerplexity(normed, uni, bi, "doc_id", "text")
    println("ppl deciles: " + ppl.stat.approxQuantile("ppl",
      Array(0.1, 0.5, 0.75, 0.9, 0.99), 0.01).mkString(","))
    val dim = 1 << 16
    val w19 = spark.range(dim).select(col("id").as("feature"),
        (col("id") % 2001 - 1000).as("w_micro"))
      .unionByName(spark.range(1).select(lit(-1L).as("feature"),
        lit(12345L).as("w_micro")))
    val clf = Quality.scoreTextClassifier(normed, "doc_id", "text", w19, dim)
    println(s"clf logit >= 0: " + clf.filter(col("logit_micro") >= 0).count())
    println("clf logit deciles: " + clf.select(col("logit_micro")
      .cast("double").as("l")).stat.approxQuantile("l",
        Array(0.1, 0.25, 0.5, 0.75, 0.9), 0.001).mkString(","))
    def cls(label: String, mod: Int, off: Int, b0: Long) =
      spark.range(dim).select(lit(label).as("label"),
        col("id").as("feature"), (col("id") % mod - off).as("w_micro"))
        .unionByName(spark.range(1).select(lit(label).as("label"),
          lit(-1L).as("feature"), lit(b0).as("w_micro")))
    val w20 = cls("en", 1999, 999, 0L)
      .unionByName(cls("fr", 2003, 1001, 0L))
      .unionByName(cls("de", 1993, 996, 0L))
    val lang = Quality.langIdTrained(normed, "doc_id", "text", w20, dim)
    println("langid counts: " + lang.groupBy("lang").count().collect()
      .map(r => r.getString(0) + "=" + r.getLong(1)).mkString(","))
    println("quality >= 0.5: " + normed.filter(
      round(graft.llm.TextStats.qualityScore(col("text"),
        Seq("the", "a", "of", "and", "to")), 6) >= 0.5).count())
    // intersection + per-source spread with the tuned knobs
    val gated = normed
      .filter(Quality.gopherPass(col("text")))
      .filter(Quality.repetitionPass(col("text"), 0.6, 0.1))
      .join(ppl.filter(col("ppl") <= 2000.0).select(col("doc_id")), "doc_id")
      .join(lang.filter(col("lang") === "en").select(col("doc_id")), "doc_id")
      .filter(round(graft.llm.TextStats.qualityScore(col("text"),
        Seq("the", "a", "of", "and", "to")), 6) >= 0.5)
    println(s"intersection (pre-contam/sem/dedup): ${gated.count()}")
    println("per-source: " + gated.join(all.select(col("doc_id"),
        col("source")), "doc_id")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) + "=" + r.getLong(1)).sorted.mkString(","))
    spark.stop()
  }
}
