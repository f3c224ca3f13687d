package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.llm.TextStats

/** Incremental corpus-ingestion probe (SURVEY §8, training-data pipeline
  * operational mode): documents land in poll-sized chunks; a checkpointed
  * streaming pipeline content-hashes each batch, drops replayed duplicates
  * across micro-batches with watermark-bounded state
  * (`dropDuplicatesWithinWatermark` — bounded state at corpus scale, the
  * dedup-at-ingest pattern), computes per-document text stats
  * ([[TextStats]]: token count, BPE estimate, quality score), and appends
  * to a silver sink. Every poll replays 20% of the previous poll's
  * documents (same text, new arrival time) — the cross-chunk duplication a
  * naive per-chunk job misses.
  *
  * Prints one summary line; run with `sbt "runMain graft.IngestProbe"`.
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nPolls = 4
    val t0us = 1717243200000000L
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val ingestDir = s"$base/landing"; val silverDir = s"$base/silver"
    new java.io.File(ingestDir).mkdirs(); new java.io.File(silverDir).mkdirs()

    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").cache()
    val nDocs = docs.count()
    val perPoll = nDocs / nPolls

    val landingSchema = StructType(Seq(
      StructField("time", TimestampType), StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")

    def pipeline() = {
      val in = spark.readStream.schema(landingSchema).parquet(s"$ingestDir/*")
      graft.streaming.Streaming.dedupWithinWatermark(
          in.withColumn("content_hash", sha2(col("text"), 256)),
          "time", Seq("content_hash"), "1 hour")
        .withColumn("n_tokens", TextStats.tokenCount(col("text")))
        .withColumn("n_bpe_est", TextStats.bpeTokenEstimate(col("text")))
        .withColumn("quality", TextStats.qualityScore(col("text"), stops))
        .drop("text")
    }

    val times = (0 until nPolls).map { k =>
      // poll k's slice + a 20% replay of poll k−1's docs at a NEW time
      val fresh = docs.filter(col("doc_id") % nPolls === k)
        .withColumn("time", timestamp_micros(lit(t0us + k * 60000000L)))
      val replay =
        if (k == 0) fresh.limit(0)
        else docs.filter(col("doc_id") % nPolls === (k - 1) &&
            col("doc_id") % 5 === 0)
          .withColumn("time", timestamp_micros(lit(t0us + k * 60000000L + 1)))
      fresh.unionByName(replay).select("time", "doc_id", "text")
        .write.parquet(s"$ingestDir/poll$k")
      val t0 = System.nanoTime()
      pipeline().writeStream.format("parquet")
        .option("path", silverDir)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    val silver = spark.read.parquet(silverDir)
    val kept = silver.count()
    val distinctHashes = silver.select("content_hash").distinct().count()
    val stats = silver.agg(sum("n_tokens"), avg("quality")).head()
    println(f"INGEST_PROBE polls=$nPolls docsPerPoll=$perPoll kept=$kept " +
      f"distinct=$distinctHashes pollSecs=[${times.map(t => f"$t%.1f").mkString(",")}] " +
      f"tokens=${stats.getLong(0)} avgQuality=${stats.getDouble(1)}%.3f")
    // replayed duplicates land within the watermark delay → dropped: every
    // kept row is a distinct content hash, and nothing fresh was lost
    require(kept == distinctHashes, s"duplicates leaked: $kept rows vs $distinctHashes hashes")
    val freshTotal = docs.select(sha2(col("text"), 256)).distinct().count()
    require(kept == freshTotal, s"expected $freshTotal distinct docs, kept $kept")
    spark.stop()
  }
}
