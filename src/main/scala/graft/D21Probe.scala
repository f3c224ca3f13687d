package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{Corpus, Dedup, Quality, Sampling, Similarity}

/** Stage attribution for d21_full_pipeline — times each pipeline segment
  * through the noop sink so optimization lands on the real stage. Mirrors
  * the query's composition exactly (LlmQueries.scala d21). */
object D21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          starts.put(j.jobId, (System.nanoTime(), j.stageInfos.map(si =>
            s"${si.name.takeWhile(_ != '\n').take(60)}(${si.numTasks})")
            .mkString(" | ")))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          if (sys.env.contains("SPARK_GRAFT_PROBE_JOBS"))
            Option(starts.get(j.jobId)).foreach { case (t0, nm) =>
              println(f"  JOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%7.1f ms  $nm")
            }
        }
      })
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val j0 = jobs.get
      val r = f
      println(f"D21STAGE $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  jobs=${jobs.get - j0}%3d")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val reps = args.headOption.map(_.toInt).getOrElse(2)
    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      spark.catalog.clearCache()
      val dim = 1 << 16
      val all = spark.read.parquet(s"$sfDir/documents.parquet")
      val d0 = all.filter(col("doc_id").isNotNull && col("text").isNotNull &&
        col("source") =!= "src0")
      val bench = all.filter(col("source") === "src0")
      val spanRm = Dedup.removeDupSpans(d0, "doc_id", "text",
          spanTokens = 5, minDocs = 2, hashWindows = false)
        .select(col("doc_id"), col("clean_text").as("text"))
      timed("spanRm")(noop(spanRm))
      val lined = spanRm.select(col("doc_id"),
        graft.functions.Cols.chunkLines(col("text"), 4).as("text"))
      val lineRm = Dedup.removeDupLines(lined, "doc_id", "text",
          minDocs = 2, md5Keys = true)
        .select(col("doc_id"), col("clean_text").as("text"))
      timed("spanRm+lineRm")(noop(lineRm))
      val normed = lineRm.select(col("doc_id"),
        Quality.normalizeText(col("text")).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("normed persist")(noop(normed))
      val (uni, bi) = timed("ngramLm build")(Quality.ngramLm(normed, "text", 16, 64))
      timed("ngramLm noop")({ noop(uni); noop(bi) })
      val w19 = spark.range(dim).select(col("id").as("feature"),
          (col("id") % 2001 - 1000).as("w_micro"))
        .unionByName(spark.range(1).select(lit(-1L).as("feature"),
          lit(12345L).as("w_micro")))
      def cls(label: String, mod: Int, off: Int, b0: Long) =
        spark.range(dim).select(lit(label).as("label"),
          col("id").as("feature"), (col("id") % mod - off).as("w_micro"))
          .unionByName(spark.range(1).select(lit(label).as("label"),
            lit(-1L).as("feature"), lit(b0).as("w_micro")))
      val w20 = cls("en", 1999, 999, 0L)
        .unionByName(cls("fr", 2003, 1001, 0L))
        .unionByName(cls("de", 1993, 996, 0L))
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
      val semDrop = timed("semDrop build")(
        Similarity.semDedupDropped(e, cents, "vec_id", "embedding", 0.35))
      timed("semDrop noop")(noop(semDrop))
      val prepared = timed("prepare build")(Corpus.prepare(normed, "doc_id",
        "text", Seq("the", "a", "of", "and", "to"),
        Seq("en" -> Seq("the", "a", "of", "and"),
          "de" -> Seq("der", "die", "das", "und"),
          "es" -> Seq("el", "la", "los", "y")), 0.5, Seq("en"),
        maxDupWordFrac = 0.6, maxTopBigramFrac = 0.1,
        lm = Some(uni), maxPpl = 2000.0, biLm = Some(bi),
        embeddings = Some(e), semCentroids = Some(cents), semMinCos = 0.35,
        gopher = true,
        benchDocs = Some(bench), contamN = 5, maxContamFrac = 0.05,
        contamHash = false,
        classifier = Some(w19), classifierDim = dim,
        minLogitMicro = 12000L,
        langClassifier = Some(w20), langClassifierDim = dim))
      timed("prepare noop")(noop(prepared))
      val sv = prepared.select(col("rep_id"))
        .join(normed.select(col("doc_id").as("rep_id"), col("text")),
          Seq("rep_id"))
        .join(all.select(col("doc_id").as("rep_id"), col("source")),
          Seq("rep_id"))
      val quota = Sampling.mixQuota(sv, "source", "rep_id",
        (1 to 19).map(i => s"src$i" -> 1.0 / 19).toMap, 60L)
      val sharded = Sampling.shuffleShards(quota, "rep_id", 4, "ep1")
      val chunks = Sampling.chunkDocs(sharded, "rep_id", "text", 32, 8,
        carry = Seq("source", "rk", "shard", "pos"))
      val fin = chunks
        .select(col("doc_id"), col("source"), col("rk"), col("shard"),
          col("pos"), col("chunk_id"), col("n_tokens"),
          md5(col("chunk_text").cast("binary")).as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_id"))
      timed("packaging tail")(noop(fin))
      normed.unpersist()
    }
    spark.stop()
  }
}
