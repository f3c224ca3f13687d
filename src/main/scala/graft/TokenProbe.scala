package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Bpe, Relevance}

/** Tokenizer + relevance tier at scale (SURVEY §8): [[Bpe.train]]/
  * [[Bpe.encode]] and [[Relevance.tfidfTopTerms]]/[[Relevance.bm25TopK]]
  * over the MixProbe corpus shape — half "looped" docs (a 4-token phrase
  * from a 4000-token family repeated 10×) and half fully-unique docs
  * (40 globally-unique tokens each). The unique population makes the
  * word-type table GROW with the corpus (40·n/2 distinct words at n docs —
  * the worst case for merge-iteration cost), while the looped population
  * pins structural expectations:
  *
  *   - BPE merge counts are NON-INCREASING in rank (each merge's output
  *     pairs are sub-multisets of its input pair, and every other count
  *     only falls) — asserted across the whole table;
  *   - every unique-population TF-IDF term has tf = 1, df = 1, dl = 40,
  *     so all its top-k scores equal ONE exact micro value;
  *   - a BM25 query for one phrase token matches exactly its n/2000
  *     docs, all with identical (tf = 10, dl = 40) hence ONE exact score,
  *     and top-k returns the k smallest matching ids.
  *
  * Assertions are distributed (aggregates, never collect beyond top-k).
  * `SPARK_GRAFT_MIX_DOCS` scales (default 200000; 1000000 for the
  * committed 1 M-doc numbers). */
object TokenProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_MIX_DOCS", "200000").toLong
    val half = n / 2

    val looped = spark.range(half).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map { j =>
        concat(lit("p"), (col("id") % 1000).cast("string"), lit(s"_${j % 4}"))
      }: _*).as("text"))
    val unique = spark.range(half, n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map { j =>
        concat(lit("u"), (col("id") * 40 + j).cast("string"))
      }: _*).as("text"))
    val docs = looped.union(unique).localCheckpoint()
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[token] $tag wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // --- BPE batched vs sequential training: 64 merges each way over the
    // same corpus, identical tables required, jobs and wall compared —
    // the production-vocab argument (32k-64k merges) is THIS ratio
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet()
      })
    val bpeMerges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "64").toInt
    def tableOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val j0 = jobCount.get()
    val seqTable = time(s"bpeTrainSeq($bpeMerges)")(
      tableOf(Bpe.train(docs, "doc_id", "text", bpeMerges,
        driverTypeCap = 0L)))
    val jSeq = jobCount.get() - j0
    val batTable = time(s"bpeTrainBatch($bpeMerges, maxBatch=64)")(
      tableOf(Bpe.train(docs, "doc_id", "text", bpeMerges, maxBatch = 64,
        driverTypeCap = 0L)))
    val jBat = jobCount.get() - j0 - jSeq
    // the production fast path: word-type table (40·n/2 + 4000 types)
    // collected once, trained in the incremental kernel
    val kerTable = time(s"bpeTrainKernel($bpeMerges)")(
      tableOf(Bpe.train(docs, "doc_id", "text", bpeMerges,
        driverTypeCap = 100000000L)))
    val jKer = jobCount.get() - j0 - jSeq - jBat
    require(batTable == seqTable,
      "batched merge table must equal the sequential loop's")
    require(kerTable == seqTable,
      "kernel merge table must equal the sequential loop's")
    require(seqTable.length == bpeMerges,
      s"$bpeMerges merges trained, got ${seqTable.length}")
    println(s"[token] bpeJobs seq=$jSeq batched=$jBat kernel=$jKer " +
      f"kernelRatio=${jSeq.toDouble / jKer}%.1fx")

    // --- BPE train: 8 merges over a word-type table that is mostly
    // unique words (40·n/2 + 4000 types) — the iteration-cost worst case
    val merges = time("bpeTrain(8)")(
      Bpe.train(docs, "doc_id", "text", 8).localCheckpoint())
    val ms = merges.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    require(ms.length == 8, s"8 merges trained, got ${ms.length}")
    require(ms.sliding(2).forall(w => w(0)._4 >= w(1)._4),
      "merge counts must be non-increasing in rank: " + ms.mkString(", "))

    // --- BPE encode: every doc rows out, subword count bounded by chars
    val enc = time("bpeEncode")(
      Bpe.encode(docs, "doc_id", "text", merges).localCheckpoint())
    require(enc.count() == n, "one encode row per doc")
    val over = enc.join(docs.select(col("doc_id"),
        length(col("text")).cast("long").as("nc")), "doc_id")
      .filter(col("n_bpe_tokens") > col("nc") || col("n_bpe_tokens") < 40L)
      .count()
    require(over == 0, "40 ≤ n_bpe_tokens ≤ n_chars for every doc")

    // --- TF-IDF: unique docs' terms all have tf=1, df=1, dl=40 → one
    // exact micro score across the whole population
    val tfidf = time("tfidfTopTerms(3)")(
      Relevance.tfidfTopTerms(docs, "doc_id", "text", 3).localCheckpoint())
    require(tfidf.count() == 3L * n, "3 rows per doc")
    val uScore = (1L * math.round(math.log((n + 1).toDouble / 2) * 1e6)) / 40L
    val badU = tfidf.filter(col("doc_id") >= half &&
      col("tfidf_micro") =!= uScore).count()
    require(badU == 0, s"unique-population scores must all equal $uScore")

    // --- BM25: one phrase token → exactly the id%1000==1 looped docs,
    // one exact score, top-k = the k smallest ids
    val k = 25
    val hits = time("bm25TopK")(
      Relevance.bm25TopK(docs, "doc_id", "text", Seq("p1_0"), k).collect())
    require(hits.length == k, s"$k hits")
    require(hits.map(_.getLong(1)).distinct.length == 1,
      "identical (tf, dl) → one exact score")
    val expectIds = (0 until k).map(i => 1L + 1000L * i).toSet
    require(hits.map(_.getLong(0)).toSet == expectIds,
      "score ties break by ascending doc_id")

    println(s"[token] OK docs=$n")
    spark.stop()
  }
}
