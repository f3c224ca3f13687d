package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Quality, Sampling}

/** Training-mix tier at scale (SURVEY §8): [[Quality.repetitionStats]],
  * [[Sampling.hashSample]], [[Sampling.stratifiedQuota]],
  * [[Sampling.packGreedy]], [[Quality.unigramLm]]/[[Quality.lmPerplexity]],
  * and [[Dedup.removeDupLines]] over a synthesized corpus with two
  * structurally known populations — "looped" docs (a 4-token phrase
  * repeated 10×: dup_word_frac = 36/40, dup_bigram_frac = 35/39,
  * top_bigram_frac = 10/39 exactly) and fully-unique docs (0, 0, 1/39).
  * The LM arm pins the smoothing floor structurally: with the vocab cut
  * exactly at the 4000 looped tokens, every unique-population token is
  * OOV, so all unique docs share ONE exact perplexity, strictly above
  * every looped doc's. The line-dedup arm plants a VIRAL line (present in
  * every document — the worst key skew the operator can see) and asserts
  * exact excision; per-task state stays bounded by the capped typed
  * aggregate. Every assertion is computed DISTRIBUTED (aggregates and
  * anti-joins, never collect) so the probe itself exercises the
  * operators' scale shape.
  *
  * `SPARK_GRAFT_MIX_DOCS` scales (default 200000; 1000000 for the
  * committed 1 M-doc numbers). */
object MixProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_MIX_DOCS", "200000").toLong
    val half = n / 2

    // docs 0..half-1: phrase p<id%1000>_0..3 repeated 10× (40 tokens);
    // docs half..n-1: 40 globally-unique tokens
    val looped = spark.range(half).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map { j =>
        concat(lit("p"), (col("id") % 1000).cast("string"), lit(s"_${j % 4}"))
      }: _*).as("text"))
    val unique = spark.range(half, n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map { j =>
        concat(lit("u"), (col("id") * 40 + j).cast("string"))
      }: _*).as("text"))
    val docs = looped.union(unique)
      .withColumn("strata", (col("doc_id") % 16).cast("string"))
      .localCheckpoint()
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mix] $tag wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // --- repetitionStats: exact fractions for both populations ---
    val rep = time("repetitionStats") {
      Quality.repetitionStats(docs, "doc_id", "text").localCheckpoint()
    }
    require(rep.count() == n, "one row per doc")
    val r6 = (x: Double) => math.rint(x * 1e6) / 1e6
    val badLoop = rep.filter(col("doc_id") < half &&
      (col("dup_word_frac") =!= r6(36.0 / 40) ||
       col("dup_bigram_frac") =!= r6(35.0 / 39) ||
       col("top_bigram_frac") =!= r6(10.0 / 39))).count()
    val badUniq = rep.filter(col("doc_id") >= half &&
      (col("dup_word_frac") =!= 0.0 || col("dup_bigram_frac") =!= 0.0 ||
       col("top_bigram_frac") =!= r6(1.0 / 39))).count()
    require(badLoop == 0 && badUniq == 0,
      s"exact repetition fractions: badLoop=$badLoop badUniq=$badUniq")

    // --- hashSample: reproducible, unbiased, shuffle-free ---
    val s1 = time("hashSample")(
      Sampling.hashSample(docs, "doc_id", 37).select("doc_id").localCheckpoint())
    val frac = s1.count().toDouble / n
    require(frac > 0.35 && frac < 0.39, s"sample fraction $frac vs pct 37")
    val s2 = Sampling.hashSample(docs.repartition(64), "doc_id", 37).select("doc_id")
    require(s1.union(s2).except(s1.intersect(s2)).count() == 0,
      "sample must be identical across partitionings")

    // --- stratifiedQuota: k rows per stratum, rank bounded ---
    val k = 10
    val quota = time("stratifiedQuota")(
      Sampling.stratifiedQuota(docs, Seq("strata"), "doc_id", k).localCheckpoint())
    require(quota.count() == 16L * k, "k rows per stratum")
    require(quota.agg(max("rk")).head.getInt(0) <= k, "rank bounded by k")

    // --- packGreedy: 40-token docs, budget 100 → exactly 2 docs per bin
    // (except one odd tail bin per group), never over budget ---
    val packed = time("packGreedy")(
      Sampling.packGreedy(docs, "doc_id", "text", "strata", 100L, 8)
        .localCheckpoint())
    require(packed.count() == n, "every doc packed")
    val bins = packed.groupBy("strata", "shard", "bin_id")
      .agg(count(lit(1)).as("docs"), sum("n_tok").as("toks"))
    require(bins.filter(col("docs") > 2).count() == 0, "max 2×40 ≤ 100 per bin")
    require(bins.filter(col("docs") > 1 && col("toks") > 100).count() == 0,
      "multi-doc bins within budget")
    // each (strata, shard) group packs ceil(g/2) bins
    val grp = packed.groupBy("strata", "shard").agg(count(lit(1)).as("g"),
      (max("bin_id") + 1).as("nbins"))
    require(grp.filter(col("nbins") =!= ceil(col("g") / 2.0).cast("long"))
      .count() == 0, "greedy bin count = ceil(group/2)")

    // --- unigramLm + lmPerplexity: vocab cut at the 4000 looped tokens →
    // unique docs are all-OOV and share ONE exact perplexity, above every
    // looped doc's (the reference-LM floor separating the populations) ---
    val lm = time("unigramLm")(
      Quality.unigramLm(docs, "text", 4000).localCheckpoint())
    require(lm.count() == 4000, "vocab = exactly the looped tokens")
    require(lm.agg(min("cnt")).head.getLong(0) > 1L,
      "no count-1 unique token may enter the vocab")
    val ppl = time("lmPerplexity")(
      Quality.lmPerplexity(docs, lm, "doc_id", "text").localCheckpoint())
    require(ppl.count() == n, "one ppl row per doc")
    val uniqPpls = ppl.filter(col("doc_id") >= half)
      .agg(countDistinct("ppl").as("d"), min("ppl").as("mn")).head
    require(uniqPpls.getLong(0) == 1L, "all-OOV docs share one exact ppl")
    val maxLoop = ppl.filter(col("doc_id") < half)
      .agg(max("ppl")).head.getDouble(0)
    require(maxLoop < uniqPpls.getDouble(1),
      s"looped ppl $maxLoop must sit below the OOV floor ${uniqPpls.getDouble(1)}")

    // --- bigramLm + ngramPerplexity (stupid backoff): train + score
    // walls at the same corpus scale; looped docs are wall-to-wall known
    // bigrams (high p) and must sit strictly below the unique docs'
    // backed-off scores ---
    val bi = time("bigramLm")(
      Quality.bigramLm(docs, "text", lm, 8000).localCheckpoint())
    require(bi.count() > 0, "bigram vocab non-empty")
    val nppl = time("ngramPerplexity")(
      Quality.ngramPerplexity(docs, lm, bi, "doc_id", "text")
        .localCheckpoint())
    require(nppl.count() == n, "one ngram ppl row per doc")
    val loopMax = nppl.filter(col("doc_id") < half)
      .agg(max("ppl")).head.getDouble(0)
    val uniqMin = nppl.filter(col("doc_id") >= half)
      .agg(min("ppl")).head.getDouble(0)
    require(loopMax < uniqMin,
      s"looped ngram ppl $loopMax must sit below the unique floor $uniqMin")

    // --- removeDupLines: a viral boilerplate line in EVERY doc (maximum
    // key skew) excised exactly, unique flanks kept, no row vanishes ---
    val linedDocs = docs.select(col("doc_id"), concat_ws("\n",
      concat(lit("top"), col("doc_id")),
      lit("accept all cookies and subscribe"),
      concat(lit("bot"), col("doc_id"))).as("text"))
    val cleaned = time("removeDupLines")(
      Dedup.removeDupLines(linedDocs, "doc_id", "text").localCheckpoint())
    require(cleaned.count() == n, "every doc survives the rewrite")
    require(cleaned.filter(col("n_removed") =!= 1L).count() == 0,
      "exactly the viral line removed from every doc")
    require(cleaned.filter(col("clean_text").contains("accept")).count() == 0,
      "no boilerplate residue left behind")
    require(cleaned.filter(col("clean_text") =!=
      concat(lit("top"), col("doc_id"), lit("\nbot"), col("doc_id"))).count() == 0,
      "unique flank lines kept in order")

    // --- trigram tier: ngramLm3 one-scan trainer + the tri->bi->uni
    // chain; looped docs are wall-to-wall known trigrams and must sit
    // strictly below the unique docs' double-backed-off scores ---
    val (u3, b3, t3) = time("ngramLm3")(
      Quality.ngramLm3(docs, "text", 4000, 8000, 8000))
    require(t3.count() > 0, "trigram vocab non-empty")
    val tppl = time("trigramPerplexity")(
      Quality.trigramPerplexity(docs, u3, b3, t3, "doc_id", "text")
        .localCheckpoint())
    require(tppl.count() == n, "one trigram ppl row per doc")
    val tLoopMax = tppl.filter(col("doc_id") < half)
      .agg(max("ppl")).head.getDouble(0)
    val tUniqMin = tppl.filter(col("doc_id") >= half)
      .agg(min("ppl")).head.getDouble(0)
    require(tLoopMax < tUniqMin,
      s"looped trigram ppl $tLoopMax must sit below the unique floor $tUniqMin")

    // --- compiled PII scrub: one injected payload per category in every
    // doc — exact counts, exact redaction, at corpus scale ---
    val piiDocs = docs.select(col("doc_id"), concat(col("text"),
      lit(" u"), col("doc_id").cast("string"),
      lit("@x.io 10.0.0.7 +1 415 555 0000")).as("text"))
    val pii = time("piiStats")(
      piiDocs.select(col("doc_id"),
        Quality.piiStats(col("text")).as("p")).localCheckpoint())
    require(pii.count() == n, "one pii row per doc")
    require(pii.filter(col("p.n_email") =!= 1L || col("p.n_ip") =!= 1L ||
      col("p.n_phone") =!= 1L).count() == 0, "exactly one hit per category")
    require(pii.filter(!col("p.scrubbed")
      .endsWith("<EMAIL> <IP> <PHONE>")).count() == 0,
      "payload redacted in order")

    // --- interpolated Kneser–Ney over the same model tables: looped
    // docs are wall-to-wall SEEN pairs (discounted-interpolated, high p)
    // and must sit strictly below the unique docs, whose every pair
    // falls through λ(prev)·Pcont to the OOV continuation floor ---
    val kppl = time("knPerplexity")(
      Quality.knPerplexity(docs, lm, bi, "doc_id", "text")
        .localCheckpoint())
    require(kppl.count() == n, "one KN ppl row per doc")
    val kLoopMax = kppl.filter(col("doc_id") < half)
      .agg(max("ppl")).head.getDouble(0)
    val kUniqMin = kppl.filter(col("doc_id") >= half)
      .agg(min("ppl")).head.getDouble(0)
    require(kLoopMax < kUniqMin,
      s"looped KN ppl $kLoopMax must sit below the unique floor $kUniqMin")

    // --- CCNet buckets + per-bucket sampling: cutoffs placed between
    // the two populations' (structurally separated) perplexity bands →
    // head = exactly the looped half, tail = exactly the unique half,
    // middle empty; the 100/0/10 mix keeps all head + ~10% tail ---
    val t1 = (loopMax + uniqMin) / 2.0
    val t2 = (t1 + uniqMin) / 2.0
    val buckets = time("pplBuckets")(
      Quality.pplBuckets(docs, lm, bi, "doc_id", "text", t1, t2)
        .localCheckpoint())
    val byBucket = buckets.groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(byBucket.getOrElse("head", 0L) == half &&
      byBucket.getOrElse("middle", 0L) == 0L &&
      byBucket.getOrElse("tail", 0L) == n - half,
      s"buckets must split the populations exactly, got $byBucket")
    val mixed = Sampling.mixSample(buckets, "bucket", "doc_id",
      Map("head" -> 100, "tail" -> 10))
    val mixedN = mixed.count()
    require(mixedN > half && mixedN < half + (n - half) / 5,
      s"head kept whole, tail down-sampled: $mixedN of $n")

    // --- temperature quota at scale: 16 equal strata → n^τ equal →
    // exactly total/16 per stratum at any τ; the per-stratum rank
    // window carries ~n/16 rows per task (the training-mix sizing
    // contract) ---
    val tq = time("temperatureQuota")(
      Sampling.temperatureQuota(docs, "strata", "doc_id",
        tau = 0.5, total = 16000L).localCheckpoint())
    val perStratum = tq.groupBy("strata").agg(count(lit(1)).as("c"))
      .agg(countDistinct("c").as("d"), min("c").as("mn")).head
    require(perStratum.getLong(0) == 1L && perStratum.getLong(1) == 1000L,
      "equal strata must draw exactly total/16 each")

    // --- winnowing at scale: the sketch over every doc; docs of the
    // same looped class carry IDENTICAL text → identical fingerprint
    // sets; pairing on a 4-per-class subset (bounded buckets) at a
    // minShared only identical texts reach → exactly the
    // 1000 · C(4,2) same-class pairs ---
    val sk = time("winnowSketch")(
      Dedup.winnowSketch(docs, "doc_id", "text").localCheckpoint())
    require(sk.count() > 0, "sketches non-empty")
    val s5 = sk.filter(col("doc_id") === 5L).select("wh")
      .collect().map(_.getLong(0)).toSet
    val s1005 = sk.filter(col("doc_id") === 1005L).select("wh")
      .collect().map(_.getLong(0)).toSet
    require(s5 == s1005 && s5.nonEmpty,
      "identical texts must sketch identically")
    // pairing on a planted 2 000-doc fixture: each class c carries one
    // pair (c, c+1000) sharing a 60-char passage (≫ k + window − 1 ⇒
    // many guaranteed shared fingerprints); a 29-char boilerplate
    // prefix common to ALL docs must be excised by the
    // over-represented-fingerprint cap, unique tails share nothing
    // the shared passage embeds the class id in EVERY word (each word
    // ≤ 7 chars < k, so every 8-gram spans a boundary and carries the
    // class digits — all passage fingerprints are class-specific and
    // survive any cap ≥ 2), while the boilerplate prefix recurs in all
    // 2 000 docs and must be excised by the over-represented rule
    val cls = (col("id") % 1000).cast("string")
    val pairDocs = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("all docs carry this exact boilerplate prefix"),
        lit(" s"), cls, lit("a s"), cls, lit("b s"), cls,
        lit("c s"), cls, lit("d s"), cls, lit("e s"), cls,
        lit("f s"), cls, lit("g tail"),
        (col("id") * 7919 + 13).cast("string"),
        lit("x"), (col("id") * 104729 + 7).cast("string")).as("text"))
    val wp = time("winnowPairs(2k planted)")(
      Dedup.winnowPairs(pairDocs, "doc_id", "text",
        minShared = 3L).localCheckpoint())
    require(wp.filter(col("doc_b") === col("doc_a") + 1000).count() == 1000L,
      "every planted same-class pair must surface")
    require(wp.filter(col("doc_b") =!= col("doc_a") + 1000).count() == 0L,
      "no cross-class pair may survive the boilerplate cap")

    println(s"[mix] OK docs=$n")
    spark.stop()
  }
}
