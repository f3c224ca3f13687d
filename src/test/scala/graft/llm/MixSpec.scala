package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** Training-mix operators: repetition quality signals, PII scrubbing,
  * deterministic sampling, and greedy sequence packing. */
class MixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = Tables.documents(spark, TestSpark.sfDir)
  import spark.implicits._

  test("repetitionStats: planted fixtures hit the exact Gopher fractions") {
    val fix = Seq(
      1L -> "a a a a",      // 4 tokens, 1 distinct; bigrams: "a a" ×3
      2L -> "a b c d",      // no repetition; 3 distinct bigrams
      3L -> "solo",         // single token → no bigrams
      4L -> "x y x y x"     // bigrams: x y, y x, x y, y x
    ).toDF("doc_id", "text")
    val out = Quality.repetitionStats(fix, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(out(1L) === ((4L, 0.75, 0.666667, 1.0)))
    assert(out(2L) === ((4L, 0.0, 0.0, 0.333333)))
    assert(out(3L) === ((1L, 0.0, 0.0, 0.0)))
    assert(out(4L) === ((5L, 0.6, 0.5, 0.5)))
  }

  test("repetitionStats: every corpus doc emits one row with fractions in [0,1]") {
    val out = Quality.repetitionStats(docs, "doc_id", "text")
    assert(out.count() === docs.count())
    val bad = out.filter(col("dup_word_frac") < 0 || col("dup_word_frac") > 1 ||
      col("dup_bigram_frac") < 0 || col("dup_bigram_frac") > 1 ||
      col("top_bigram_frac") < 0 || col("top_bigram_frac") > 1).count()
    assert(bad === 0L)
  }

  test("repetitionPass: compiled scan filter ≡ thresholded repetitionStats, " +
      "corpus-wide at several thresholds") {
    // the floor and the stats path must share one rounded fixed point:
    // a doc passes iff its published fractions clear the thresholds
    for ((maxW, maxT) <- Seq((0.3, 0.2), (0.6, 0.1), (0.0, 0.0), (0.5, 0.5))) {
      val viaStats = Quality.repetitionStats(docs, "doc_id", "text")
        .filter(col("dup_word_frac") <= maxW && col("top_bigram_frac") <= maxT)
        .select("doc_id")
      val viaPass = docs
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .filter(Quality.repetitionPass(col("text"), maxW, maxT))
        .select("doc_id")
      assert(viaPass.exceptAll(viaStats).count() === 0L,
        s"pass-only docs at ($maxW, $maxT)")
      assert(viaStats.exceptAll(viaPass).count() === 0L,
        s"stats-only docs at ($maxW, $maxT)")
    }
    // boundary: fractions exactly AT the threshold pass (<=, not <)
    val fix = Seq(1L -> "a a b b", 2L -> "a a a b").toDF("doc_id", "text")
    // doc 1: dwf=0.5 tbf=1/3→0.333333; doc 2: dwf=0.5 tbf=2/3→0.666667
    val kept = fix.filter(Quality.repetitionPass(col("text"), 0.5, 0.333333))
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L))
  }

  test("gopherRules: planted defects trip their rules, clean doc passes") {
    val clean = Array.fill(30)("the data").mkString(" ") // 60 words
    val fix = Seq(
      1L -> clean,
      2L -> "the of and",                                   // too short
      3L -> (clean + " ### ### ... ... ... ..."),           // symbol-heavy
      4L -> (0 until 10).map(i => s"- b$i").mkString("\n"), // all bullets
      5L -> "one...\ntwo...\nthree\nfour",                  // ellipsis ends
      6L -> Array.fill(60)("12345").mkString(" "),          // no alpha
      7L -> Array.fill(60)("data").mkString(" ")            // no stop words
    ).toDF("doc_id", "text")
    val out = Quality.gopherRules(fix, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("pass"))
    assert(out(1L).getAs[Long]("n_words") === 60L)
    assert(out(1L).getAs[Double]("mean_word_len") === 3.5)
    assert(out(1L).getAs[Long]("stop_hits") === 30L)
    assert(!out(2L).getAs[Boolean]("pass") &&
      out(2L).getAs[Long]("n_words") === 3L)
    // 6 hashes + 4 ellipses over 66 words ≈ 0.1515 — ONLY the symbol rule
    assert(out(3L).getAs[Double]("symbol_ratio") > 0.1 &&
      !out(3L).getAs[Boolean]("pass"))
    assert(out(3L).getAs[Double]("alpha_word_frac") >= 0.8)
    assert(out(4L).getAs[Double]("bullet_frac") === 1.0)
    assert(out(5L).getAs[Double]("ellipsis_frac") === 0.5)
    assert(out(6L).getAs[Double]("alpha_word_frac") === 0.0 &&
      !out(6L).getAs[Boolean]("pass"))
    assert(out(7L).getAs[Long]("stop_hits") === 0L &&
      !out(7L).getAs[Boolean]("pass"))
    // every corpus doc rows out; thresholds parameterize the flag
    val loose = Quality.gopherRules(docs, "doc_id", "text", minWords = 1,
      minMeanWordLen = 0.0, minAlphaWordFrac = 0.0, minStopHits = 0)
    assert(loose.count() === docs.count())
    assert(loose.filter(!col("pass")).count() === 0L,
      "fully loosened thresholds must pass everything")
  }

  test("bigramLm + ngramPerplexity: hand-computed stupid-backoff scores; " +
      "empty bigram table at backoff 1.0 ≡ lmPerplexity") {
    val ref = Seq(1L -> "the cat sat", 2L -> "the cat ran")
      .toDF("doc_id", "text")
    val uni = Quality.unigramLm(ref, "text", 10)
    // unigram counts: the=2, cat=2, sat=1, ran=1 → N=6, V=4
    val bi = Quality.bigramLm(ref, "text", uni, 10)
    // bigrams: (the,cat)=2, (cat,sat)=1, (cat,ran)=1; every w1 in vocab
    assert(bi.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3)))).toMap ===
      Map(("the", "cat") -> ((2L, 2L)), ("cat", "sat") -> ((1L, 2L)),
        ("cat", "ran") -> ((1L, 2L))))
    // bigram vocab cap prunes deterministically: top-1 is the cnt-2 pair
    assert(Quality.bigramLm(ref, "text", uni, 1).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("the", "cat")))
    // score "the cat zeb": t1 = smoothed uni(the) = 3/11; t2 = known
    // bigram cat|the = 2/2; t3 = backoff 0.4 * smoothed uni(zeb) = 0.4/11
    val score = Seq(7L -> "the cat zeb").toDF("doc_id", "text")
    val out = Quality.ngramPerplexity(score, uni, bi, "doc_id", "text")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def lp6(p: Double) = math.round(math.log(p) * 1e6)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def meanNll(n: Long, lps: Long*) = {
      val p6 = -lps.sum
      ((p6 * 2 + n) / (2 * n)).toDouble / 1e6
    }
    val nll7 = meanNll(3, lp6(3.0 / 11), lp6(2.0 / 2), lp6(0.4 / 11))
    assert(out(7L) === ((3L, r6(nll7), r6(math.exp(nll7)))))
    // fallback path ≡ the unigram model: empty bigram table + backoff 1
    val spark2 = spark
    import spark2.implicits._
    val emptyBi = Seq.empty[(String, String, Long, Long)]
      .toDF("w1", "w2", "cnt", "w1_cnt")
    val lm16 = Quality.unigramLm(docs, "text", 16)
    val viaN = Quality.ngramPerplexity(docs, lm16, emptyBi,
      "doc_id", "text", backoff = 1.0)
    val viaU = Quality.lmPerplexity(docs, lm16, "doc_id", "text")
    assert(viaN.exceptAll(viaU).count() === 0L &&
      viaU.exceptAll(viaN).count() === 0L,
      "ngram with no bigrams and backoff 1.0 must equal the unigram scorer")
  }

  test("unigramLm + lmPerplexity: hand-computed smoothed scores, OOV floor, vocab pruning tie-break") {
    val ref = Seq(1L -> "the cat sat", 2L -> "the dog sat").toDF("doc_id", "text")
    // counts: the=2, sat=2, cat=1, dog=1 → N=6, V=4 when vocab keeps all
    val lm = Quality.unigramLm(ref, "text", 10)
    assert(lm.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("the" -> 2L, "sat" -> 2L, "cat" -> 1L, "dog" -> 1L))
    // vocab=2 prunes to the two cnt-2 tokens; ties break token-ascending
    assert(Quality.unigramLm(ref, "text", 2).collect()
      .map(_.getString(0)).toSet === Set("sat", "the"))
    // p(the)=3/11, p(cat)=2/11, p(OOV)=1/11 (Laplace over N=6, V=4);
    // replay the micro-nat fixed-pointing exactly
    val score = Seq(7L -> "the cat", 8L -> "zebra zebra")
      .toDF("doc_id", "text")
    val out = Quality.lmPerplexity(score, lm, "doc_id", "text").collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def lp6(p: Double) = math.round(math.log(p) * 1e6)
    // mirror Spark's Round (HALF_UP over BigDecimal), not rint's half-even
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the engine's integer half-up mean in micro-nats
    def meanNll(n: Long, lps: Long*) = {
      val p6 = -lps.sum
      ((p6 * 2 + n) / (2 * n)).toDouble / 1e6
    }
    val nll7 = meanNll(2, lp6(3.0 / 11), lp6(2.0 / 11))
    assert(out(7L) === ((2L, r6(nll7), r6(math.exp(nll7)))))
    val nll8 = meanNll(2, lp6(1.0 / 11), lp6(1.0 / 11))
    assert(out(8L) === ((2L, r6(nll8), r6(math.exp(nll8)))))
    assert(out(8L)._3 > out(7L)._3, "all-OOV text must score higher ppl")
    // corpus-level sanity: every doc rows out, ppl finite and positive
    val corp = Quality.lmPerplexity(docs,
      Quality.unigramLm(docs, "text", 16), "doc_id", "text")
    assert(corp.count() === docs.count())
    assert(corp.filter(col("ppl") <= 0.0 || isnan(col("ppl")) ||
      col("nll") <= 0.0).count() === 0L)
  }

  test("lmLogRatio: hand-computed DSIR weights, identical models give zero, every doc scored") {
    val tgtRef = Seq(1L -> "alpha beta alpha").toDF("doc_id", "text")
    val srcRef = Seq(1L -> "gamma delta gamma delta").toDF("doc_id", "text")
    val tgt = Quality.unigramLm(tgtRef, "text", 8) // alpha=2, beta=1; N=3, V=2
    val src = Quality.unigramLm(srcRef, "text", 8) // gamma=2, delta=2; N=4, V=2
    val out = Quality.lmLogRatio(
        Seq(7L -> "alpha gamma").toDF("doc_id", "text"),
        tgt, src, "doc_id", "text").collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def lp6(p: Double) = math.round(math.log(p) * 1e6)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // alpha: tgt ln(3/6) vs src OOV ln(1/7); gamma: tgt OOV ln(1/6) vs ln(3/7)
    val s6 = (lp6(3.0 / 6) - lp6(1.0 / 7)) + (lp6(1.0 / 6) - lp6(3.0 / 7))
    // signed integer half-away-from-zero mean (the engine's tree)
    val m6 = if (s6 < 0) -((-s6 * 2 + 2) / 4) else (s6 * 2 + 2) / 4
    assert(out(7L) === ((2L, r6(s6 / 1e6), r6(m6.toDouble / 1e6))))
    // target ≡ source → the ratio is EXACTLY zero for every doc
    val lm = Quality.unigramLm(docs, "text", 16)
    val self = Quality.lmLogRatio(docs, lm, lm, "doc_id", "text")
    assert(self.count() === docs.count())
    assert(self.filter(col("log_ratio") =!= 0.0 ||
      col("log_ratio_mean") =!= 0.0).count() === 0L)
  }

  test("scrubPii: redacts email, IPv4, phone; leaves near-misses intact") {
    val fix = Seq(
      (1L, "reach me at bob@x.io or 1.2.3.4 or +44 207 946 0958 now"),
      (2L, "version v1.2.3.4567 is not an ip and a@b is not an email"),
      (3L, "two mails x@y.com z@w.org one ip 10.0.0.1")
    ).toDF("doc_id", "text")
    val out = fix.select(col("doc_id"), Quality.scrubPii(col("text")).as("t"),
        Quality.piiCount(col("text"), Quality.EmailRe).as("ne"),
        Quality.piiCount(col("text"), Quality.Ipv4Re).as("ni"),
        Quality.piiCount(col("text"), Quality.PhoneRe).as("np"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === (("reach me at <EMAIL> or <IP> or <PHONE> now", 1L, 1L, 1L)))
    // \b keeps the 4567 run from matching as an IP; a@b has no TLD
    assert(out(2L) === (("version v1.2.3.4567 is not an ip and a@b is not an email",
      0L, 0L, 0L)))
    assert(out(3L) === (("two mails <EMAIL> <EMAIL> one ip <IP>", 2L, 1L, 0L)))
  }

  test("hashSample: deterministic, monotone in pct, exact at the extremes") {
    val ids = (pct: Int) => Sampling.hashSample(docs, "doc_id", pct)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s37a = ids(37); val s37b = ids(37)
    assert(s37a === s37b, "content-addressed draw must be reproducible")
    assert(ids(0).isEmpty)
    assert(ids(100).size === docs.count())
    assert(s37a.subsetOf(ids(60)), "raising pct only adds rows")
    // repartitioning must not change the sample (row-local decision)
    val rep = Sampling.hashSample(docs.repartition(17), "doc_id", 37)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rep === s37a)
  }

  test("stratifiedQuota: min(k, |stratum|) rows per stratum, ranks 1..m, md5 order") {
    val k = 7
    val out = Sampling.stratifiedQuota(docs, Seq("lang", "source"), "doc_id", k)
      .select("lang", "source", "doc_id", "rk").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getInt(3))))
      .groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2).sortBy(_._2) }
    val sizes = docs.groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.keySet === sizes.keySet.filter(sizes(_) > 0))
    out.foreach { case (s, rows) =>
      assert(rows.length === math.min(k.toLong, sizes(s)).toInt, s"stratum $s")
      assert(rows.map(_._2).toSeq === (1 to rows.length), s"ranks in $s")
      // selected ids are the k smallest by (md5(id), id)
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(id: Long) = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want = docs.filter(col("lang") === s._1 && col("source") === s._2)
        .select("doc_id").collect().map(_.getLong(0))
        .sortBy(id => (h(id), id)).take(rows.length).toSet
      assert(rows.map(_._1).toSet === want, s"md5 order in $s")
    }
  }

  test("packGreedy equals the sequential reference fold; budget respected") {
    val budget = 64L
    val out = Sampling.packGreedy(docs, "doc_id", "text", "lang", budget, 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    // reference: per (strata, shard) in doc_id order, plain fold
    val src = docs.select(col("lang"), col("doc_id"),
        TextStats.tokenCount(col("text")).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ref = src.groupBy(t => (t._1, (t._2 % 4).toInt)).toSeq.flatMap {
      case ((strata, shard), rows) =>
        var fill = 0L; var bin = -1L
        rows.sortBy(_._2).map { case (_, id, n) =>
          if (bin < 0 || fill + n > budget) { bin += 1; fill = n }
          else fill += n
          id -> ((strata, shard, n, bin))
        }.toSeq
    }.toMap
    assert(out === ref)
    // no multi-doc bin exceeds the budget; oversized docs sit alone
    val byBin = out.toSeq.groupBy { case (_, (s, sh, _, b)) => (s, sh, b) }
    byBin.foreach { case (key, members) =>
      val tot = members.map(_._2._3).sum
      if (members.size > 1)
        assert(tot <= budget, s"bin $key holds $tot tokens across ${members.size} docs")
    }
  }

  test("Corpus.prepare repetition floor: drops looping docs, defaults change nothing") {
    val stops = Seq("the", "a")
    val markers = Seq("en" -> Seq("the"))
    val fix = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "spam spam spam spam spam spam",         // dup_word 5/6
      3L -> "one two three four five six seven eight" // clean
    ).toDF("doc_id", "text")
    val floored = Corpus.prepare(fix, "doc_id", "text", stops, markers,
        0.0, Seq("en"), maxDupWordFrac = 0.5, maxTopBigramFrac = 0.5)
      .select("rep_id").collect().map(_.getLong(0)).toSet
    assert(floored === Set(1L, 3L), "looping doc dropped, clean docs kept")
    // thresholds at 1.0 take the no-op branch: identical to the unfloored
    // composition on the real corpus
    val plain = Corpus.prepare(docs, "doc_id", "text", stops, markers,
      0.5, Seq("en")).collect().map(_.toSeq).toSet
    val noop = Corpus.prepare(docs, "doc_id", "text", stops, markers,
      0.5, Seq("en"), maxDupWordFrac = 1.0, maxTopBigramFrac = 1.0)
      .collect().map(_.toSeq).toSet
    assert(plain === noop)
    // an active floor ≡ manually anti-joining the over-threshold docs
    // out first, then running the unfloored composition
    val strict = Corpus.prepare(docs, "doc_id", "text", stops, markers,
      0.5, Seq("en"), maxDupWordFrac = 0.6, maxTopBigramFrac = 0.1)
      .collect().map(_.toSeq).toSet
    val drops = Quality.repetitionStats(docs, "doc_id", "text")
      .filter(col("dup_word_frac") > 0.6 || col("top_bigram_frac") > 0.1)
      .select("doc_id")
    assert(drops.count() > 0, "fixture corpus must trip the floor")
    val manual = Corpus.prepare(docs.join(drops, Seq("doc_id"), "left_anti"),
        "doc_id", "text", stops, markers, 0.5, Seq("en"))
      .collect().map(_.toSeq).toSet
    assert(strict === manual)
  }

  test("Corpus.prepare perplexity floor: high-ppl docs drop, ≡ manual anti-join, arg validation") {
    val stops = Seq("the", "a")
    val markers = Seq("en" -> Seq("the"))
    // reference LM over the corpus itself: median-ish ppl splits it
    val lm = Quality.unigramLm(docs, "text", 16)
    val scored = Quality.lmPerplexity(docs, lm, "doc_id", "text")
    val cut = scored.agg(avg(col("ppl"))).head.getDouble(0)
    val drops = scored.filter(col("ppl") > cut).select("doc_id")
    assert(drops.count() > 0, "fixture corpus must trip the floor")
    val floored = Corpus.prepare(docs, "doc_id", "text", stops, markers,
        0.0, Seq("en"), lm = Some(lm), maxPpl = cut)
      .collect().map(_.toSeq).toSet
    val manual = Corpus.prepare(docs.join(drops, Seq("doc_id"), "left_anti"),
        "doc_id", "text", stops, markers, 0.0, Seq("en"))
      .collect().map(_.toSeq).toSet
    assert(floored === manual)
    // defaults take the no-op branch
    val plain = Corpus.prepare(docs, "doc_id", "text", stops, markers,
      0.0, Seq("en")).collect().map(_.toSeq).toSet
    assert(plain === Corpus.prepare(docs, "doc_id", "text", stops, markers,
      0.0, Seq("en"), lm = None).collect().map(_.toSeq).toSet)
    assert(plain !== floored, "the floor must change the result here")
    // a model without a threshold must refuse loudly
    val err = intercept[IllegalArgumentException] {
      Corpus.prepare(docs, "doc_id", "text", stops, markers,
        0.0, Seq("en"), lm = Some(lm))
    }
    assert(err.getMessage.contains("maxPpl"))
  }

  test("contaminationStats: planted overlap flagged, short and clean docs zero, hashed ≡ string") {
    val bench = Seq(100L -> "alpha beta gamma delta epsilon zeta").toDF("doc_id", "text")
    val corpus = Seq(
      1L -> "intro words then alpha beta gamma delta epsilon closing",
      2L -> "totally unrelated content with no overlap at all",
      3L -> "too short"
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationStats(corpus, bench, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1 has 5 distinct 5-shingles; exactly "alpha beta gamma delta
    // epsilon" is also a bench shingle
    assert(out(1L) === ((5L, 1L, 0.2)))
    assert(out(2L)._2 === 0L)
    assert(out(3L) === ((0L, 0L, 0.0)), "short doc present with zero shingles")
    // hashed scale path ≡ string-keyed oracle path on the real corpus
    val c = docs.filter(col("source") =!= "src0")
    val b = docs.filter(col("source") === "src0")
    val hashed = Dedup.contaminationStats(c, b, "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val strKeyed = Dedup.contaminationStats(c, b, "doc_id", "text", 5,
        hashShingles = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hashed === strKeyed)
    assert(hashed.exists(_._3 > 0L), "fixture corpus must contain contamination")
  }

  test("shuffleShards: valid permutation, reproducible, salt re-shuffles") {
    val a = Sampling.shuffleShards(docs, "doc_id", 8, "ep1")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.length.toLong === docs.count())
    // (shard, pos) is a dense 1..m numbering per shard
    a.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length.toLong).toSeq, s"shard $sh")
    }
    // byte-reproducible across partitionings
    val b = Sampling.shuffleShards(docs.repartition(13), "doc_id", 8, "ep1")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSet === b.toSet)
    // a different salt produces a different training order
    val c = Sampling.shuffleShards(docs, "doc_id", 8, "ep2")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSet !== c.toSet)
    // and the order is not the identity (content-addressed, not by id)
    val byPos = a.filter(_._2 == a.head._2).sortBy(_._3).map(_._1)
    assert(byPos.toSeq !== byPos.sorted.toSeq)
  }

  test("packGreedy: oversized document overflows its own bin only") {
    val fix = Seq(
      (1L, "en", ("w " * 100).trim),   // 100 tokens > budget 10
      (5L, "en", "a b c"),             // overflows bin 0 → bin 1
      (9L, "en", "d e f g h i j k")    // 8 tokens: 3+8 > 10 → bin 2
    ).toDF("doc_id", "lang", "text")   // all ids ≡ 1 mod 4: one shard
    val out = Sampling.packGreedy(fix, "doc_id", "text", "lang", 10L, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out(1L) === 0L, "oversized doc occupies (and overflows) bin 0 alone")
    assert(out(5L) === 1L, "next doc never joins an already-overflowed bin")
    assert(out(9L) === 2L, "doc that would overflow starts a new bin")
  }

  test("mixSample: per-stratum rates — extremes exact, listed rate ≡ hashSample of the stratum, nested across rates, repartition-invariant") {
    val m = docs.select(col("doc_id"), col("source"))
    val kept = Sampling.mixSample(m, "source", "doc_id",
      Map("src0" -> 100, "src1" -> 0, "src2" -> 40), defaultPct = 25)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    // extremes: 100% keeps the whole stratum, 0% keeps nothing
    val src0 = m.filter(col("source") === "src0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(src0.subsetOf(keptIds))
    assert(kept.filter(col("source") === "src1").count() === 0L)
    // a listed stratum's slice IS hashSample at its rate on that stratum
    val viaHash = Sampling.hashSample(
        m.filter(col("source") === "src2"), "doc_id", 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.filter(col("source") === "src2").select("doc_id")
      .collect().map(_.getLong(0)).toSet === viaHash)
    // unlisted strata draw at the default rate
    val viaDefault = Sampling.hashSample(
        m.filter(col("source") === "src5"), "doc_id", 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.filter(col("source") === "src5").select("doc_id")
      .collect().map(_.getLong(0)).toSet === viaDefault)
    // nested: tightening a rate selects a subset, never a reshuffle
    val tighter = Sampling.mixSample(m, "source", "doc_id",
        Map("src0" -> 100, "src1" -> 0, "src2" -> 10), defaultPct = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tighter.subsetOf(keptIds))
    // row-local: the sample ignores physical layout
    val reparted = Sampling.mixSample(m.repartition(13), "source", "doc_id",
        Map("src0" -> 100, "src1" -> 0, "src2" -> 40), defaultPct = 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reparted === keptIds)
    intercept[IllegalArgumentException] {
      Sampling.mixSample(m, "source", "doc_id", Map("src0" -> 101))
    }
  }

  test("mixQuota: per-stratum quotas round(w·total), undershoot on scarce strata, unlisted drop, rk consecutive") {
    val fix = (1L to 6L).map(i => (i, "x")) ++ Seq((7L, "y")) ++
      (8L to 10L).map(i => (i, "z"))
    val df = fix.toDF("doc_id", "source")
    val out = Sampling.mixQuota(df, "source", "doc_id",
      Map("x" -> 0.5, "y" -> 0.25), total = 8L)
    val byStrata = out.collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    // x: quota round(0.5·8) = 4 of its 6 rows — the SAME 4 stratifiedQuota picks
    val viaQuota = Sampling.stratifiedQuota(
        df.filter(col("source") === "x"), Seq("source"), "doc_id", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byStrata("x") === viaQuota)
    // y: quota 2 but only 1 row — keeps all (no cross-stratum rebalance)
    assert(byStrata("y") === Set(7L))
    // z: unlisted → quota 0
    assert(!byStrata.contains("z"))
    // rk is the within-stratum md5 rank, consecutive from 1
    val rks = out.filter(col("source") === "x").select("rk")
      .collect().map(_.getLong(0)).sorted
    assert(rks.toSeq === (1L to 4L))
    intercept[IllegalArgumentException] {
      Sampling.mixQuota(df.withColumn("rk", lit(1)), "source", "doc_id",
        Map("x" -> 0.5), 4L)
    }
  }

  test("Corpus.prepare normalize: transport noise no longer splits dup groups; flag ≡ manual pre-normalization; default unchanged") {
    val stops = Seq("the", "a")
    val markers = Seq("en" -> Seq("the"))
    // the same content three ways a crawler delivers it: LF, CRLF +
    // trailing blank, tab-indented — one distinct doc without
    // normalization is three
    val fix = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the mat \r\n",
      3L -> "\tthe cat sat on\tthe mat",
      9L -> "the dog ran off the lot"
    ).toDF("doc_id", "text")
    val plain = Corpus.prepare(fix, "doc_id", "text", stops, markers,
      0.0, Seq("en"))
    assert(plain.count() === 4L, "unnormalized: noise splits the group")
    val norm = Corpus.prepare(fix, "doc_id", "text", stops, markers,
      0.0, Seq("en"), normalize = true)
    val reps = norm.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps === Map(1L -> 3L, 9L -> 1L),
      "normalized: the three deliveries collapse to min id 1 with 3 copies")
    // flag ≡ running the unflagged composition over pre-normalized text
    val manual = Corpus.prepare(
        docs.withColumn("text", Quality.normalizeText(col("text"))),
        "doc_id", "text", stops, markers, 0.5, Seq("en"),
        maxDupWordFrac = 0.6, maxTopBigramFrac = 0.1)
      .collect().map(_.toSeq).toSet
    val flagged = Corpus.prepare(docs, "doc_id", "text", stops, markers,
        0.5, Seq("en"), maxDupWordFrac = 0.6, maxTopBigramFrac = 0.1,
        normalize = true)
      .collect().map(_.toSeq).toSet
    assert(flagged === manual)
    // default false is bit-identical to the pre-flag composition
    val d1 = Corpus.prepare(docs, "doc_id", "text", stops, markers,
      0.5, Seq("en")).collect().map(_.toSeq).toSet
    val d2 = Corpus.prepare(docs, "doc_id", "text", stops, markers,
      0.5, Seq("en"), normalize = false).collect().map(_.toSeq).toSet
    assert(d1 === d2)
  }

  test("Corpus.prepare semantic floor: ≡ manual semDedupDropped anti-join; embedding-less docs pass; arg validation") {
    val stops = Seq("the", "a")
    val markers = Seq("en" -> Seq("the"))
    val e = Tables.embeddings(spark, graft.TestSpark.sfDir)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
    val floored = Corpus.prepare(docs, "doc_id", "text", stops, markers,
        0.5, Seq("en"), embeddings = Some(e), semCentroids = Some(cents),
        semMinCos = 0.35)
      .collect().map(_.toSeq).toSet
    val dropped = Similarity.semDedupDropped(e, cents, "vec_id",
      "embedding", 0.35).select(col("_drop").as("doc_id"))
    assert(dropped.count() > 0, "corpus must hold semantic dups at 0.35")
    val manual = Corpus.prepare(docs.join(dropped, Seq("doc_id"), "left_anti"),
        "doc_id", "text", stops, markers, 0.5, Seq("en"))
      .collect().map(_.toSeq).toSet
    assert(floored === manual)
    // a doc with NO embedding row is unscorable and must survive the floor
    val extra = Seq((990001L, "the extra doc with no embedding the"))
      .toDF("doc_id", "text")
    val withExtra = Corpus.prepare(
        docs.select("doc_id", "text").unionByName(extra), "doc_id", "text",
        stops, markers, 0.0, Seq("en"), embeddings = Some(e),
        semCentroids = Some(cents), semMinCos = 0.35)
      .select("rep_id").collect().map(_.getLong(0)).toSet
    assert(withExtra.contains(990001L))
    intercept[IllegalArgumentException] {
      Corpus.prepare(docs, "doc_id", "text", stops, markers, 0.5, Seq("en"),
        embeddings = Some(e))
    }
    intercept[IllegalArgumentException] {
      Corpus.prepare(docs, "doc_id", "text", stops, markers, 0.5, Seq("en"),
        embeddings = Some(e), semCentroids = Some(cents))
    }
  }

  test("normalizeText: control bytes strip without splitting words, whitespace zoo collapses, edges trim, lowercase flag, idempotent") {
    val fix = Seq(
      (1L, "a\u0000b c"),               // NUL mid-word joins halves: "ab c"
      (2L, "x\t\ty\r\nz\u000B w"),      // tab/CRLF/VT runs → single spaces
      (3L, "  padded  \f "),            // edge runs trim entirely
      (4L, "MiXeD Case"),
      (5L, "\u0007\u001F\u007F")        // control-only → empty string
    ).toDF("doc_id", "text")
    val out = fix.select(col("doc_id"),
        Quality.normalizeText(col("text")).as("n"),
        Quality.normalizeText(col("text"), lowercase = true).as("nl"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L)._1 === "ab c")
    assert(out(2L)._1 === "x y z w")
    assert(out(3L)._1 === "padded")
    assert(out(4L)._1 === "MiXeD Case")
    assert(out(4L)._2 === "mixed case")
    assert(out(5L)._1 === "")
    // idempotent: normalizing a normalized corpus is the identity
    val once = docs.select(col("doc_id"),
      Quality.normalizeText(col("text")).as("n"))
    val diff = once.select(col("doc_id"),
        Quality.normalizeText(col("n")).as("n2"), col("n"))
      .filter(col("n2") =!= col("n")).count()
    assert(diff === 0L)
  }

  test("chunkDocs: exact boundaries, overlap stride, short-doc identity, zero-overlap reassembly") {
    val fix = Seq(
      1L -> "a b c d e f g h",  // 8 tokens
      2L -> "x y",              // shorter than maxTokens
      3L -> "p q r s t"         // 5 tokens, uneven tail
    ).toDF("doc_id", "text")
    // maxTokens = 4, overlap = 2 → stride 2: doc 1 starts 1,3,5 (a start
    // at 7 would be fully contained in the 5..8 chunk and is not emitted)
    val out = Sampling.chunkDocs(fix, "doc_id", "text", 4, 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getString(3))))
      .toMap
    assert(out((1L, 0L)) === ((4L, "a b c d")))
    assert(out((1L, 1L)) === ((4L, "c d e f")))
    assert(out((1L, 2L)) === ((4L, "e f g h")))
    assert(out((2L, 0L)) === ((2L, "x y")))
    assert(out((3L, 0L)) === ((4L, "p q r s")))
    assert(out((3L, 1L)) === ((3L, "r s t")))
    assert(out.size === 3 + 1 + 2)
    // zero overlap partitions the stream: chunks re-concatenate exactly
    val zero = Sampling.chunkDocs(docs, "doc_id", "text", 32, 0)
    assert(zero.filter(col("n_tokens") > 32).count() === 0L)
    val rebuilt = zero.groupBy("doc_id")
      .agg(concat_ws(" ", sort_array(collect_list(
        struct(col("chunk_id"), col("chunk_text")))).getField("chunk_text"))
        .as("re"))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(col("re") =!= col("text")).count()
    assert(rebuilt === 0L, "overlap=0 chunks must reassemble the text")
    intercept[IllegalArgumentException] {
      Sampling.chunkDocs(fix, "doc_id", "text", 4, 4)
    }
  }

  test("Corpus.prepare gopher floor: rule failures drop, ≡ manual anti-join, default off") {
    val stops = Seq("the", "a")
    val markers = Seq("en" -> Seq("the"))
    val drops = Quality.gopherRules(docs, "doc_id", "text")
      .filter(!col("pass")).select("doc_id")
    assert(drops.count() > 0, "fixture corpus must trip at least one rule")
    val floored = Corpus.prepare(docs, "doc_id", "text", stops, markers,
        0.0, Seq("en"), gopher = true)
      .collect().map(_.toSeq).toSet
    val manual = Corpus.prepare(docs.join(drops, Seq("doc_id"), "left_anti"),
        "doc_id", "text", stops, markers, 0.0, Seq("en"))
      .collect().map(_.toSeq).toSet
    assert(floored === manual)
    val plain = Corpus.prepare(docs, "doc_id", "text", stops, markers,
      0.0, Seq("en")).collect().map(_.toSeq).toSet
    assert(plain !== floored, "the floor must change the result here")
  }

  test("Corpus.prepare decontamination: contaminated docs drop, ≡ manual anti-join, validation") {
    val stops = Seq("the", "a")
    val markers = Seq("en" -> Seq("the"))
    val corpus = docs.filter(col("source") =!= "src0")
    val bench = docs.filter(col("source") === "src0")
    val drops = Dedup.contaminationStats(corpus, bench, "doc_id", "text", 5)
      .filter(col("contam_frac") > 0.05).select("doc_id")
    assert(drops.count() > 0, "fixture corpus must contain contaminated docs")
    val floored = Corpus.prepare(corpus, "doc_id", "text", stops, markers,
        0.0, Seq("en"), benchDocs = Some(bench), contamN = 5,
        maxContamFrac = 0.05)
      .collect().map(_.toSeq).toSet
    val manual = Corpus.prepare(corpus.join(drops, Seq("doc_id"), "left_anti"),
        "doc_id", "text", stops, markers, 0.0, Seq("en"))
      .collect().map(_.toSeq).toSet
    assert(floored === manual)
    // hashed ≡ string-keyed shingles on real data (the d9/d16 pin)
    val strKeyed = Corpus.prepare(corpus, "doc_id", "text", stops, markers,
        0.0, Seq("en"), benchDocs = Some(bench), contamN = 5,
        maxContamFrac = 0.05, contamHash = false)
      .collect().map(_.toSeq).toSet
    assert(strKeyed === floored)
    // a bench set without a threshold must refuse loudly
    val err = intercept[IllegalArgumentException] {
      Corpus.prepare(corpus, "doc_id", "text", stops, markers,
        0.0, Seq("en"), benchDocs = Some(bench))
    }
    assert(err.getMessage.contains("maxContamFrac"))
  }

  test("canonicalizeUrl / registrableDomain: hand-built URL zoo") {
    val fix = Seq(
      (1L, "  HTTPS://WWW.News.Example.COM:443/A/b?Q=1#frag  "),
      (2L, "http://example.com:80/"),
      (3L, "http://example.com:8080/x"),
      (4L, "https://sub.shop.example.CO.UK/p"),
      (5L, "ftp://Files.Example.org:21/pub"),
      (6L, "www.bare-host.com/path?x=1"),
      (7L, "http://192.168.0.1:8080/admin"),
      (8L, "localhost")).toDF("doc_id", "url")
    val out = fix.select(col("doc_id"),
        Quality.canonicalizeUrl(col("url")).as("c"),
        Quality.registrableDomain(col("url")).as("d"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    // fragment gone, scheme+host lowered, www./default port stripped,
    // path case kept
    assert(out(1L) === (("https://news.example.com/A/b?Q=1",
      "example.com")))
    // bare-"/" path collapses; default port strips
    assert(out(2L) === (("http://example.com", "example.com")))
    // NON-default port survives canonicalization but not the domain key
    assert(out(3L) === (("http://example.com:8080/x", "example.com")))
    // registry suffix: the registrable domain is suffix + ONE label
    assert(out(4L)._2 === "example.co.uk")
    // non-http scheme: port is not a default, stays
    assert(out(5L) === (("ftp://files.example.org:21/pub", "example.org")))
    // schemeless: lowercased pass-through; host = up to the first /
    assert(out(6L) === (("www.bare-host.com/path?x=1", "bare-host.com")))
    // IPv4 host passes through whole
    assert(out(7L)._2 === "192.168.0.1")
    assert(out(8L) === (("localhost", "localhost")))
    // canonicalization is idempotent
    val twice = fix.select(Quality.canonicalizeUrl(
        Quality.canonicalizeUrl(col("url"))).as("c2"),
      Quality.canonicalizeUrl(col("url")).as("c1"))
      .filter(col("c1") =!= col("c2")).count()
    assert(twice === 0L)
  }

  test("domainStats + domain mix: aggregate feeds mixQuota strata") {
    val d = docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .withColumn("url", concat(lit("https://www."), col("source"),
        lit("-site.com/d/"), col("doc_id")))
    val stats = Quality.domainStats(d, "doc_id", "url", "text",
      Seq("the", "a", "of", "and", "to"))
    val byDom = stats.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySource = d.groupBy("source").count().collect()
      .map(r => s"${r.getString(0)}-site.com" -> r.getLong(1)).toMap
    assert(byDom === bySource,
      "domain doc counts must equal source counts under the 1:1 url map")
    // the aggregate's domains ARE the mix strata: quota two domains
    val strata = d.withColumn("domain",
      Quality.registrableDomain(col("url")))
    val picks = Sampling.mixQuota(strata, "domain", "doc_id",
      Map(byDom.keySet.toSeq.sorted.take(2).map(_ -> 0.5): _*), 40)
    val got = picks.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byDom.keySet.toSeq.sorted.take(2).foreach { dom =>
      assert(got.getOrElse(dom, 0L) === math.min(20L, byDom(dom)),
        s"domain $dom quota")
    }
  }
}
