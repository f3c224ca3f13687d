package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition and compliance quality signals for training-data curation —
  * the Gopher-style "fraction of the document that is self-repetition"
  * family plus PII scrubbing. Complements [[TextStats]] (per-row column
  * math) with the one signal that needs an aggregation (top-n-gram
  * fraction) expressed in the scale shape: explode → (doc, gram) count →
  * per-doc agg, all partial-aggregation-friendly keys that contain the
  * doc id, so no gram — however viral across the corpus — ever
  * concentrates rows on one task (repetition is WITHIN a document;
  * corpus-level span duplication is [[Dedup.spanDupStats]]'s job).
  */
object Quality {

  /** Per-document repetition statistics (the shape of the Gopher/
    * MassiveText repetition filters: duplicate-word fraction, duplicate
    * n-gram fraction, and the most-frequent-n-gram fraction):
    *
    *   - `dup_word_frac`   = (n_tokens − n_distinct_tokens) / n_tokens
    *   - `dup_bigram_frac` = (n_bigrams − n_distinct_bigrams) / n_bigrams
    *   - `top_bigram_frac` = occurrences of the most frequent bigram
    *                         / n_bigrams
    *
    * Tokens are `' '`-split ([[TextStats.tokenCount]] semantics). A
    * document with fewer than two tokens has no bigrams; its bigram
    * fractions are 0.0. Fractions round to 6 decimals.
    *
    * Every statistic here is DOC-LOCAL, so this is a ZERO-SHUFFLE scan:
    * one compiled pass per row ([[graft.expressions.RepetitionCounts]] —
    * exact interned-token counting, no hashing) tallies tokens, distinct
    * tokens, and the bigram histogram; the fraction algebra stays in
    * column math (Spark `round` semantics unchanged, so oracles hash
    * identically). The earlier declarative form exploded bigrams through
    * a corpus-TOKEN-scale (doc_id, bigram) exchange plus a doc_id join —
    * measured 7× slower at sf1 and the wrong 100 TB shape (the same
    * anti-pattern [[scoreTextClassifier]] eliminated).
    *
    * Output: (doc_id, n_tokens, dup_word_frac, dup_bigram_frac,
    * top_bigram_frac), one row per input ROW with a non-null id and
    * text (ids are expected unique per the corpus contract; duplicate-id
    * rows each score their own text). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val r = graft.functions.Cols.repetitionCounts(split(col(textCol), " "))
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), r.as("_r"))
      .select(col("doc_id"),
        col("_r.n_tokens").as("n_tokens"),
        round((col("_r.n_tokens") - col("_r.n_distinct_tokens"))
            .cast("double") / col("_r.n_tokens").cast("double"), 6)
          .as("dup_word_frac"),
        // explicit zero-bigram guard: the old left-join form yielded NULL
        // here (coalesce → 0.0); double 0/0 would yield NaN instead
        when(col("_r.n_bigrams") === 0, lit(0.0))
          .otherwise(round(
            (col("_r.n_bigrams") - col("_r.n_distinct_bigrams"))
              .cast("double") / col("_r.n_bigrams").cast("double"), 6))
          .as("dup_bigram_frac"),
        when(col("_r.n_bigrams") === 0, lit(0.0))
          .otherwise(round(col("_r.top_bigram_cnt").cast("double") /
            col("_r.n_bigrams").cast("double"), 6))
          .as("top_bigram_frac"))
  }

  /** The repetition floor as a single compiled boolean column — the
    * `gopherPass` shape for composing into `Corpus.prepare` and ingest
    * as a TRUE scan filter (no drop list, no join, no second derivation
    * of the stats): a doc passes iff its rounded dup_word_frac ≤
    * `maxDupWordFrac` AND top_bigram_frac ≤ `maxTopBigramFrac`, the
    * identical rounded fixed point [[repetitionStats]] publishes
    * (spec-pinned equal). Null (≡ drop under `filter`) on null text —
    * callers pass null-id/text rows through explicitly, as with
    * [[gopherPass]]. */
  def repetitionPass(text: Column, maxDupWordFrac: Double,
      maxTopBigramFrac: Double): Column =
    graft.functions.Cols.repetitionPass(split(text, " "),
      maxDupWordFrac, maxTopBigramFrac)

  /** PII patterns — deliberately alternation-free (character classes +
    * quantifiers only) so leftmost-greedy (Java) and leftmost-Perl (RE2)
    * engines match identically, which a SQL oracle replay relies on. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Fixed-shape international phone: +C[C] NNN NNN NNNN. */
  val PhoneRe = "\\+\\d{1,2} \\d{3} \\d{3} \\d{4}"

  /** Count of pattern hits (codegen'd regexp_extract_all). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Redact emails, then IPv4 addresses, then phone numbers (order is part
    * of the contract: an email's domain can never be re-matched as an IP
    * once it is `<EMAIL>`). Pure column math — scan-speed scrubbing. */
  def scrubPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }

  /** Unigram language model for perplexity-based quality scoring — the
    * CCNet-shaped recipe (there a KenLM 5-gram; the unigram form keeps the
    * same pipeline shape and a SQL-replayable contract): token counts over
    * a REFERENCE corpus (the "looks like good text" sample), pruned to the
    * top `vocab` tokens by count (ties by token ascending — deterministic
    * across engines). Tokens are lowercased `' '`-split ([[Dedup.tokens]]
    * semantics, shared with the dedup tier).
    *
    * Scale shape: one (token) count aggregation — partial-agg/map-side
    * combined, so viral stopword keys cost merges of longs, not row
    * funnels — then a top-`vocab` TakeOrdered. The model is vocab-sized:
    * broadcast it to score ([[lmPerplexity]]).
    *
    * Output: (token, cnt), ≤ `vocab` rows. Everything [[lmPerplexity]]
    * needs (total count N, vocab size V) derives from this table alone,
    * so a persisted model is self-contained. */
  def unigramLm(ref: DataFrame, textCol: String, vocab: Int): DataFrame = {
    require(vocab >= 1, s"unigramLm: vocab must be >= 1, got $vocab")
    ref.filter(col(textCol).isNotNull)
      .select(explode(Dedup.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(vocab)
  }

  /** Per-document perplexity under a [[unigramLm]] model — the CCNet-style
    * quality signal (filter or bucket a corpus by how language-like its
    * text is under a reference LM). Laplace smoothing over the pruned
    * vocab: with N = Σ cnt and V = model rows,
    * p(tok) = (cnt(tok) + 1) / (N + V + 1) for vocab tokens and
    * 1 / (N + V + 1) for out-of-vocabulary tokens (the `+ 1` numerator of
    * an unseen token — one uniform formula via `coalesce(cnt, 0)`).
    *
    * Scale shape: the vocab-sized model BROADCASTS; the corpus side is
    * scan → explode → broadcast-hash left join → per-doc aggregate keyed
    * by doc_id (uniform) — nothing corpus-sized shuffles, no key a viral
    * token can concentrate (token keys never leave the map side of the
    * broadcast join).
    *
    * Determinism across engines (the differential-oracle contract): each
    * token's log-probability is fixed-pointed to MICRO-NATS
    * (`round(ln(p)·10⁶)` as a long) BEFORE the per-doc sum, so summation
    * order cannot drift a last ulp — only ~V+1 DISTINCT ln evaluations
    * exist corpus-wide, and the per-doc sum is exact integer math. The
    * per-token MEAN stays integer too: `(2·Σ + n) div (2n)` is
    * half-away-from-zero division on positive longs (float division by n
    * would re-open the very midpoint boundary the fixed-point closed —
    * measured: 2 of 5000 docs at sf0.1 landed on a 6-decimal midpoint
    * where the engines' double rounding disagreed). nll is that integer
    * mean / 10⁶ — a value with exactly 6 decimals, bit-stable under
    * `round(…, 6)` in any engine; ppl = exp(nll) (identical input both
    * sides; exp's last-ulp is absorbed by the 6-decimal round except on
    * a measure-zero midpoint).
    *
    * Output: (doc_id, n_tokens, nll, ppl) per input document with
    * non-null id and text, both rounded to 6 decimals. */
  def lmPerplexity(docs: DataFrame, model: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val m = model.select(col("token").as("_t"), col("cnt").as("_c"))
    val stats = m.agg(sum(col("_c")).cast("double").as("_N"),
      count(lit(1)).cast("double").as("_V"))
    val lp6 = round(log((coalesce(col("_c"), lit(0L)) + 1.0) /
      (col("_N") + col("_V") + 1.0)) * 1e6).cast("long")
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("_t"))
      .join(broadcast(m), Seq("_t"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), lp6.as("_lp6"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("_lp6")).as("_s6"))
      // integer half-up mean in micro-nats: −s6 ≥ 0 (log-probs are ≤ 0),
      // so `div`'s truncation equals floor and both engines agree
      .withColumn("_m6",
        expr("(-_s6 * 2 + n_tokens) div (2 * n_tokens)"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("_m6") / 1e6, 6).as("nll"),
        round(exp(col("_m6") / 1e6), 6).as("ppl"))
  }

  /** Bigram counts over a REFERENCE corpus for the n-gram LM tier — the
    * step from [[unigramLm]]'s vocabulary model toward CCNet's actual
    * KenLM-shaped recipe: word ORDER becomes visible (unigram perplexity
    * passes fluent-vocabulary gibberish). Bigrams are adjacent pairs of
    * [[Dedup.tokens]] (the engine-wide lowercased `' '`-split contract);
    * only pairs whose CONTEXT token survived the `uni` vocab cap are
    * kept (a bigram without a denominator count cannot be scored), then
    * pruned to the top `vocab` by count (ties by (w1, w2) ascending —
    * deterministic across engines). Each row carries its context count
    * so a persisted model is self-contained.
    *
    * Scale shape: one (w1, w2) count aggregation — partial-agg friendly,
    * no key a viral pair can concentrate beyond a merge of longs — then
    * a broadcast join against the vocab-sized unigram table and a
    * top-`vocab` TakeOrdered. Output: (w1, w2, cnt, w1_cnt), ≤ `vocab`
    * rows, model-scale. */
  def bigramLm(ref: DataFrame, textCol: String, uni: DataFrame,
      vocab: Int): DataFrame = {
    require(vocab >= 1, s"bigramLm: vocab must be >= 1, got $vocab")
    val tok = Dedup.tokens(col(textCol))
    val m = size(tok) - 1
    val pairs = when(m < 1, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(zip_with(slice(tok, lit(1), m), slice(tok, lit(2), m),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
    ref.filter(col(textCol).isNotNull)
      .select(explode(pairs).as("_p"))
      .select(col("_p.w1").as("w1"), col("_p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .join(broadcast(uni.select(col("token").as("w1"),
        col("cnt").as("w1_cnt"))), Seq("w1"))
      .orderBy(col("cnt").desc, col("w1").asc, col("w2").asc)
      .limit(vocab)
  }

  /** Per-document perplexity under a bigram model with STUPID BACKOFF
    * (Brants et al. 2007 — the large-scale-LM recipe: no discounting,
    * a fixed multiplicative penalty on backoff, raw relative frequencies
    * where a bigram is known):
    *
    *   - token 1 of a document: Laplace-smoothed unigram, exactly
    *     [[lmPerplexity]]'s formula;
    *   - token i ≥ 2 with (t_{i-1}, t_i) in the bigram table:
    *     p = cnt(t_{i-1} t_i) / cnt(t_{i-1}) (≤ 1 by construction);
    *   - otherwise: p = `backoff` × the smoothed unigram probability.
    *
    * Same scale + determinism contract as [[lmPerplexity]]: both models
    * BROADCAST (model-scale tables), the corpus side is scan → pair
    * explode → two broadcast left joins → one doc_id-keyed aggregate;
    * each token's log-prob fixed-points to micro-nats before the exact
    * integer sum and half-up integer mean, so engines cannot drift a
    * last ulp. With `backoff = 1.0` and an EMPTY bigram table this is
    * bit-identical to [[lmPerplexity]] (spec-pinned) — the fallback path
    * IS the unigram model.
    *
    * Output: (doc_id, n_tokens, nll, ppl), rounded to 6 decimals. */
  def ngramPerplexity(docs: DataFrame, uni: DataFrame, bi: DataFrame,
      idCol: String, textCol: String, backoff: Double = 0.4): DataFrame = {
    require(backoff > 0.0 && backoff <= 1.0,
      s"ngramPerplexity: backoff must be in (0, 1], got $backoff")
    val m = uni.select(col("token").as("_t"), col("cnt").as("_c"))
    val b = bi.select(col("w1").as("_prev"), col("w2").as("_t"),
      col("cnt").as("_bc"), col("w1_cnt").as("_w1c"))
    val stats = m.agg(sum(col("_c")).cast("double").as("_N"),
      count(lit(1)).cast("double").as("_V"))
    val tok = Dedup.tokens(col(textCol))
    val n = size(tok)
    // (prev, cur) pairs with a null prev for the document's first token
    val pairs = zip_with(
      concat(array(lit(null).cast("string")), slice(tok, lit(1), n - 1)),
      tok, (p, c) => struct(p.as("prev"), c.as("cur")))
    val lpUni6 = round(log((coalesce(col("_c"), lit(0L)) + 1.0) /
      (col("_N") + col("_V") + 1.0)) * 1e6).cast("long")
    val lpBack6 = round(log(lit(backoff) *
      ((coalesce(col("_c"), lit(0L)) + 1.0) /
        (col("_N") + col("_V") + 1.0))) * 1e6).cast("long")
    val lpBi6 = round(log(col("_bc").cast("double") /
      col("_w1c").cast("double")) * 1e6).cast("long")
    val lp6 = when(col("_prev").isNull, lpUni6)
      .otherwise(when(col("_bc").isNotNull, lpBi6).otherwise(lpBack6))
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), explode(pairs).as("_p"))
      .select(col("doc_id"), col("_p.prev").as("_prev"),
        col("_p.cur").as("_t"))
      .join(broadcast(m), Seq("_t"), "left")
      .join(broadcast(b), Seq("_prev", "_t"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), lp6.as("_lp6"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("_lp6")).as("_s6"))
      .withColumn("_m6",
        expr("(-_s6 * 2 + n_tokens) div (2 * n_tokens)"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("_m6") / 1e6, 6).as("nll"),
        round(exp(col("_m6") / 1e6), 6).as("ppl"))
  }

  /** Gopher's default stop list (Rae et al. 2021 §A1.1.2). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher/MassiveText per-document quality rules (Rae et al. 2021,
    * Table A1) as one scan-speed pass — the composite heuristic filter
    * most corpus pipelines run before any model-based scoring. Every
    * signal is per-row column math (no shuffle, no UDF, whole-stage
    * codegen), so at 100 TB this is a pure map over the scan:
    *
    *   - word count within [`minWords`, `maxWords`] (words = `' '`-split
    *     of the lowercased text, the engine-wide phantom-token contract);
    *   - mean word length within [`minMeanWordLen`, `maxMeanWordLen`]
    *     (exact: Σ token length = length − (n − 1) under single-space
    *     split);
    *   - symbol-to-word ratio (`#` + `...` occurrences / words) ≤
    *     `maxSymbolRatio`;
    *   - fraction of `sep`-lines starting with a bullet (`- ` / `* `) ≤
    *     `maxBulletFrac`, fraction ending in `...` ≤ `maxEllipsisFrac`;
    *   - fraction of words containing ≥ 1 alphabetic character ≥
    *     `minAlphaWordFrac`;
    *   - at least `minStopHits` occurrences from `stops` (the "contains
    *     real English function words" test).
    *
    * Fractions round to 6 decimals and the pass flag compares the ROUNDED
    * values (the fixed point the differential oracles share, so the
    * boundary is bit-stable across engines). Output: (doc_id, n_words,
    * mean_word_len, symbol_ratio, bullet_frac, ellipsis_frac,
    * alpha_word_frac, stop_hits, pass) per input document with non-null
    * id and text. Compose as a floor via
    * `docs.join(gopherRules(...).filter(!col("pass")).select(id), id,
    * "left_anti")` — or feed the per-rule columns to an audit. */
  /** The seven per-document Gopher signals over a text column, rounded
    * to the 6-decimal fixed point where applicable: (n_words,
    * mean_word_len, symbol_ratio, bullet_frac, ellipsis_frac,
    * alpha_word_frac, stop_hits). Shared by [[gopherRules]] (the audit
    * table) and [[gopherPass]] (the scan-filter predicate) so the two
    * can never diverge on the math. */
  private def gopherSignals(t: Column, stops: Seq[String], sep: String):
      (Column, Column, Column, Column, Column, Column, Column) =
    gopherSignalsFrom(t, split(lower(t), " "),
      split(t, java.util.regex.Pattern.quote(sep)), stops)

  /** [[gopherSignals]] over PRE-STAGED token/line arrays — `gopherRules`
    * stages `w`/`lines` as their own projection columns so the two
    * splits run once per row instead of once per signal (the Quadrants
    * lesson: source-level sharing, not hoped-for codegen CSE). */
  private def gopherSignalsFrom(t: Column, w: Column, lines: Column,
      stops: Seq[String]):
      (Column, Column, Column, Column, Column, Column, Column) = {
    val nW = size(w)
    val meanWl = round((length(t) - nW + 1).cast("double") / nW, 6)
    // '#' by character deletion; '...' by literal (non-regex) replace —
    // non-overlapping left-to-right in both engines
    val nHash = length(t) - length(translate(t, "#", ""))
    val nEll = (length(t) - length(replace(t, lit("..."), lit("")))) / 3
    val symbolRatio = round((nHash + nEll).cast("double") / nW, 6)
    val nL = size(lines)
    // compiled membership/regex counts (Cols.tokenSetHits /
    // tokenRegexHits): the filter(...) lambda forms ran interpreted and
    // allocated the kept array per row just to size() it. \A / \z
    // anchors, not ^ / $ — $ also matches before a final \r, where
    // endsWith does not
    val bulletFrac = round(graft.functions.Cols.tokenRegexHits(lines,
      "\\A- |\\A\\* ").cast("double") / nL, 6)
    val ellipsisFrac = round(graft.functions.Cols.tokenRegexHits(lines,
      "\\.\\.\\.\\z").cast("double") / nL, 6)
    val alphaFrac = round(graft.functions.Cols.tokenAnyAsciiHits(w,
      "abcdefghijklmnopqrstuvwxyz").cast("double") / nW, 6)
    val stopHits = graft.functions.Cols.tokenSetHits(w, stops)
    (nW.cast("long"), meanWl, symbolRatio, bulletFrac, ellipsisFrac,
      alphaFrac, stopHits)
  }

  /** The Gopher rule set as a single boolean COLUMN over a text column —
    * the scan-filter form for composing the floor into `Corpus.prepare`
    * and ingest without any join: `docs.filter(gopherPass(col(text)))` is
    * pure per-row math the optimizer folds into the scan (a drop-list
    * anti-join would shuffle both corpus-sized sides once the list
    * outgrows broadcast — Gopher drops ~half of raw web text). Evaluates
    * null (≡ drop under `filter`) on null text; same rounded fixed point
    * and identical signal expressions as [[gopherRules]]' pass flag. */
  def gopherPass(t: Column,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      stops: Seq[String] = GopherStops, minStopHits: Long = 2,
      sep: String = "\n"): Column = {
    require(sep.nonEmpty, "gopherPass: sep must be non-empty")
    val (nW, meanWl, symbolRatio, bulletFrac, ellipsisFrac, alphaFrac,
      stopHits) = gopherSignals(t, stops, sep)
    nW >= minWords && nW <= maxWords &&
      meanWl >= minMeanWordLen && meanWl <= maxMeanWordLen &&
      symbolRatio <= maxSymbolRatio &&
      bulletFrac <= maxBulletFrac && ellipsisFrac <= maxEllipsisFrac &&
      alphaFrac >= minAlphaWordFrac && stopHits >= minStopHits
  }

  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      stops: Seq[String] = GopherStops, minStopHits: Long = 2,
      sep: String = "\n"): DataFrame = {
    require(sep.nonEmpty, "gopherRules: sep must be non-empty")
    // stage the two splits as their own projection columns (computed
    // once per row; four signals share w, two share lines — inlined they
    // re-evaluated per signal)
    val (nW, meanWl, symbolRatio, bulletFrac, ellipsisFrac, alphaFrac,
      stopHits) = gopherSignalsFrom(col(textCol), col("__gw"),
      col("__gl"), stops)
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .withColumns(Map(
        "__gw" -> split(lower(col(textCol)), " "),
        "__gl" -> split(col(textCol),
          java.util.regex.Pattern.quote(sep))))
      .select(col(idCol).as("doc_id"), nW.as("n_words"),
        meanWl.as("mean_word_len"), symbolRatio.as("symbol_ratio"),
        bulletFrac.as("bullet_frac"), ellipsisFrac.as("ellipsis_frac"),
        alphaFrac.as("alpha_word_frac"), stopHits.as("stop_hits"))
      .withColumn("pass",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("bullet_frac") <= maxBulletFrac &&
          col("ellipsis_frac") <= maxEllipsisFrac &&
          col("alpha_word_frac") >= minAlphaWordFrac &&
          col("stop_hits") >= minStopHits)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — there hashed-n-gram
    * feature LMs; the unigram form keeps the recipe and the replayable
    * contract): per document, the log-likelihood RATIO under a TARGET
    * reference model vs a SOURCE (raw-corpus) model, both [[unigramLm]]
    * tables. Documents that look more like the target than the raw pool
    * score high; select by thresholding or ranking the ratio (compose
    * with [[Sampling.stratifiedQuota]]/[[Sampling.hashSample]] for the
    * resampling step).
    *
    * Same scale and determinism contract as [[lmPerplexity]]: both
    * models broadcast, one doc_id-keyed aggregate, per-token log-probs
    * fixed-pointed to micro-nats so the ratio sum is integer-exact.
    *
    * Output: (doc_id, n_tokens, log_ratio, log_ratio_mean) — the summed
    * and per-token ratios in nats, rounded to 6 decimals. */
  def lmLogRatio(docs: DataFrame, targetLm: DataFrame, sourceLm: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val mt = targetLm.select(col("token").as("_t"), col("cnt").as("_ct"))
    val ms = sourceLm.select(col("token").as("_t"), col("cnt").as("_cs"))
    val st = mt.agg(sum(col("_ct")).cast("double").as("_Nt"),
      count(lit(1)).cast("double").as("_Vt"))
    val ss = ms.agg(sum(col("_cs")).cast("double").as("_Ns"),
      count(lit(1)).cast("double").as("_Vs"))
    val lpT = round(log((coalesce(col("_ct"), lit(0L)) + 1.0) /
      (col("_Nt") + col("_Vt") + 1.0)) * 1e6).cast("long")
    val lpS = round(log((coalesce(col("_cs"), lit(0L)) + 1.0) /
      (col("_Ns") + col("_Vs") + 1.0)) * 1e6).cast("long")
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("_t"))
      .join(broadcast(mt), Seq("_t"), "left")
      .join(broadcast(ms), Seq("_t"), "left")
      .crossJoin(broadcast(st)).crossJoin(broadcast(ss))
      .select(col("doc_id"), (lpT - lpS).as("_d6"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("_d6")).as("_s6"))
      // the ratio sum is SIGNED — integer half-away-from-zero mean via
      // abs + reapplied sign (Spark `div` truncates toward zero while
      // DuckDB `//` floors: they disagree on negatives, so divide
      // positives only; see lmPerplexity for why a float mean is out)
      .withColumn("_m6",
        expr("""CASE WHEN _s6 < 0 THEN -((-_s6 * 2 + n_tokens) div (2 * n_tokens))
                ELSE (_s6 * 2 + n_tokens) div (2 * n_tokens) END"""))
      .select(col("doc_id"), col("n_tokens"),
        round(col("_s6") / 1e6, 6).as("log_ratio"),
        round(col("_m6") / 1e6, 6).as("log_ratio_mean"))
  }

  /** Whitespace-family character class — EXPLICIT (no `\s`, no unicode
    * properties) so Java regex and RE2 agree byte for byte: Java's `\s`
    * is ASCII-only by default while other engines disagree on vertical
    * tab and unicode spaces; an explicit class removes the question. */
  val WsRe = "[ \\t\\n\\r\\f\\x0B]+"
  /** C0 control characters and DEL, minus the whitespace family above —
    * the bytes a crawler's transport layer leaks into text. */
  val CtrlRe = "[\\x00-\\x08\\x0E-\\x1F\\x7F]"

  /** Canonicalize raw text: strip control characters, collapse every
    * whitespace run (tab/newline/CR/FF/VT included) to one space, trim,
    * and optionally lowercase — the normalization pass that runs BEFORE
    * hashing-based dedup so that byte-level transport noise (CRLF vs LF,
    * tab indentation, trailing blanks) cannot split an exact-duplicate
    * group. Pure column math, scan-speed, alternation-free patterns
    * (oracle-replayable in any RE2 engine). Control characters become
    * nothing (not a space): a stray NUL inside a word must not split the
    * word, while whitespace runs collapse on their own class. */
  def normalizeText(text: Column, lowercase: Boolean = false): Column = {
    // one compiled byte scan ([[graft.expressions.NormalizeTextExpr]],
    // byte-exact to the regexp_replace ∘ regexp_replace ∘ trim form the
    // oracles replay — spec-pinned): the two regex passes rebuilt the
    // string twice per evaluation, and predicate pushdown replicates
    // this expression into the quality/language filters several times
    // per row (d14 measured 2.5× its oracle on exactly that)
    val collapsed = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.expressions.NormalizeTextExpr(
        ColumnBridge.expression(text)))
    }
    if (lowercase) lower(collapsed) else collapsed
  }

  // --- URL / domain tier: the CCNet/RefinedWeb grouping key for
  // domain-level dup rates, quality aggregates, and mix strata ---

  /** Embedded second-level public suffixes — the compact high-traffic
    * subset of the public-suffix list (registrable-domain extraction is
    * an algorithm plus a DATA file; the full PSL swaps in here without
    * code changes). `last-two-labels ∈ this set ⇒ take three labels`. */
  val SecondLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "sch.uk",
    "plc.uk", "ltd.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.tw", "com.hk", "com.sg", "com.my", "com.mx", "com.ar", "com.co",
    "com.tr", "com.ua", "com.pl", "co.kr", "or.kr", "co.za", "org.za",
    "co.il", "org.il", "co.th", "in.th")

  /** `scheme://` prefix (group 1 = scheme) — RE2/Java-agreeing. */
  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  /** host[:port] after the scheme (group 1) — stops at path/query/#. */
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"

  /** Canonicalize a URL — the key-normalization pass that must run
    * before URLs group (dup rates, domain strata): trim; drop the
    * fragment (first `#` to end of line); lowercase the scheme and
    * host; strip a leading `www.`; strip the scheme's default port
    * (`:80` http, `:443` https); collapse a bare-`/` path to nothing.
    * Path and query keep their bytes (case-significant by RFC). A
    * schemeless string passes through lowercased+trimmed — opaque keys
    * stay usable keys. Pure column math on RE2/Java-agreeing patterns
    * (the [[normalizeText]] discipline); oracle-replayable. */
  def canonicalizeUrl(url: Column): Column = {
    val t = regexp_replace(trim(url), "#.*", "")
    val scheme = lower(regexp_extract(t, SchemeRe, 1))
    val host0 = regexp_replace(lower(regexp_extract(t, HostRe, 1)),
      "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val rest0 = regexp_replace(t, HostRe, "")
    val rest = when(rest0 === "/", lit("")).otherwise(rest0)
    when(scheme === "", lower(t))
      .otherwise(concat(scheme, lit("://"), host, rest))
  }

  /** The canonical host of a URL (lowercased, `www.`-stripped, any port
    * stripped); a schemeless input is treated as a bare host (anything
    * from the first `/` or `?` dropped). */
  def urlHost(url: Column): Column = {
    val t = regexp_replace(trim(url), "#.*", "")
    val hostport = when(regexp_extract(t, SchemeRe, 1) === "",
      regexp_replace(t, "[/?].*", ""))
      .otherwise(regexp_extract(t, HostRe, 1))
    regexp_replace(regexp_replace(lower(hostport), "^www\\.", ""),
      ":[0-9]+$", "")
  }

  /** Registrable domain of a URL or host — the CCNet/RefinedWeb
    * grouping key: last two host labels, or three when the last two are
    * a registry suffix ([[SecondLevelSuffixes]]); IPv4 hosts and one- or
    * two-label hosts pass through whole. */
  def registrableDomain(url: Column): Column = {
    val h = urlHost(url)
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", slice(labels, n - 1, lit(2)))
    val last3 = concat_ws(".", slice(labels, n - 2, lit(3)))
    when(h.rlike("^[0-9.]+$") || n <= 2, h)
      .when(last2.isInCollection(SecondLevelSuffixes), last3)
      .otherwise(last2)
  }

  /** Domain-level corpus aggregate — per registrable domain of `urlCol`:
    * document and token counts, the exact-duplicate rate (documents
    * minus distinct content hashes), and the summed 6-decimal
    * fixed-point quality score ([[TextStats.qualityScore]] — summed as
    * integer micros, never float-averaged across partitions, so the
    * result is bit-stable; divide by `n_docs` downstream for the mean).
    * The table this emits IS the strata source for
    * [[Sampling.mixSample]]/[[Sampling.mixQuota]] — inspect rates here,
    * then mix on a `registrableDomain(url)` column. ONE shuffle, on the
    * domain key. */
  def domainStats(docs: DataFrame, idCol: String, urlCol: String,
      textCol: String, stops: Seq[String]): DataFrame =
    docs.filter(col(idCol).isNotNull && col(urlCol).isNotNull &&
        col(textCol).isNotNull)
      .select(registrableDomain(col(urlCol)).as("domain"),
        size(filter(split(lower(col(textCol)), " "), t => t =!= ""))
          .cast("long").as("_tok"),
        round(TextStats.qualityScore(col(textCol), stops) * 1e6)
          .cast("long").as("_q"),
        sha2(col(textCol), 256).as("_ch"))
      .groupBy("domain").agg(
        count(lit(1)).as("n_docs"),
        sum("_tok").as("n_tokens"),
        (count(lit(1)) - countDistinct("_ch")).as("n_dups"),
        sum("_q").as("quality_micro_sum"))

  // ---------------------------------------------------------------------
  // Quality classifier (the fastText-shaped linear filter: Joulin et al.
  // 2016; the CCNet/GPT-3-style "looks like the reference corpus" gate)
  // ---------------------------------------------------------------------

  /** Hashed bag-of-ngrams features: (doc_id, feature, cnt) with
    * feature = md5-low-32(ngram) mod `dim` over the lowercased
    * space-split unigrams (and bigrams when `bigrams`) — the hashing
    * trick, with the engine-wide cross-engine hash
    * (`('0x' || substr(md5(w),1,8))::BIGINT % dim` computes the identical
    * id in DuckDB, which is what makes classifier SCORING
    * hash-differential-testable). Pure column math + one (doc, feature)
    * aggregation; documents never shuffle, only hashed ids and counters.
    * Null id/text rows are excluded (the unscorable-row contract shared
    * with [[lmPerplexity]]); an empty text still features (the phantom
    * empty token), so every surviving document scores. */
  def hashedTextFeatures(docs: DataFrame, idCol: String, textCol: String,
      dim: Int, bigrams: Boolean = true): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val w = Dedup.tokens(col(textCol))
    val uni = w
    val big = zip_with(slice(w, lit(1), size(w) - 1),
      slice(w, lit(2), size(w) - 1), (a, b) => concat(a, lit(" "), b))
    val ngrams = if (bigrams) concat(uni, big) else uni
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(ngrams).as("_ng"))
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("_ng").cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(dim.toLong)).as("feature"))
      .groupBy("doc_id", "feature")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Train the quality classifier — logistic regression over
    * [[hashedTextFeatures]] — as a DRIVER KERNEL on a require-bounded
    * labeled sample (the [[graft.llm.BpeKernel]] split: labeled quality
    * data is curation-scale — a reference corpus vs a raw-web draw —
    * while SCORING is the corpus-scale pass, so the 100 TB path is
    * [[scoreTextClassifier]], never this). Features are computed by the
    * SAME distributed column path the scorer runs (no second tokenizer to
    * drift), collected sorted by (doc_id, feature) so training is
    * bit-deterministic, then full-batch gradient descent with L2 runs
    * sequentially on the driver.
    *
    * `labeled` needs (`idCol`, `textCol`, `labelCol` ∈ {0, 1}: 1 = the
    * quality reference). Memory budget: Σ distinct (doc, feature) rows ×
    * ~16 B + a dense `dim`-double weight vector — `maxTrainDocs` and
    * `dim ≤ 2²²` are require-guarded.
    *
    * Output: (feature, w_micro) — micro-unit (1e-6) integer weights,
    * nonzero entries only, plus the intercept at feature = −1. Integer
    * weights make the downstream score an EXACT integer both engines
    * agree on; the quantization moves the decision boundary by ≤ 1e-6
    * per feature count, noise-level against the classifier's own
    * generalization error. */
  def trainTextClassifier(labeled: DataFrame, idCol: String,
      textCol: String, labelCol: String, dim: Int = 1 << 18,
      bigrams: Boolean = true, iters: Int = 100, lr: Double = 0.5,
      l2: Double = 1e-6, maxTrainDocs: Int = 200000): DataFrame = {
    require(dim >= 2 && dim <= (1 << 22),
      s"dim must be in [2, 2^22], got $dim (the trainer holds a dense " +
        "dim-double weight vector)")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = labeled.sparkSession
    import spark.implicits._
    val base = labeled.filter(col(idCol).isNotNull &&
      col(textCol).isNotNull && col(labelCol).isNotNull)
    val feats = hashedTextFeatures(base, idCol, textCol, dim, bigrams)
    val labels = base.select(col(idCol).cast("long").as("doc_id"),
      col(labelCol).cast("int").as("_y"))
    // duplicate ids would fan the feats-join out (double-counting every
    // feature) and make ys(d) depend on row order under conflicting
    // labels — refuse malformed input rather than train on it silently
    val labelCounts = labels.groupBy("doc_id")
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 1).limit(1).collect()
    require(labelCounts.isEmpty,
      s"trainTextClassifier: duplicate labeled doc_id " +
        s"${labelCounts.headOption.map(_.getLong(0)).getOrElse(-1L)} — " +
        "label each document exactly once (dedup before training)")
    val rows = feats.join(labels, "doc_id")
      .select(col("doc_id"), col("feature"), col("cnt"), col("_y"))
      .sort("doc_id", "feature")
      .as[(Long, Long, Long, Int)]
      .collect()
    val nDocs = {
      var n = 0; var last = Long.MinValue
      rows.foreach { r => if (r._1 != last) { n += 1; last = r._1 } }
      n
    }
    require(nDocs >= 1, "trainTextClassifier: no labeled documents")
    require(nDocs <= maxTrainDocs,
      s"trainTextClassifier: $nDocs labeled docs exceed maxTrainDocs " +
        s"$maxTrainDocs — the trainer is a driver kernel for a " +
        "curation-scale sample; train on a sample and SCORE the corpus")
    // flatten to primitive arrays: doc boundaries, feature ids, counts
    val starts = new Array[Int](nDocs + 1)
    val ys = new Array[Double](nDocs)
    val fIdx = new Array[Int](rows.length)
    val fCnt = new Array[Double](rows.length)
    var d = -1; var last = Long.MinValue
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      if (r._1 != last) { d += 1; starts(d) = i; ys(d) = r._4; last = r._1 }
      fIdx(i) = r._2.toInt; fCnt(i) = r._3.toDouble
      i += 1
    }
    starts(nDocs) = rows.length
    val wv = new Array[Double](dim)
    var b = 0.0
    val grad = new Array[Double](dim)
    var it = 0
    while (it < iters) {
      java.util.Arrays.fill(grad, 0.0)
      var gb = 0.0
      var di = 0
      while (di < nDocs) {
        var z = b
        var j = starts(di)
        while (j < starts(di + 1)) { z += wv(fIdx(j)) * fCnt(j); j += 1 }
        // residual of the logistic loss: p − y
        val g = 1.0 / (1.0 + math.exp(-z)) - ys(di)
        gb += g
        j = starts(di)
        while (j < starts(di + 1)) { grad(fIdx(j)) += g * fCnt(j); j += 1 }
        di += 1
      }
      var f = 0
      while (f < dim) {
        wv(f) -= lr * (grad(f) / nDocs + l2 * wv(f))
        f += 1
      }
      b -= lr * gb / nDocs
      it += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    out += ((-1L, math.round(b * 1e6)))
    var f = 0
    while (f < dim) {
      val m = math.round(wv(f) * 1e6)
      if (m != 0L) out += ((f.toLong, m))
      f += 1
    }
    out.toSeq.toDF("feature", "w_micro")
  }

  /** Score documents under a trained (or explicit) classifier:
    * logit_micro = w_micro(−1) + Σ cnt·w_micro(feature) — EXACT integer
    * arithmetic, monotone in the class probability (sigmoid is
    * monotone), so thresholding on logit_micro IS thresholding on p.
    * Features the table does not carry contribute 0 (a frozen model
    * scores drifted vocabulary honestly rather than erroring).
    *
    * The whole logit is DOC-LOCAL, so this is a ZERO-SHUFFLE typed scan:
    * the dim-bounded weight table broadcasts as a primitive-keyed map,
    * and each partition tokenizes, hashes (the identical md5-low-32 mod
    * dim as [[hashedTextFeatures]] — spec-pinned equal, and the scores
    * are exact integers so the two forms cannot differ in any bit),
    * counts, and sums in one pass. The earlier declarative form
    * (explode → broadcast join → per-doc agg) shuffled corpus-TOKEN-
    * scale (doc, feature, cnt) rows — measured 3–7× slower and the
    * wrong 100 TB shape.
    *
    * Output: (doc_id, n_feats, logit_micro) — n_feats = DISTINCT
    * features in the doc. Long-exactness bound: |Σ cnt·w| ≤
    * doc_tokens·2·max|w_micro| — at |w| ≤ 1e3 (1e9 micro), a single
    * document would need ~4e9 tokens to overflow; unreachable.
    *
    * Null id/text rows are excluded (unscorable); empty text scores as
    * the phantom-token feature set. */
  def scoreTextClassifier(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int, bigrams: Boolean = true): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val spark = docs.sparkSession
    import spark.implicits._
    // the weight table must be model-sized (≤ dim features + the
    // intercept) — a mistakenly corpus-sized view would otherwise
    // collect onto the driver; mirror the trainer's memory guard
    val wCount = weights.limit((1 << 22) + 2).count()
    require(wCount <= (1 << 22) + 1,
      s"scoreTextClassifier: weight table has > 2^22 + 1 rows — not a " +
        "trained model (pass trainTextClassifier output, nonzero " +
        "weights + intercept)")
    val wRows = weights
      .select(col("feature").cast("long"), col("w_micro").cast("long"))
      .collect()
    val intercept = wRows.find(_.getLong(0) == -1L)
      .map(_.getLong(1)).getOrElse(0L)
    val wMap = {
      val m = new scala.collection.mutable.LongMap[Long](wRows.length)
      wRows.foreach(r => if (r.getLong(0) >= 0L) m(r.getLong(0)) = r.getLong(1))
      m
    }
    val bc = spark.sparkContext.broadcast(wMap)
    val dimL = dim.toLong
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val w = bc.value
        val md = java.security.MessageDigest.getInstance("MD5")
        // md5-low-32 mod dim — bit-identical to the column path's
        // conv(substring(md5(ngram), 1, 8), 16, 10) % dim (first 8 hex
        // chars = the first 4 digest bytes, big-endian, unsigned).
        // Per-partition memo: natural text repeats tokens heavily
        // (stopwords, common bigrams), and MD5 is ~700 ns a call — the
        // cache only short-circuits identical inputs, so values are
        // unchanged; capped so adversarial vocabulary can't grow it
        // unboundedly
        val memo = new java.util.HashMap[String, java.lang.Long](1 << 14)
        def feat(ngram: String): Long = {
          val hit = memo.get(ngram)
          if (hit != null) hit.longValue()
          else {
            md.reset()
            val d = md.digest(ngram.getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
            val f = java.lang.Integer.toUnsignedLong(
              java.nio.ByteBuffer.wrap(d).getInt) % dimL
            if (memo.size < (1 << 16)) memo.put(ngram, f)
            f
          }
        }
        val counts = new scala.collection.mutable.LongMap[Long]()
        rows.map { case (id, text) =>
          counts.clear()
          // Locale.ROOT + limit −1: the [[graft.llm.Dedup.tokens]]
          // contract (lower() ∘ split-on-single-space, trailing empties
          // kept) that every oracle replays
          val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          var i = 0
          while (i < toks.length) {
            val f = feat(toks(i))
            counts(f) = counts.getOrElse(f, 0L) + 1L
            if (bigrams && i + 1 < toks.length) {
              val g = feat(toks(i) + " " + toks(i + 1))
              counts(g) = counts.getOrElse(g, 0L) + 1L
            }
            i += 1
          }
          var logit = intercept
          counts.foreachEntry { (f, cnt) =>
            logit += cnt * w.getOrElse(f, 0L)
          }
          (id, counts.size.toLong, logit)
        }
      }.toDF("doc_id", "n_feats", "logit_micro")
  }

  /** Multi-class extension of [[trainTextClassifier]] — softmax
    * regression over the same [[hashedTextFeatures]], the step that
    * turns language ID from a marker-vote fixture into a TRAINED,
    * gateable operator (fastText's actual langid shape: Joulin et al.
    * 2016). Same driver-kernel split and determinism contract: features
    * come from the one distributed column path the scorer replays,
    * collect sorted, full-batch gradient descent; classes process in
    * SORTED label order, so training is bit-deterministic.
    *
    * `labeled` needs (`idCol`, `textCol`, `labelCol`: the class STRING,
    * e.g. a language code). Memory: K dense dim-double vectors —
    * `dim ≤ 2²⁰` here (the K multiplier), `maxTrainDocs` as before.
    *
    * Output: (label, feature, w_micro) — per-class micro-unit integer
    * weights, nonzero entries only, intercepts at feature = −1. Exact
    * integer per-class logits downstream; softmax is monotone per class,
    * and the argmax of the integer logits IS the argmax of the
    * probabilities. */
  def trainTextClassifierMulti(labeled: DataFrame, idCol: String,
      textCol: String, labelCol: String, dim: Int = 1 << 18,
      bigrams: Boolean = true, iters: Int = 100, lr: Double = 0.5,
      l2: Double = 1e-6, maxTrainDocs: Int = 200000): DataFrame = {
    require(dim >= 2 && dim <= (1 << 20),
      s"dim must be in [2, 2^20], got $dim (the trainer holds K dense " +
        "dim-double weight vectors)")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = labeled.sparkSession
    import spark.implicits._
    val base = labeled.filter(col(idCol).isNotNull &&
      col(textCol).isNotNull && col(labelCol).isNotNull)
    val feats = hashedTextFeatures(base, idCol, textCol, dim, bigrams)
    val labels = base.select(col(idCol).cast("long").as("doc_id"),
      col(labelCol).cast("string").as("_y"))
    val labelCounts = labels.groupBy("doc_id")
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 1).limit(1).collect()
    require(labelCounts.isEmpty,
      s"trainTextClassifierMulti: duplicate labeled doc_id " +
        s"${labelCounts.headOption.map(_.getLong(0)).getOrElse(-1L)} — " +
        "label each document exactly once (dedup before training)")
    val rows = feats.join(labels, "doc_id")
      .select(col("doc_id"), col("feature"), col("cnt"), col("_y"))
      .sort("doc_id", "feature")
      .as[(Long, Long, Long, String)]
      .collect()
    val classes = rows.map(_._4).distinct.sorted
    val k = classes.length
    require(k >= 2, s"trainTextClassifierMulti: need >= 2 classes, got $k")
    val classIdx = classes.zipWithIndex.toMap
    val nDocs = {
      var n = 0; var last = Long.MinValue
      rows.foreach { r => if (r._1 != last) { n += 1; last = r._1 } }
      n
    }
    require(nDocs <= maxTrainDocs,
      s"trainTextClassifierMulti: $nDocs labeled docs exceed " +
        s"maxTrainDocs $maxTrainDocs — train on a sample, score the corpus")
    val starts = new Array[Int](nDocs + 1)
    val ys = new Array[Int](nDocs)
    val fIdx = new Array[Int](rows.length)
    val fCnt = new Array[Double](rows.length)
    var d = -1; var last = Long.MinValue
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      if (r._1 != last) {
        d += 1; starts(d) = i; ys(d) = classIdx(r._4); last = r._1
      }
      fIdx(i) = r._2.toInt; fCnt(i) = r._3.toDouble
      i += 1
    }
    starts(nDocs) = rows.length
    val wv = Array.ofDim[Double](k, dim)
    val b = new Array[Double](k)
    val grad = Array.ofDim[Double](k, dim)
    val gb = new Array[Double](k)
    val z = new Array[Double](k)
    var it = 0
    while (it < iters) {
      var c = 0
      while (c < k) {
        java.util.Arrays.fill(grad(c), 0.0); gb(c) = 0.0; c += 1
      }
      var di = 0
      while (di < nDocs) {
        c = 0
        while (c < k) {
          var zz = b(c)
          var j = starts(di)
          while (j < starts(di + 1)) { zz += wv(c)(fIdx(j)) * fCnt(j); j += 1 }
          z(c) = zz
          c += 1
        }
        // softmax residuals p_c − 1{y=c}, max-shifted for stability
        var mx = z(0); c = 1
        while (c < k) { if (z(c) > mx) mx = z(c); c += 1 }
        var sum = 0.0; c = 0
        while (c < k) { z(c) = math.exp(z(c) - mx); sum += z(c); c += 1 }
        c = 0
        while (c < k) {
          val g = z(c) / sum - (if (ys(di) == c) 1.0 else 0.0)
          gb(c) += g
          var j = starts(di)
          while (j < starts(di + 1)) {
            grad(c)(fIdx(j)) += g * fCnt(j); j += 1
          }
          c += 1
        }
        di += 1
      }
      c = 0
      while (c < k) {
        var f = 0
        while (f < dim) {
          wv(c)(f) -= lr * (grad(c)(f) / nDocs + l2 * wv(c)(f))
          f += 1
        }
        b(c) -= lr * gb(c) / nDocs
        c += 1
      }
      it += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    var c = 0
    while (c < k) {
      out += ((classes(c), -1L, math.round(b(c) * 1e6)))
      var f = 0
      while (f < dim) {
        val m = math.round(wv(c)(f) * 1e6)
        if (m != 0L) out += ((classes(c), f.toLong, m))
        f += 1
      }
      c += 1
    }
    out.toSeq.toDF("label", "feature", "w_micro")
  }

  /** Score documents under a multi-class weight table and return the
    * ARGMAX class — trained language ID ([[langIdTrained]]) and any
    * other K-way text gate. Same zero-shuffle typed scan as
    * [[scoreTextClassifier]]: the (label, feature, w_micro) table
    * broadcasts as K primitive-keyed maps; each partition tokenizes,
    * hashes, counts once and evaluates all K exact integer logits; ties
    * break to the LEXICOGRAPHICALLY SMALLEST label (deterministic, the
    * marker-langid convention). Output: (doc_id, label, logit_micro). */
  def scoreTextClassifierMulti(docs: DataFrame, idCol: String,
      textCol: String, weights: DataFrame, dim: Int,
      bigrams: Boolean = true): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val spark = docs.sparkSession
    import spark.implicits._
    val wCount = weights.limit((1 << 22) + 2).count()
    require(wCount <= (1 << 22) + 1,
      "scoreTextClassifierMulti: weight table has > 2^22 + 1 rows — " +
        "not a trained model")
    val wRows = weights
      .select(col("label").cast("string"), col("feature").cast("long"),
        col("w_micro").cast("long"))
      .collect()
    val classes = wRows.map(_.getString(0)).distinct.sorted
    require(classes.nonEmpty, "scoreTextClassifierMulti: empty weight table")
    val intercepts = classes.map { c =>
      wRows.find(r => r.getString(0) == c && r.getLong(1) == -1L)
        .map(_.getLong(2)).getOrElse(0L)
    }
    val maps = classes.map { c =>
      val m = new scala.collection.mutable.LongMap[Long]()
      wRows.foreach { r =>
        if (r.getString(0) == c && r.getLong(1) >= 0L)
          m(r.getLong(1)) = r.getLong(2)
      }
      m
    }
    val bc = spark.sparkContext.broadcast((classes, intercepts, maps))
    val dimL = dim.toLong
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val (cls, bs, ws) = bc.value
        val k = cls.length
        val md = java.security.MessageDigest.getInstance("MD5")
        // per-partition memo, as in scoreTextClassifier (values unchanged)
        val memo = new java.util.HashMap[String, java.lang.Long](1 << 14)
        def feat(ngram: String): Long = {
          val hit = memo.get(ngram)
          if (hit != null) hit.longValue()
          else {
            md.reset()
            val dg = md.digest(ngram.getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
            val f = java.lang.Integer.toUnsignedLong(
              java.nio.ByteBuffer.wrap(dg).getInt) % dimL
            if (memo.size < (1 << 16)) memo.put(ngram, f)
            f
          }
        }
        val counts = new scala.collection.mutable.LongMap[Long]()
        rows.map { case (id, text) =>
          counts.clear()
          val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          var i = 0
          while (i < toks.length) {
            val f = feat(toks(i))
            counts(f) = counts.getOrElse(f, 0L) + 1L
            if (bigrams && i + 1 < toks.length) {
              val g = feat(toks(i) + " " + toks(i + 1))
              counts(g) = counts.getOrElse(g, 0L) + 1L
            }
            i += 1
          }
          var best = 0
          var bestLogit = Long.MinValue
          var c = 0
          while (c < k) {
            var logit = bs(c)
            val w = ws(c)
            counts.foreachEntry { (f, cnt) =>
              logit += cnt * w.getOrElse(f, 0L)
            }
            // strict >: classes iterate in sorted label order, so ties
            // keep the lexicographically smallest
            if (logit > bestLogit) { best = c; bestLogit = logit }
            c += 1
          }
          (id, cls(best), bestLogit)
        }
      }.toDF("doc_id", "label", "logit_micro")
  }

  /** Trained language ID — [[scoreTextClassifierMulti]] with the langid
    * column name: (doc_id, lang, logit_micro) under a
    * [[trainTextClassifierMulti]] model whose labels are language codes.
    * The upgrade path from [[TextStats.langId]]'s marker votes: same
    * deterministic tie-break, but the model is TRAINED, so languages
    * separate on their full hashed-ngram vocabulary instead of a
    * hand-listed marker set. */
  def langIdTrained(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int, bigrams: Boolean = true): DataFrame =
    scoreTextClassifierMulti(docs, idCol, textCol, weights, dim, bigrams)
      .withColumnRenamed("label", "lang")
}
