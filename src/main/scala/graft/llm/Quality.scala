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
    * once it is `<EMAIL>`). One compiled byte scan
    * ([[graft.expressions.PiiScrubExpr]] — property-pinned semantically
    * identical to the chained `regexp_replace` form): the regex form paid
    * per-row java.util.regex Matcher machinery and three string
    * round-trips where DuckDB's RE2 compiles to a DFA — tx6 measured 58×
    * its oracle at sf1 on exactly that. */
  def scrubPii(text: Column): Column =
    graft.functions.Cols.piiScrub(text)

  /** All three PII counts (on the original text — [[piiCount]]'s
    * independent-pattern semantics) plus the sequential scrub in ONE
    * compiled byte scan: struct(n_email, n_ip, n_phone, scrubbed). */
  def piiStats(text: Column): Column =
    graft.functions.Cols.piiStats(text)

  /** Unigram language model for perplexity-based quality scoring — the
    * CCNet-shaped recipe (there a KenLM 5-gram; the unigram form keeps the
    * same pipeline shape and a SQL-replayable contract): token counts over
    * a REFERENCE corpus (the "looks like good text" sample), pruned to the
    * top `vocab` tokens by count (ties by token ascending — deterministic
    * across engines). Tokens are lowercased `' '`-split ([[Dedup.tokens]]
    * semantics, shared with the dedup tier).
    *
    * Scale shape: per-partition PARTIAL COUNTING in a typed scan (each
    * task tallies tokens into a bounded hash map — flushed in chunks, so
    * adversarial vocabularies spill partials instead of memory — and
    * emits (token, partial) rows), then one vocab-shaped final sum and a
    * top-`vocab` TakeOrdered. Exactly the map-side-combine the old
    * explode → groupBy form relied on, minus the corpus-TOKEN-scale
    * generate operator materializing one row per token just to count it
    * (measured ~2× the scan cost at sf1; the shuffle was never the
    * problem — viral stopword keys always merged to longs). The model is
    * vocab-sized: broadcast it to score ([[lmPerplexity]]).
    *
    * Output: (token, cnt), ≤ `vocab` rows. Everything [[lmPerplexity]]
    * needs (total count N, vocab size V) derives from this table alone,
    * so a persisted model is self-contained. */
  def unigramLm(ref: DataFrame, textCol: String, vocab: Int): DataFrame = {
    require(vocab >= 1, s"unigramLm: vocab must be >= 1, got $vocab")
    tokenPartials(ref, textCol)
      .groupBy("token").agg(sum("cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(vocab)
  }

  /** Per-partition partial token counts over the TUNGSTEN rows of the
    * staged `Dedup.tokens` column — UTF8String views probe the hash map
    * and only DISTINCT tokens are cloned out of the reused row buffer
    * (the typed `Dataset[String]` route re-materialized every document
    * as a java String just to split it again — measured ~2× the kernel
    * cost at sf1). Output: ("token", "cnt") partials, exact under any
    * chunking; the caller's final sum merges them. */
  private def tokenPartials(ref: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.graft.PlanBridge
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val spark = ref.sparkSession
    val toks = ref.filter(col(textCol).isNotNull)
      .select(lower(col(textCol)).as("_lt"))
    val rdd = PlanBridge.toInternalRdd(toks).mapPartitions { rows =>
      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        private def fill(): Boolean = {
          while (!pending.hasNext && rows.hasNext) {
            val m = new java.util.HashMap[UTF8String, LongCnt]()
            while (rows.hasNext && m.size < PartialFlushAt) {
              // byte-level ' ' split over the lowered text (trailing
              // empties kept — ≡ Dedup.tokens), zero-copy views
              val text = rows.next().getUTF8String(0)
              val base = text.getBaseObject
              val off = text.getBaseOffset
              val nb = text.numBytes()
              var start = 0
              var i = 0
              while (i <= nb) {
                if (i == nb || org.apache.spark.unsafe.Platform
                    .getByte(base, off + i) == ' '.toByte) {
                  val t = UTF8String.fromAddress(base, off + start, i - start)
                  var c = m.get(t)
                  if (c == null) { c = new LongCnt; m.put(t.clone(), c) }
                  c.v += 1L
                  start = i + 1
                }
                i += 1
              }
            }
            import scala.jdk.CollectionConverters._
            pending = m.entrySet().asScala.iterator.map(e =>
              new GenericInternalRow(
                Array[Any](e.getKey, e.getValue.v)): InternalRow)
          }
          pending.hasNext
        }
        override def hasNext: Boolean = fill()
        override def next(): InternalRow = {
          if (!fill()) throw new NoSuchElementException("empty partition")
          pending.next()
        }
      }
    }
    PlanBridge.fromInternalRdd(spark, rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Partial-count map flush bound (entries) for the LM trainers — the
    * spill discipline of a hash aggregate, explicit: a partition whose
    * distinct-key count exceeds this emits its partials and starts a
    * fresh map (the final sum merges chunks exactly). Sized for ALL
    * partitions flushing concurrently: 2¹⁸ entries × ~150 B × 32 tasks
    * ≈ 1.2 GB — the 2²¹ bound OOM'd the 1 M-doc MixProbe fixture
    * (~20 M distinct tokens across tasks) where the old explode form
    * spilled; flushing earlier only sends more partial rows to the
    * exact final sum. */
  private val PartialFlushAt = 1 << 18

  /** Mutable long counter — hash-map values without per-increment boxing. */
  private final class LongCnt { var v: Long = 0L }

  /** Two-channel counter for [[tokenPartials2]]. */
  private final class LongCnt2 { var all: Long = 0L; var tgt: Long = 0L }

  /** Per-document perplexity under a [[unigramLm]] model — the CCNet-style
    * quality signal (filter or bucket a corpus by how language-like its
    * text is under a reference LM). Laplace smoothing over the pruned
    * vocab: with N = Σ cnt and V = model rows,
    * p(tok) = (cnt(tok) + 1) / (N + V + 1) for vocab tokens and
    * 1 / (N + V + 1) for out-of-vocabulary tokens (the `+ 1` numerator of
    * an unseen token — one uniform formula via `coalesce(cnt, 0)`).
    *
    * Scale shape: the whole statistic is DOC-LOCAL against a vocab-sized
    * model, so this is a ZERO-SHUFFLE compiled scan
    * ([[graft.expressions.NgramNll6]]): every per-token micro-nat
    * log-prob the chain can produce is pre-fixed-pointed on the DRIVER
    * and broadcast as primitive-keyed maps; each row tokenizes and sums
    * exact integers in one pass. The earlier declarative form (explode →
    * broadcast-hash join → doc_id aggregate) shuffled corpus-TOKEN-scale
    * (doc_id, lp6) rows — measured 24× its oracle at sf1 for per-row
    * math (the [[scoreTextClassifier]] anti-pattern).
    *
    * Determinism across engines (the differential-oracle contract): each
    * token's log-probability is fixed-pointed to MICRO-NATS
    * (`round(ln(p)·10⁶)` as a long — computed on the driver with the
    * exact algebra of Spark's `round`) BEFORE the per-doc sum, so
    * summation order cannot drift a last ulp — only ~V+1 DISTINCT ln
    * evaluations exist corpus-wide, and the per-doc sum is exact integer
    * math. The per-token MEAN stays integer too: `(2·Σ + n) div (2n)` is
    * half-away-from-zero division on positive longs (float division by n
    * would re-open the very midpoint boundary the fixed-point closed —
    * measured: 2 of 5000 docs at sf0.1 landed on a 6-decimal midpoint
    * where the engines' double rounding disagreed). nll is that integer
    * mean / 10⁶ — a value with exactly 6 decimals, bit-stable under
    * `round(…, 6)` in any engine; ppl = exp(nll) (identical input both
    * sides; exp's last-ulp is absorbed by the 6-decimal round except on
    * a measure-zero midpoint).
    *
    * Output: (doc_id, n_tokens, nll, ppl) per input ROW with non-null id
    * and text (ids are expected unique per the corpus contract —
    * duplicate-id rows each score their own text, the
    * [[repetitionStats]] convention), both rounded to 6 decimals. */
  def lmPerplexity(docs: DataFrame, model: DataFrame, idCol: String,
      textCol: String): DataFrame =
    scoreNll(docs, idCol, textCol,
      graft.expressions.LmModel.build(
        collectUniModel(model, "lmPerplexity"),
        Array.empty, Array.empty, backoff = 1.0, level = 1))

  /** Collect a vocab-capped (token, cnt) model table for broadcast
    * scoring — require-bounded (the [[scoreTextClassifier]] guard: a
    * mistakenly corpus-sized view must not collect onto the driver).
    * Null-token rows are skipped (the old join form ignored them by
    * null-never-equal). */
  private def collectUniModel(model: DataFrame, what: String)
      : Array[(String, Long)] = {
    val cap = (1 << 21) - 1
    // ONE execution: the limit bounds driver memory and the length check
    // detects overflow — a separate count() guard would run the model
    // pipeline (often a full corpus aggregation) twice
    val rows = model.select(col("token").cast("string"),
      col("cnt").cast("long")).limit(cap + 1).collect()
    require(rows.length <= cap,
      s"$what: model table has > $cap rows — not a vocab-capped LM table")
    rows.filter(!_.isNullAt(0)).map(r => (r.getString(0), r.getLong(1)))
  }

  /** Collect a vocab-capped (w1, w2, cnt, w1_cnt) bigram table. */
  private def collectBiModel(model: DataFrame, what: String)
      : Array[(String, String, Long, Long)] = {
    val cap = (1 << 21) - 1
    val rows = model.select(col("w1").cast("string"), col("w2").cast("string"),
        col("cnt").cast("long"), col("w1_cnt").cast("long"))
      .limit(cap + 1).collect()
    require(rows.length <= cap,
      s"$what: bigram table has > $cap rows — not a vocab-capped LM table")
    rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
  }

  /** The shared zero-shuffle scoring tail: broadcast the model, stage
    * the lowered text once, one compiled split-and-score NLL pass per
    * row ([[graft.expressions.NgramNll6]] — byte-level `' '` split,
    * zero-copy token views), then the integer mean / nll / ppl algebra
    * in column math (byte-identical to the old aggregate form — the
    * fixed point is the same; `' '`-split always yields ≥ 1 token, so
    * every row scores, exactly like the explode form). */
  private def scoreNll(docs: DataFrame, idCol: String, textCol: String,
      model: graft.expressions.LmModel): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), lower(col(textCol)).as("_lt"))
      .select(col("doc_id"),
        graft.functions.Cols.ngramNll6(col("_lt"), bc).as("_r"))
      .select(col("doc_id"), col("_r.n_tokens").as("n_tokens"),
        col("_r.s6").as("_s6"))
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
    * Scale shape: per-partition PARTIAL COUNTING in a typed scan (the
    * [[unigramLm]] discipline — bounded flushed maps, final sum), then a
    * broadcast join against the vocab-sized unigram table and a
    * top-`vocab` TakeOrdered. The old zip_with-structs → explode →
    * groupBy form materialized one struct ROW per corpus token just to
    * count adjacent pairs — the heaviest operator in the tx18 plan at
    * sf1. Output: (w1, w2, cnt, w1_cnt), ≤ `vocab` rows, model-scale. */
  def bigramLm(ref: DataFrame, textCol: String, uni: DataFrame,
      vocab: Int): DataFrame = {
    require(vocab >= 1, s"bigramLm: vocab must be >= 1, got $vocab")
    combinedPartials(ref, textCol, uni = false, tri = false)
      .filter(col("w2").isNotNull)
      .select(col("w1"), col("w2"), col("cnt"))
      .groupBy("w1", "w2").agg(sum("cnt").as("cnt"))
      .join(broadcast(uni.select(col("token").as("w1"),
        col("cnt").as("w1_cnt"))), Seq("w1"))
      .orderBy(col("cnt").desc, col("w1").asc, col("w2").asc)
      .limit(vocab)
  }

  /** Train the [[unigramLm]] + [[bigramLm]] pair in ONE corpus scan —
    * the KenLM-shaped trainer (all n-gram orders from one pass): the
    * partial-count kernel tallies tokens AND adjacent pairs together,
    * the merged distinct-gram table materializes once
    * (`localCheckpoint` — gram-distinct-sized, ≪ corpus; it is exactly
    * the table the separate trainers each rebuilt by re-scanning the
    * corpus), and both models derive from it. Output ≡
    * `(unigramLm(docs, textCol, uniVocab),
    *   bigramLm(docs, textCol, uni, biVocab))` bit for bit
    * (spec-pinned): same counts, same (cnt DESC, gram ASC) pruning.
    * The composed form costs 3 corpus scans (bigramLm re-executes the
    * unigram plan for its context join; a downstream scorer collects
    * uni again); this costs 1. */
  def ngramLm(docs: DataFrame, textCol: String, uniVocab: Int,
      biVocab: Int): (DataFrame, DataFrame) = {
    val (uni, bi, _) = ngramModels(docs, textCol, uniVocab, biVocab, 0)
    (uni, bi)
  }

  /** [[ngramLm]] extended one order: (uni, bi, tri) from ONE corpus
    * scan — tri ≡ `trigramLm(docs, textCol, bi, triVocab)` bit for bit
    * (spec-pinned). */
  def ngramLm3(docs: DataFrame, textCol: String, uniVocab: Int,
      biVocab: Int, triVocab: Int): (DataFrame, DataFrame, DataFrame) = {
    require(triVocab >= 1, s"ngramLm3: triVocab must be >= 1, got $triVocab")
    val (uni, bi, tri) = ngramModels(docs, textCol, uniVocab, biVocab,
      triVocab)
    (uni, bi, tri.get)
  }

  private def ngramModels(docs: DataFrame, textCol: String, uniVocab: Int,
      biVocab: Int, triVocab: Int)
      : (DataFrame, DataFrame, Option[DataFrame]) = {
    require(uniVocab >= 1, s"ngramLm: uniVocab must be >= 1, got $uniVocab")
    require(biVocab >= 1, s"ngramLm: biVocab must be >= 1, got $biVocab")
    // columnar spillable cache, NOT localCheckpoint: the gram table is
    // model-scale on real (Zipfian) corpora but can reach corpus scale
    // on adversarial all-unique vocabularies, where checkpointed
    // deserialized rows OOM'd — the columnar cache stores compact and
    // spills (probe-measured at 1M unique-token docs)
    val grams = combinedPartials(docs, textCol, uni = true,
      tri = triVocab > 0)
      .groupBy("w1", "w2", "w3").agg(sum("cnt").as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = grams.filter(col("w2").isNull && col("w3").isNull)
      .select(col("w1").as("token"), col("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(uniVocab)
      .localCheckpoint()
    val bi = grams.filter(col("w2").isNotNull && col("w3").isNull)
      .join(broadcast(uni.select(col("token").as("w1"),
        col("cnt").as("w1_cnt"))), Seq("w1"))
      .select(col("w1"), col("w2"), col("cnt"), col("w1_cnt"))
      .orderBy(col("cnt").desc, col("w1").asc, col("w2").asc)
      .limit(biVocab)
    if (triVocab <= 0) (uni, bi, None)
    else {
      val biCk = bi.localCheckpoint()
      val tri = grams.filter(col("w3").isNotNull)
        .join(broadcast(biCk.select(col("w1"), col("w2"),
          col("cnt").as("ctx_cnt"))), Seq("w1", "w2"))
        .select(col("w1"), col("w2"), col("w3"), col("cnt"), col("ctx_cnt"))
        .orderBy(col("cnt").desc, col("w1").asc, col("w2").asc,
          col("w3").asc)
        .limit(triVocab)
      (uni, biCk, Some(tri))
    }
  }

  /** Train the DSIR target + source [[unigramLm]] pair in ONE corpus
    * scan — the importance-resampling setup ([[lmLogRatio]]) always
    * trains the source model on the pool and the target model on a
    * SUBSET of it (`target` predicate; null ≡ false), so the two count
    * aggregations share every byte read. Output ≡
    * `(unigramLm(docs.filter(target)), unigramLm(docs))` bit for bit
    * (spec-pinned). The token-distinct table materializes once
    * (`localCheckpoint`) and both top-`vocab` prunes read it. */
  def dsirModels(docs: DataFrame, target: Column, textCol: String,
      vocab: Int): (DataFrame, DataFrame) = {
    require(vocab >= 1, s"dsirModels: vocab must be >= 1, got $vocab")
    val counts = tokenPartials2(docs, textCol, target)
      .groupBy("token").agg(sum("cnt_all").as("cnt_all"),
        sum("cnt_tgt").as("cnt_tgt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tgt = counts.filter(col("cnt_tgt") > 0)
      .select(col("token"), col("cnt_tgt").as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(vocab)
    val src = counts.select(col("token"), col("cnt_all").as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(vocab)
    (tgt, src)
  }

  /** The n-gram partial counter behind [[bigramLm]]/[[ngramLm]]/
    * [[ngramLm3]]/[[trigramLm]]: emits per-token rows
    * (w1, NULL, NULL, cnt) when `uni`, adjacent-pair rows
    * (w1, w2, NULL, cnt), and — when `tri` — adjacent-triple rows
    * (w1, w2, w3, cnt) from one pass over the lowered text (byte-level
    * `' '` split, the [[tokenPartials]] discipline). Tokens INTERN to
    * dense chunk-local ids on first sight (one clone per distinct
    * token), so pair/triple counting probes open Long maps keyed by
    * 21-bit id packing instead of hashing strings again. */
  private def combinedPartials(ref: DataFrame, textCol: String,
      uni: Boolean, tri: Boolean): DataFrame = {
    import org.apache.spark.sql.graft.PlanBridge
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val spark = ref.sparkSession
    val toks = ref.filter(col(textCol).isNotNull)
      .select(lower(col(textCol)).as("_lt"))
    val rdd = PlanBridge.toInternalRdd(toks).mapPartitions { rows =>
      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        private def fill(): Boolean = {
          while (!pending.hasNext && rows.hasNext) {
            val interner = new java.util.HashMap[UTF8String, Integer]()
            val names = new scala.collection.mutable.ArrayBuffer[UTF8String]()
            def intern(t: UTF8String): Int = {
              val hit = interner.get(t)
              if (hit != null) hit.intValue()
              else {
                val id = names.length
                val copy = t.clone()
                interner.put(copy, Integer.valueOf(id))
                names += copy
                id
              }
            }
            val um = new scala.collection.mutable.LongMap[Long]()
            val bm = new scala.collection.mutable.LongMap[Long]()
            val tm = new scala.collection.mutable.LongMap[Long]()
            // two independent flush bounds: distinct TOKENS (each costs
            // a cloned UTF8String + interner entry, and ids must stay
            // < 2^21 for the packing) and total long-map ENTRIES (16 B
            // each). Sized for 32 concurrent tasks flushing together.
            var entries = 0
            while (rows.hasNext && names.length < (1 << 19) &&
                entries < (1 << 20)) {
              val text = rows.next().getUTF8String(0)
              val base = text.getBaseObject
              val off = text.getBaseOffset
              val nb = text.numBytes()
              var prev = -1
              var prev2 = -1
              var start = 0
              var i = 0
              while (i <= nb) {
                if (i == nb || org.apache.spark.unsafe.Platform
                    .getByte(base, off + i) == ' '.toByte) {
                  val id = intern(
                    UTF8String.fromAddress(base, off + start, i - start))
                  if (uni) {
                    val uk = id.toLong
                    val c = um.getOrElse(uk, 0L)
                    if (c == 0L) entries += 1
                    um.update(uk, c + 1L)
                  }
                  if (prev >= 0) {
                    val bk = (prev.toLong << 21) | id
                    val c = bm.getOrElse(bk, 0L)
                    if (c == 0L) entries += 1
                    bm.update(bk, c + 1L)
                    if (tri && prev2 >= 0) {
                      val tk = (prev2.toLong << 42) | bk
                      val tc = tm.getOrElse(tk, 0L)
                      if (tc == 0L) entries += 1
                      tm.update(tk, tc + 1L)
                    }
                  }
                  prev2 = prev
                  prev = id
                  start = i + 1
                }
                i += 1
              }
            }
            pending =
              um.iterator.map { case (k, c) =>
                new GenericInternalRow(Array[Any](
                  names(k.toInt), null, null, c)): InternalRow
              } ++
              bm.iterator.map { case (k, c) =>
                new GenericInternalRow(Array[Any](
                  names((k >>> 21).toInt), names((k & 0x1FFFFF).toInt),
                  null, c)): InternalRow
              } ++
              tm.iterator.map { case (k, c) =>
                new GenericInternalRow(Array[Any](
                  names((k >>> 42).toInt),
                  names(((k >>> 21) & 0x1FFFFF).toInt),
                  names((k & 0x1FFFFF).toInt), c)): InternalRow
              }
          }
          pending.hasNext
        }
        override def hasNext: Boolean = fill()
        override def next(): InternalRow = {
          if (!fill()) throw new NoSuchElementException("empty partition")
          pending.next()
        }
      }
    }
    PlanBridge.fromInternalRdd(spark, rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w1",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("w2",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("w3",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** [[dsirModels]]' one-pass partial counter: (token, cnt_all,
    * cnt_tgt) — the target flag (null ≡ false) rides the staged
    * projection so both counts tally from one pass. */
  private def tokenPartials2(ref: DataFrame, textCol: String,
      target: Column): DataFrame = {
    import org.apache.spark.sql.graft.PlanBridge
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val spark = ref.sparkSession
    val toks = ref.filter(col(textCol).isNotNull)
      .select(lower(col(textCol)).as("_lt"),
        coalesce(target, lit(false)).as("_tgt"))
    val rdd = PlanBridge.toInternalRdd(toks).mapPartitions { rows =>
      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        private def fill(): Boolean = {
          while (!pending.hasNext && rows.hasNext) {
            val m = new java.util.HashMap[UTF8String, LongCnt2]()
            while (rows.hasNext && m.size < PartialFlushAt) {
              val row = rows.next()
              val text = row.getUTF8String(0)
              val tgt = row.getBoolean(1)
              val base = text.getBaseObject
              val off = text.getBaseOffset
              val nb = text.numBytes()
              var start = 0
              var i = 0
              while (i <= nb) {
                if (i == nb || org.apache.spark.unsafe.Platform
                    .getByte(base, off + i) == ' '.toByte) {
                  val t = UTF8String.fromAddress(base, off + start, i - start)
                  var c = m.get(t)
                  if (c == null) { c = new LongCnt2; m.put(t.clone(), c) }
                  c.all += 1L
                  if (tgt) c.tgt += 1L
                  start = i + 1
                }
                i += 1
              }
            }
            import scala.jdk.CollectionConverters._
            pending = m.entrySet().asScala.iterator.map(e =>
              new GenericInternalRow(Array[Any](
                e.getKey, e.getValue.all, e.getValue.tgt)): InternalRow)
          }
          pending.hasNext
        }
        override def hasNext: Boolean = fill()
        override def next(): InternalRow = {
          if (!fill()) throw new NoSuchElementException("empty partition")
          pending.next()
        }
      }
    }
    PlanBridge.fromInternalRdd(spark, rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cnt_all",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cnt_tgt",
          org.apache.spark.sql.types.LongType, nullable = false))))
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
    * Same scale + determinism contract as [[lmPerplexity]]: a
    * ZERO-SHUFFLE compiled scan against the broadcast models
    * ([[graft.expressions.NgramNll6]] at level 2 — every chain arm's
    * micro-nat fixed point precomputed on the driver), exact integer sum
    * and half-up integer mean, so engines cannot drift a last ulp. The
    * old explode → two broadcast joins → doc_id aggregate form paid
    * three corpus-token-scale operators for per-row math (6.0 s vs the
    * oracle's 1.08 s at sf1 on its debut). With `backoff = 1.0` and an
    * EMPTY bigram table this is bit-identical to [[lmPerplexity]]
    * (spec-pinned) — the fallback path IS the unigram model.
    *
    * Output: (doc_id, n_tokens, nll, ppl), rounded to 6 decimals. */
  def ngramPerplexity(docs: DataFrame, uni: DataFrame, bi: DataFrame,
      idCol: String, textCol: String, backoff: Double = 0.4): DataFrame = {
    require(backoff > 0.0 && backoff <= 1.0,
      s"ngramPerplexity: backoff must be in (0, 1], got $backoff")
    scoreNll(docs, idCol, textCol,
      graft.expressions.LmModel.build(
        collectUniModel(uni, "ngramPerplexity"),
        collectBiModel(bi, "ngramPerplexity"),
        Array.empty, backoff, level = 2))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): assign each
    * document to `head` / `middle` / `tail` by its [[ngramPerplexity]]
    * under a reference LM and two fixed thresholds (`ppl < t1` → head,
    * `< t2` → middle, else tail). CCNet calibrates the cutoffs once per
    * language from a sample, then applies them corpus-wide — applying
    * them IS this operator, and it stays a pure scan: the zero-shuffle
    * compiled NLL pass plus a CASE, no shuffle at any corpus size. The
    * bucket column feeds [[Sampling.mixSample]] for the classic
    * keep-head / downsample-tail recipe (both row-local → the composed
    * pipeline never exchanges).
    *
    * Output: (doc_id, n_tokens, nll, ppl, bucket) — the comparison runs
    * on the 6-decimal-rounded ppl, so both engines bucket identically. */
  def pplBuckets(docs: DataFrame, uni: DataFrame, bi: DataFrame,
      idCol: String, textCol: String, t1: Double, t2: Double,
      backoff: Double = 0.4): DataFrame = {
    require(t1 > 0.0 && t2 > t1,
      s"pplBuckets: need 0 < t1 < t2, got t1=$t1 t2=$t2")
    ngramPerplexity(docs, uni, bi, idCol, textCol, backoff)
      .withColumn("bucket",
        when(col("ppl") < t1, lit("head"))
          .when(col("ppl") < t2, lit("middle"))
          .otherwise(lit("tail")))
  }

  /** Per-document perplexity under an interpolated Kneser–Ney bigram
    * model (Kneser & Ney 1995; Chen & Goodman 1999) — the smoothing the
    * stupid-backoff chain ([[ngramPerplexity]]) approximates: instead of
    * a constant α, unseen bigrams back off through a per-context weight
    * λ(w1) = d·N1+(w1,·)/c(w1) into the CONTINUATION distribution
    * Pcont(w2) ∝ N1+(·,w2) (how many contexts a word completes, not how
    * often it occurs — "francisco" is frequent but completes only
    * "san"), and seen bigrams are discounted by `d` and interpolated
    * with the same mass: p = max(c−d,0)/c(w1) + λ(w1)·Pcont(w2). Both
    * continuation statistics derive from the SAME vocab-capped
    * `(unigramLm, bigramLm)` tables the backoff scorer takes, so any
    * persisted model of that shape is KN-scorable with no retraining.
    *
    * Same zero-shuffle compiled scan and micro-nat determinism contract
    * as [[ngramPerplexity]] ([[graft.expressions.NgramNll6]] with the
    * KN-built model — [[graft.expressions.LmModel.buildKn]] documents
    * the exact per-arm rounding the oracle replays).
    *
    * Output: (doc_id, n_tokens, nll, ppl), rounded to 6 decimals. */
  def knPerplexity(docs: DataFrame, uni: DataFrame, bi: DataFrame,
      idCol: String, textCol: String, discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"knPerplexity: discount must be in (0, 1), got $discount")
    scoreNll(docs, idCol, textCol,
      graft.expressions.LmModel.buildKn(
        collectUniModel(uni, "knPerplexity"),
        collectBiModel(bi, "knPerplexity"), discount))
  }

  /** Trigram counts over a REFERENCE corpus — the next order of the
    * [[bigramLm]] tier (CCNet's actual recipe is a 5-gram KenLM; each
    * order closes more of that gap). Triples are adjacent
    * [[Dedup.tokens]]; only triples whose CONTEXT pair (w1, w2) survived
    * the `bi` vocab cap are kept (the bigramLm context rule, one order
    * up — a trigram without a denominator count cannot be scored), then
    * pruned to the top `vocab` by count (ties by (w1, w2, w3) ascending).
    * Each row carries its context count, so a persisted model is
    * self-contained.
    *
    * Scale shape: one (w1, w2, w3) partial-count aggregation (the
    * [[tokenPartials]] kernel discipline via [[combinedPartials]]'
    * composed form here would re-scan — this compose form counts
    * directly), a broadcast join against the model-scale bigram table,
    * a top-`vocab` TakeOrdered. Output: (w1, w2, w3, cnt, ctx_cnt),
    * ≤ `vocab` rows. Prefer [[ngramLm3]] to train all three orders in
    * ONE corpus scan. */
  def trigramLm(ref: DataFrame, textCol: String, bi: DataFrame,
      vocab: Int): DataFrame = {
    require(vocab >= 1, s"trigramLm: vocab must be >= 1, got $vocab")
    combinedPartials(ref, textCol, uni = false, tri = true)
      .filter(col("w3").isNotNull)
      .groupBy("w1", "w2", "w3").agg(sum("cnt").as("cnt"))
      .join(broadcast(bi.select(col("w1"), col("w2"),
        col("cnt").as("ctx_cnt"))), Seq("w1", "w2"))
      .select(col("w1"), col("w2"), col("w3"), col("cnt"), col("ctx_cnt"))
      .orderBy(col("cnt").desc, col("w1").asc, col("w2").asc,
        col("w3").asc)
      .limit(vocab)
  }

  /** Per-document perplexity under the trigram stupid-backoff chain
    * (Brants et al. 2007, one order above [[ngramPerplexity]]):
    *
    *   - token 1: Laplace-smoothed unigram ([[lmPerplexity]]'s formula);
    *   - token 2: known bigram relative frequency, else `backoff` ×
    *     smoothed unigram (exactly the bigram chain);
    *   - token i ≥ 3: known trigram cnt/ctx_cnt; else `backoff` × the
    *     bigram relative frequency; else `backoff²` × smoothed unigram.
    *
    * Same zero-shuffle compiled scan and micro-nat determinism contract
    * as [[ngramPerplexity]] ([[graft.expressions.NgramNll6]] at level
    * 3). With an EMPTY trigram table and `backoff = 1.0` this is
    * bit-identical to `ngramPerplexity(…, backoff = 1.0)` (spec-pinned
    * — the α factors collapse to 1).
    *
    * Output: (doc_id, n_tokens, nll, ppl), rounded to 6 decimals. */
  def trigramPerplexity(docs: DataFrame, uni: DataFrame, bi: DataFrame,
      tri: DataFrame, idCol: String, textCol: String,
      backoff: Double = 0.4): DataFrame = {
    require(backoff > 0.0 && backoff <= 1.0,
      s"trigramPerplexity: backoff must be in (0, 1], got $backoff")
    scoreNll(docs, idCol, textCol,
      graft.expressions.LmModel.build(
        collectUniModel(uni, "trigramPerplexity"),
        collectBiModel(bi, "trigramPerplexity"),
        collectTriModel(tri, "trigramPerplexity"), backoff, level = 3))
  }

  /** Collect a vocab-capped (w1, w2, w3, cnt, ctx_cnt) trigram table. */
  private def collectTriModel(model: DataFrame, what: String)
      : Array[(String, String, String, Long, Long)] = {
    val cap = (1 << 21) - 1
    val rows = model.select(col("w1").cast("string"),
        col("w2").cast("string"), col("w3").cast("string"),
        col("cnt").cast("long"), col("ctx_cnt").cast("long"))
      .limit(cap + 1).collect()
    require(rows.length <= cap,
      s"$what: trigram table has > $cap rows — not a vocab-capped LM table")
    rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
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
  /** The seven Gopher signals from the two PRE-STAGED count structs
    * ([[graft.expressions.GopherWordCounts]] over the lowered text,
    * [[graft.expressions.GopherRawCounts]] over the raw text) —
    * `gopherRules` stages both as their own projection columns so each
    * kernel runs once per row (the Quadrants lesson: source-level
    * sharing, not hoped-for codegen CSE). The fraction/rounding algebra
    * is value-identical to the split-array form it replaced (the counts
    * are the same integers; `n_ellipsis` is exact — `replace`'s removal
    * count is always a multiple of 3, so the old double division was
    * integer-valued too), which two split() materializations, a
    * per-line regex Matcher, and two full-text string rebuilds used to
    * compute (tx9 measured 2.8 s vs its 0.12 s oracle at sf1). */
  private def gopherSignalsFrom(wc: Column, rc: Column):
      (Column, Column, Column, Column, Column, Column, Column) = {
    val nW = wc.getField("n_words")
    val meanWl = round(
      (rc.getField("n_chars") - nW + 1).cast("double") / nW, 6)
    val symbolRatio = round((rc.getField("n_hash") +
      rc.getField("n_ellipsis")).cast("double") / nW, 6)
    val nL = rc.getField("n_lines")
    val bulletFrac = round(
      rc.getField("n_bullet").cast("double") / nL, 6)
    val ellipsisFrac = round(
      rc.getField("n_ell_lines").cast("double") / nL, 6)
    val alphaFrac = round(
      wc.getField("n_alpha").cast("double") / nW, 6)
    (nW, meanWl, symbolRatio, bulletFrac, ellipsisFrac,
      alphaFrac, wc.getField("stop_hits"))
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
    // ONE fused compiled expression — both count kernels plus the
    // threshold algebra at the identical round(…, 6) fixed point
    // (graft.expressions.GopherPassExpr); the text lowers once inside
    // the binary expression, and no arrays / rebuilt strings ever
    // materialize. Value-identical to the signal-column conjunction.
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.GopherPassExpr(
      ColumnBridge.expression(t), ColumnBridge.expression(lower(t)),
      stops, sep, minWords, maxWords, minMeanWordLen, maxMeanWordLen,
      maxSymbolRatio, maxBulletFrac, maxEllipsisFrac, minAlphaWordFrac,
      minStopHits))
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
    // stage the two count structs as their own projection columns
    // (computed once per row; four signals share the word counts, four
    // the raw counts — inlined they would re-evaluate per signal)
    Seq("__gwc", "__grc").foreach(c => require(!docs.columns.contains(c),
      s"gopherRules stages a '$c' column; the input already has one — " +
        "rename it first"))
    val (nW, meanWl, symbolRatio, bulletFrac, ellipsisFrac, alphaFrac,
      stopHits) = gopherSignalsFrom(col("__gwc"), col("__grc"))
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .withColumns(Map(
        "__gwc" -> graft.functions.Cols.gopherWordCounts(
          lower(col(textCol)), stops),
        "__grc" -> graft.functions.Cols.gopherRawCounts(col(textCol), sep)))
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
    * Same scale and determinism contract as [[lmPerplexity]]: two
    * zero-shuffle compiled NLL passes over the SAME staged token array
    * (one per broadcast model — the per-token ratio sum Σ(lpT − lpS)
    * equals ΣlpT − ΣlpS exactly in integer micro-nats), no explode, no
    * join, no aggregate.
    *
    * Output: (doc_id, n_tokens, log_ratio, log_ratio_mean) — the summed
    * and per-token ratios in nats, rounded to 6 decimals. */
  def lmLogRatio(docs: DataFrame, targetLm: DataFrame, sourceLm: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val sc = docs.sparkSession.sparkContext
    val bcT = sc.broadcast(graft.expressions.LmModel.build(
      collectUniModel(targetLm, "lmLogRatio(target)"),
      Array.empty, Array.empty, backoff = 1.0, level = 1))
    val bcS = sc.broadcast(graft.expressions.LmModel.build(
      collectUniModel(sourceLm, "lmLogRatio(source)"),
      Array.empty, Array.empty, backoff = 1.0, level = 1))
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), lower(col(textCol)).as("_lt"))
      .select(col("doc_id"),
        graft.functions.Cols.ngramNll6(col("_lt"), bcT).as("_rt"),
        graft.functions.Cols.ngramNll6(col("_lt"), bcS).as("_rs"))
      .select(col("doc_id"), col("_rt.n_tokens").as("n_tokens"),
        (col("_rt.s6") - col("_rs.s6")).as("_s6"))
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
    * grouping key: one more label than the LONGEST matching registry
    * suffix (PSL longest-match rule; no match ⇒ the last two labels);
    * IPv4 hosts, one- or two-label hosts, and hosts that ARE a suffix
    * pass through whole. `suffixes` is the wildcard-free public-suffix
    * list — the embedded [[SecondLevelSuffixes]] subset by default, the
    * FULL PSL via [[suffixesFromTable]] (registrable-domain extraction
    * is an algorithm plus a DATA file; suffixes of any label depth
    * compose into the same longest-first chain, each depth one InSet
    * membership probe — pure column math, scan-speed at any list
    * size). */
  def registrableDomain(url: Column,
      suffixes: Seq[String] = SecondLevelSuffixes): Column = {
    require(suffixes.nonEmpty, "registrableDomain: empty suffix list")
    require(suffixes.forall(s => s.nonEmpty && !s.startsWith(".") &&
        !s.endsWith(".") && !s.contains("*")),
      "registrableDomain: suffixes must be wildcard-free dot-separated " +
        "labels (resolve PSL wildcard rules before passing the table)")
    val h = urlHost(url)
    val labels = split(h, "\\.")
    val n = size(labels)
    val byDepth = suffixes.groupBy(_.count(_ == '.') + 1)
    val default = concat_ws(".", slice(labels, n - 1, lit(2)))
    // longest-first when-chain: depth-k suffix match takes k+1 labels
    // (or the whole host when the host IS the suffix)
    val chain = byDepth.keys.toSeq.sorted.reverse
      .foldRight(default) { (k, rest) =>
        val lastK = concat_ws(".", slice(labels, n - (k - 1), lit(k)))
        when(n > k && lastK.isInCollection(byDepth(k)),
            concat_ws(".", slice(labels, n - k, lit(k + 1))))
          .when(n === k && lastK.isInCollection(byDepth(k)), h)
          .otherwise(rest)
      }
    when(h.rlike("^[0-9.]+$") || n <= 2, h).otherwise(chain)
  }

  /** Collect a one-column suffix CONFIG TABLE (e.g. the full Public
    * Suffix List loaded as a parquet/CSV) into the `suffixes` argument —
    * driver-bounded require (the PSL is ~10⁴ rows; a mistakenly
    * corpus-sized view must not collect). Null rows are skipped. */
  def suffixesFromTable(table: DataFrame,
      suffixCol: String = "suffix"): Seq[String] = {
    val cap = (1 << 17) - 1
    val rows = table.select(col(suffixCol).cast("string"))
      .limit(cap + 1).collect()
    require(rows.length <= cap,
      s"suffixesFromTable: > $cap rows — not a public-suffix config table")
    rows.filter(!_.isNullAt(0)).map(_.getString(0)).toSeq
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
      textCol: String, stops: Seq[String],
      suffixes: Seq[String] = SecondLevelSuffixes): DataFrame =
    docs.filter(col(idCol).isNotNull && col(urlCol).isNotNull &&
        col(textCol).isNotNull)
      .select(registrableDomain(col(urlCol), suffixes).as("domain"),
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

  /** `id` cast to long, erroring LOUDLY on a non-castable value — the
    * classifier family keys every join/scan by a LONG doc id, and a
    * silent null cast would make gates built on these scores fail
    * closed (a left-semi language gate would drop the ENTIRE corpus)
    * or fail open (a left-anti floor would drop nothing) with no
    * diagnostic. One per-row null check in the scan; null RAW ids are
    * filtered before this ever evaluates. */
  private def longId(id: Column): Column =
    when(id.cast("long").isNotNull, id.cast("long"))
      .otherwise(raise_error(concat(
        lit("graft classifier: doc id not castable to long: "),
        id.cast("string"))).cast("long"))

  /** Per-partition hashed-ngram featurizer over LOWERED text BYTES —
    * the scorer-side twin of [[hashedTextFeatures]] (spec-pinned equal:
    * the md5-low-32-mod-dim values are over the identical UTF-8 bytes).
    * Tokenizes by byte-level `' '` split (zero-copy views; the old
    * typed scan re-materialized every ngram as a java String just to
    * hash it), and exploits that a BIGRAM's bytes are CONTIGUOUS in the
    * source (the separator is exactly the single space the tokenizer
    * splits on), so bigram hashing is a longer view — no concatenation.
    * Memo: distinct ngrams clone once (bounded, droppable — values are
    * pure). */
  private final class NgramFeaturizer(dim: Long, bigrams: Boolean) {
    private val md = java.security.MessageDigest.getInstance("MD5")
    private val memo =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
        java.lang.Long](1 << 14)
    private var scratch = new Array[Byte](256)
    val counts = new scala.collection.mutable.LongMap[Long]()

    private def featOf(u: org.apache.spark.unsafe.types.UTF8String): Long = {
      val hit = memo.get(u)
      if (hit != null) return hit.longValue()
      val len = u.numBytes()
      if (scratch.length < len)
        scratch = new Array[Byte](math.max(len, scratch.length * 2))
      u.writeToMemory(scratch,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
      md.reset()
      md.update(scratch, 0, len)
      val d = md.digest()
      val f = java.lang.Integer.toUnsignedLong(
        java.nio.ByteBuffer.wrap(d).getInt) % dim
      if (memo.size < (1 << 16))
        memo.put(u.clone(), java.lang.Long.valueOf(f))
      f
    }

    /** Hashed uni(+bi)gram feature counts of the lowered text into
      * [[counts]] (cleared first). */
    def featurize(text: org.apache.spark.unsafe.types.UTF8String): Unit = {
      counts.clear()
      val base = text.getBaseObject
      val off = text.getBaseOffset
      val nb = text.numBytes()
      var prevStart = -1
      var prevLen = 0
      var start = 0
      var i = 0
      while (i <= nb) {
        if (i == nb || org.apache.spark.unsafe.Platform
            .getByte(base, off + i) == ' '.toByte) {
          val tokLen = i - start
          val f = featOf(org.apache.spark.unsafe.types.UTF8String
            .fromAddress(base, off + start, tokLen))
          counts.update(f, counts.getOrElse(f, 0L) + 1L)
          if (bigrams && prevStart >= 0) {
            val g = featOf(org.apache.spark.unsafe.types.UTF8String
              .fromAddress(base, off + prevStart, prevLen + 1 + tokLen))
            counts.update(g, counts.getOrElse(g, 0L) + 1L)
          }
          prevStart = start
          prevLen = tokLen
          start = i + 1
        }
        i += 1
      }
    }
  }

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
      .select(longId(col(idCol)).as("doc_id"),
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
    val labels = base.select(longId(col(idCol)).as("doc_id"),
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
    // intercept) — a mistakenly corpus-sized view must not collect onto
    // the driver. One single-task bounded collect serves as both the
    // guard and the read: coalesce(1) serializes the scan, the limit
    // short-circuits a runaway table after 2^22 + 2 rows, and the
    // length check below refuses it — the separate full-width count()
    // job the guard used to pay is gone.
    val wRows = weights
      .select(col("feature").cast("long"), col("w_micro").cast("long"))
      .coalesce(1).limit((1 << 22) + 2)
      .collect()
    require(wRows.length <= (1 << 22) + 1,
      s"scoreTextClassifier: weight table has > 2^22 + 1 rows — not a " +
        "trained model (pass trainTextClassifier output, nonzero " +
        "weights + intercept)")
    val intercept = wRows.find(_.getLong(0) == -1L)
      .map(_.getLong(1)).getOrElse(0L)
    val wMap = {
      val m = new scala.collection.mutable.LongMap[Long](wRows.length)
      wRows.foreach(r => if (r.getLong(0) >= 0L) m(r.getLong(0)) = r.getLong(1))
      m
    }
    val bc = spark.sparkContext.broadcast(wMap)
    val dimL = dim.toLong
    // md5-low-32 mod dim — bit-identical to the column path's
    // conv(substring(md5(ngram), 1, 8), 16, 10) % dim (first 8 hex
    // chars = the first 4 digest bytes, big-endian, unsigned); the
    // byte-level featurizer hashes the identical UTF-8 bytes the old
    // String path encoded. Tungsten rows in, Tungsten rows out
    // ([[org.apache.spark.sql.graft.PlanBridge]]).
    import org.apache.spark.sql.graft.PlanBridge
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val in = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(longId(col(idCol)).as("_id"), lower(col(textCol)).as("_lt"))
    val rdd = PlanBridge.toInternalRdd(in).mapPartitions { rows =>
      val w = bc.value
      val fz = new NgramFeaturizer(dimL, bigrams)
      rows.map { r =>
        val id = r.getLong(0)
        fz.featurize(r.getUTF8String(1))
        var logit = intercept
        fz.counts.foreachEntry { (f, cnt) =>
          logit += cnt * w.getOrElse(f, 0L)
        }
        new GenericInternalRow(
          Array[Any](id, fz.counts.size.toLong, logit)): InternalRow
      }
    }
    PlanBridge.fromInternalRdd(spark, rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_feats",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("logit_micro",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** HALF_UP (half away from zero) fixed-point rounding of a finite
    * double to a Long — the cross-engine rounding every oracle replays
    * (`java.math.RoundingMode.HALF_UP` ≡ DuckDB `round()` on doubles;
    * `Math.round` would differ on negative ties). */
  private def halfAway(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** DISTRIBUTED full-batch gradient-descent trainer for the quality
    * classifier — the corpus-scale counterpart of the driver kernel
    * [[trainTextClassifier]], for when the labeled set outgrows a
    * driver collect (the 100-TB regime: label by weak supervision —
    * a reference-corpus join, a heuristic floor — and millions of
    * labeled documents result; `maxTrainDocs` there is 200 k).
    *
    * Shape per iteration (ALL corpus-sized work is one zero-shuffle
    * scan): documents are featurized ONCE into a cached corpus of
    * `(y, features, counts)` primitive arrays (the
    * [[scoreTextClassifier]] byte-level featurizer — spec-pinned equal
    * to [[hashedTextFeatures]]); each iteration maps over the cache
    * computing every document's exact integer logit against the
    * broadcast weights, fixed-points the logistic residual to
    * micro-units, and partially aggregates `feature → Σ gm·cnt` INSIDE
    * the partition, so the only exchange per iteration is the
    * dim-bounded gradient table (map-side-combined `reduceByKey`,
    * ≤ `dim`+1 rows collected — the same driver-bounded contract as a
    * centroid collect). Weight update runs on the driver in integer
    * micro-units and re-broadcasts.
    *
    * Determinism/oracle contract (what makes a TRAINER hash-gateable —
    * [[trainTextClassifier]] is float-sequential and only spec-gated):
    * weights are integer micro-units at ALL times, so per-document
    * logits are exact integers in any evaluation order; per-document
    * residuals fix-point as `gm = HALF_UP((σ(z_micro/1e6) − y)·1e6)`
    * (the only transcendental, quantized immediately — the tx8
    * micro-nat recipe); gradient sums are exact integer sums
    * (order-free); the update
    * `w ← w − HALF_UP(lr·(S/n + l2·w))`,
    * `b ← b − HALF_UP(lr·Sb/n)` computes one IEEE expression from
    * exact integers on both engines. A DuckDB oracle replays training
    * by unrolling iterations as CTEs (see `tx22`); iteration 1 from
    * zero weights is even exp-free (σ(0) = 1/2 exactly).
    *
    * Long bounds: |gm| ≤ 1e6, so a feature's gradient sum |S| ≤
    * 1e6·Σcnt — safe through ~9×10¹² corpus tokens; per-document
    * logits need |Σ cnt·w_micro| < 2⁶³, comfortable for any real
    * weight scale (|w| ≤ 10³ ⇒ ~4×10⁹ tokens per document).
    *
    * Output: (feature, w_micro) — nonzero integer micro-unit weights
    * plus the intercept at feature = −1; drop-in for
    * [[scoreTextClassifier]]. Same duplicate-label refusal as the
    * driver kernel; labels must be exactly {0, 1}-valued. */
  def trainTextClassifierGd(labeled: DataFrame, idCol: String,
      textCol: String, labelCol: String, dim: Int = 1 << 18,
      bigrams: Boolean = true, iters: Int = 10, lr: Double = 0.5,
      l2: Double = 0.0): DataFrame = {
    require(dim >= 2 && dim <= (1 << 22),
      s"dim must be in [2, 2^22], got $dim (the driver holds one " +
        "dense dim-long weight vector; the per-iteration collect is " +
        "dim-bounded)")
    require(iters >= 1 && iters <= 10000, s"iters must be in [1, 10000], got $iters")
    require(lr > 0.0 && lr.isFinite, s"lr must be finite > 0, got $lr")
    require(l2 >= 0.0 && l2.isFinite, s"l2 must be finite >= 0, got $l2")
    val spark = labeled.sparkSession
    import spark.implicits._
    val base = labeled.filter(col(idCol).isNotNull &&
      col(textCol).isNotNull && col(labelCol).isNotNull)
    // duplicate ids would double-count every feature of the document in
    // each gradient — refuse malformed input (the trainTextClassifier
    // contract), distributed instead of collected
    val dup = base.select(longId(col(idCol)).as("_id"))
      .groupBy("_id").agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"trainTextClassifierGd: duplicate labeled doc_id " +
        s"${dup.headOption.map(_.getLong(0)).getOrElse(-1L)} — label " +
        "each document exactly once (dedup before training)")
    import org.apache.spark.sql.graft.PlanBridge
    val in = base.select(lower(col(textCol)).as("_lt"),
      col(labelCol).cast("int").as("_y"))
    val dimL = dim.toLong
    // featurize ONCE into compact primitive arrays — iterations re-scan
    // hashed integers, never text
    val feats = PlanBridge.toInternalRdd(in).mapPartitions { rows =>
      val fz = new NgramFeaturizer(dimL, bigrams)
      rows.map { r =>
        fz.featurize(r.getUTF8String(0))
        val y = r.getInt(1)
        val k = fz.counts.size
        val fs = new Array[Int](k)
        val cs = new Array[Long](k)
        var i = 0
        fz.counts.foreachEntry { (f, c) => fs(i) = f.toInt; cs(i) = c; i += 1 }
        (y, fs, cs)
      }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val labelHist = feats.map(t => (t._1, 1L)).reduceByKey(_ + _)
        .collect().toMap
      val n = labelHist.valuesIterator.sum
      require(n >= 1, "trainTextClassifierGd: no labeled documents")
      require(labelHist.keySet.subsetOf(Set(0, 1)),
        s"trainTextClassifierGd: labels must be 0/1, got " +
          s"${labelHist.keySet.toSeq.sorted.mkString(",")}")
      val sc = spark.sparkContext
      val w = new Array[Long](dim)
      var b = 0L
      var it = 0
      while (it < iters) {
        val bcW = sc.broadcast(w)
        val bLoc = b
        val sums = feats.mapPartitions { docs =>
          val wv = bcW.value
          val grad = new scala.collection.mutable.LongMap[Long]()
          var gb = 0L
          docs.foreach { case (y, fs, cs) =>
            var z = bLoc
            var i = 0
            while (i < fs.length) { z += cs(i) * wv(fs(i)); i += 1 }
            val p = 1.0 / (1.0 + math.exp(-(z.toDouble / 1e6)))
            val gm = halfAway((p - y) * 1e6)
            gb += gm
            i = 0
            while (i < fs.length) {
              val f = fs(i).toLong
              grad.update(f, grad.getOrElse(f, 0L) + gm * cs(i))
              i += 1
            }
          }
          grad.iterator ++ Iterator((-1L, gb))
        }.reduceByKey(_ + _).collect()
        bcW.destroy()
        var gbSum = 0L
        val gArr = new Array[Long](dim)
        sums.foreach { case (f, s) =>
          if (f == -1L) gbSum = s else gArr(f.toInt) = s
        }
        var f = 0
        while (f < dim) {
          val s = gArr(f)
          if (s != 0L || w(f) != 0L)
            w(f) -= halfAway(lr * (s.toDouble / n + l2 * w(f)))
          f += 1
        }
        b -= halfAway(lr * (gbSum.toDouble / n))
        it += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      out += ((-1L, b))
      var f = 0
      while (f < dim) {
        if (w(f) != 0L) out += ((f.toLong, w(f)))
        f += 1
      }
      out.toSeq.toDF("feature", "w_micro")
    } finally { feats.unpersist(blocking = false); () }
  }

  /** Multi-class (softmax) counterpart of [[trainTextClassifierGd]] —
    * the DISTRIBUTED trainer behind corpus-scale language ID, for when
    * the labeled set outgrows [[trainTextClassifierMulti]]'s driver
    * collect. Same per-iteration shape (one zero-shuffle scan over the
    * featurized cache + a model-bounded map-side-combined `reduceByKey`
    * collect) and the same integer determinism contract: per-document
    * per-class logits are exact integer dots against micro-unit
    * weights; softmax residuals max-shift on the exact integer maximum
    * and sum `exp((z_c − M)/1e6)` in SORTED CLASS ORDER (the one float
    * reduction, canonically ordered), then fix-point per class as
    * `gm_c = HALF_UP((p_c − 1{y=c})·1e6)`; gradient sums and updates
    * are the binary trainer's exact integer recursion per class.
    *
    * Classes are the sorted distinct label strings (the
    * [[trainTextClassifierMulti]] contract: sorted order makes training
    * bit-deterministic); K·dim is bounded so the broadcast weights and
    * the per-iteration gradient collect stay model-sized.
    *
    * Output: (label, feature, w_micro) — per-class nonzero micro-unit
    * weights, intercepts at feature = −1 (every class emits its
    * intercept row); drop-in for [[scoreTextClassifierMulti]] /
    * [[langIdTrained]]. */
  def trainTextClassifierMultiGd(labeled: DataFrame, idCol: String,
      textCol: String, labelCol: String, dim: Int = 1 << 18,
      bigrams: Boolean = true, iters: Int = 10, lr: Double = 0.5,
      l2: Double = 0.0): DataFrame = {
    require(dim >= 2 && dim <= (1 << 20),
      s"dim must be in [2, 2^20], got $dim (K dense dim-long vectors " +
        "broadcast per iteration)")
    require(iters >= 1 && iters <= 10000, s"iters must be in [1, 10000], got $iters")
    require(lr > 0.0 && lr.isFinite, s"lr must be finite > 0, got $lr")
    require(l2 >= 0.0 && l2.isFinite, s"l2 must be finite >= 0, got $l2")
    val spark = labeled.sparkSession
    import spark.implicits._
    val base = labeled.filter(col(idCol).isNotNull &&
      col(textCol).isNotNull && col(labelCol).isNotNull)
    val dup = base.select(longId(col(idCol)).as("_id"))
      .groupBy("_id").agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"trainTextClassifierMultiGd: duplicate labeled doc_id " +
        s"${dup.headOption.map(_.getLong(0)).getOrElse(-1L)} — label " +
        "each document exactly once (dedup before training)")
    import org.apache.spark.sql.graft.PlanBridge
    val in = base.select(lower(col(textCol)).as("_lt"),
      col(labelCol).cast("string").as("_y"))
    val dimL = dim.toLong
    // class inventory first (a sorted label-distinct — label-cardinality
    // rows), so the featurized cache can carry compact class indices
    val classes = in.select(col("_y")).distinct()
      .collect().map(_.getString(0)).sorted
    val k = classes.length
    require(k >= 2, s"trainTextClassifierMultiGd: need >= 2 classes, got $k")
    require(k.toLong * dim <= (1L << 24),
      s"trainTextClassifierMultiGd: K*dim = ${k.toLong * dim} exceeds " +
        "2^24 — the broadcast model and per-iteration gradient collect " +
        "are bounded by K*dim")
    val classIdx = classes.zipWithIndex.toMap
    val bcIdx = spark.sparkContext.broadcast(classIdx)
    val feats = PlanBridge.toInternalRdd(in).mapPartitions { rows =>
      val fz = new NgramFeaturizer(dimL, bigrams)
      val idx = bcIdx.value
      rows.map { r =>
        fz.featurize(r.getUTF8String(0))
        val y = idx(r.getUTF8String(1).toString)
        val nf = fz.counts.size
        val fs = new Array[Int](nf)
        val cs = new Array[Long](nf)
        var i = 0
        fz.counts.foreachEntry { (f, c) => fs(i) = f.toInt; cs(i) = c; i += 1 }
        (y, fs, cs)
      }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = feats.count()
      require(n >= 1, "trainTextClassifierMultiGd: no labeled documents")
      val sc = spark.sparkContext
      // w(c)(f) micro-units; gradient keys pack (class, feature) into
      // one long: c * 2^22 + f (f < 2^22 by the dim guard); intercept
      // partials at -(c + 1)
      val w = Array.ofDim[Long](k, dim)
      val b = new Array[Long](k)
      var it = 0
      while (it < iters) {
        val bcW = sc.broadcast(w)
        val bcB = sc.broadcast(b)
        val kk = k
        val sums = feats.mapPartitions { docs =>
          val wv = bcW.value
          val bv = bcB.value
          val grad = new scala.collection.mutable.LongMap[Long]()
          val z = new Array[Long](kk)
          val e = new Array[Double](kk)
          docs.foreach { case (y, fs, cs) =>
            var c = 0
            while (c < kk) {
              var zz = bv(c)
              val wc = wv(c)
              var i = 0
              while (i < fs.length) { zz += cs(i) * wc(fs(i)); i += 1 }
              z(c) = zz
              c += 1
            }
            var mx = z(0); c = 1
            while (c < kk) { if (z(c) > mx) mx = z(c); c += 1 }
            var denom = 0.0; c = 0
            while (c < kk) {
              e(c) = math.exp((z(c) - mx).toDouble / 1e6)
              denom += e(c)
              c += 1
            }
            c = 0
            while (c < kk) {
              val p = e(c) / denom
              val gm = halfAway((p - (if (y == c) 1.0 else 0.0)) * 1e6)
              if (gm != 0L) {
                val ic = -(c + 1).toLong
                grad.update(ic, grad.getOrElse(ic, 0L) + gm)
                val cBase = c.toLong << 22
                var i = 0
                while (i < fs.length) {
                  val key = cBase | fs(i).toLong
                  grad.update(key, grad.getOrElse(key, 0L) + gm * cs(i))
                  i += 1
                }
              }
              c += 1
            }
          }
          grad.iterator
        }.reduceByKey(_ + _).collect()
        bcW.destroy(); bcB.destroy()
        val gArr = Array.ofDim[Long](k, dim)
        val gbArr = new Array[Long](k)
        sums.foreach { case (key, s) =>
          if (key < 0L) gbArr((-key - 1L).toInt) = s
          else gArr((key >> 22).toInt)((key & ((1L << 22) - 1)).toInt) = s
        }
        var c = 0
        while (c < k) {
          val wc = w(c)
          val gc = gArr(c)
          var f = 0
          while (f < dim) {
            if (gc(f) != 0L || wc(f) != 0L)
              wc(f) -= halfAway(lr * (gc(f).toDouble / n + l2 * wc(f)))
            f += 1
          }
          b(c) -= halfAway(lr * (gbArr(c).toDouble / n))
          c += 1
        }
        it += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      var c = 0
      while (c < k) {
        out += ((classes(c), -1L, b(c)))
        var f = 0
        while (f < dim) {
          if (w(c)(f) != 0L) out += ((classes(c), f.toLong, w(c)(f)))
          f += 1
        }
        c += 1
      }
      out.toSeq.toDF("label", "feature", "w_micro")
    } finally { feats.unpersist(blocking = false); () }
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
    val labels = base.select(longId(col(idCol)).as("doc_id"),
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
    // single-task bounded collect = guard + read in one job (the
    // scoreTextClassifier contract — see the comment there)
    val wRows = weights
      .select(col("label").cast("string"), col("feature").cast("long"),
        col("w_micro").cast("long"))
      .coalesce(1).limit((1 << 22) + 2)
      .collect()
    require(wRows.length <= (1 << 22) + 1,
      "scoreTextClassifierMulti: weight table has > 2^22 + 1 rows — " +
        "not a trained model")
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
    val in = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(longId(col(idCol)).as("_id"), lower(col(textCol)).as("_lt"))
    // the [[NgramFeaturizer]] byte path (see scoreTextClassifier) —
    // one featurize per row, all K exact integer logits from the counts
    import org.apache.spark.sql.graft.PlanBridge
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val rdd = PlanBridge.toInternalRdd(in).mapPartitions { rows =>
      val (cls, bs, ws) = bc.value
      val clsU = cls.map(org.apache.spark.unsafe.types.UTF8String.fromString)
      val k = cls.length
      val fz = new NgramFeaturizer(dimL, bigrams)
      rows.map { r =>
        val id = r.getLong(0)
        fz.featurize(r.getUTF8String(1))
        var best = 0
        var bestLogit = Long.MinValue
        var c = 0
        while (c < k) {
          var logit = bs(c)
          val w = ws(c)
          fz.counts.foreachEntry { (f, cnt) =>
            logit += cnt * w.getOrElse(f, 0L)
          }
          // strict >: classes iterate in sorted label order, so ties
          // keep the lexicographically smallest
          if (logit > bestLogit) { best = c; bestLogit = logit }
          c += 1
        }
        new GenericInternalRow(
          Array[Any](id, clsU(best), bestLogit)): InternalRow
      }
    }
    PlanBridge.fromInternalRdd(spark, rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("label",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("logit_micro",
          org.apache.spark.sql.types.LongType, nullable = false))))
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
