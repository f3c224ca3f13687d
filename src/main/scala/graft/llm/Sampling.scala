package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix assembly: deterministic sampling and sequence packing.
  *
  * All three operators are reproducible from the data alone (content
  * hashes and ids, no RNG state), so a re-run over the same corpus —
  * or the same corpus re-partitioned 1000 ways on a cluster — selects
  * byte-identical training sets.
  */
object Sampling {

  /** Stable per-row hash draw in [0, 100): the first 8 hex digits of
    * md5(id) as an integer, mod 100. Content-addressed, so the draw
    * survives re-partitioning, appends, and engine changes (any engine
    * with md5 reproduces it — the oracle replay relies on exactly that). */
  private def hashDraw(idCol: String) =
    pmod(conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(100L))

  /** Keep ~`pct`% of rows by the md5 hash draw — a pure filter with NO
    * shuffle and no per-partition state: the scalable default for
    * down-sampling a 100 TB corpus to a training budget (every executor
    * decides row-locally; adding executors never changes the sample). */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.filter(hashDraw(idCol) < pct)
  }

  /** Exactly-k-per-stratum sample: rank rows within each stratum by
    * (md5(id), id) and keep rank ≤ k — the "balanced per-domain mix"
    * selector. The md5 sort key makes the choice content-addressed (not
    * "first k by id"); the id tiebreak makes it total. One shuffle on
    * the strata columns; a stratum is processed by one task, which is
    * the operator's semantics (rank IS per-stratum sequential) — for
    * corpus-scale strata use [[hashSample]] or pre-shard the stratum.
    * Adds a `rk` column (1-based rank within the stratum). */
  def stratifiedQuota(df: DataFrame, strataCols: Seq[String], idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the rank column is part of the OUTPUT contract — silently
    // overwriting a user column of the same name would lose data
    require(!df.columns.contains("rk"),
      "stratifiedQuota adds a 'rk' column; the input already has one — rename it first")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")).asc, col(idCol).asc)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic training-order shuffle: assign every row a shard and a
    * 1-based position within it, both content-addressed — shard = md5
    * draw mod `numShards`, position = rank by (md5(salt ‖ id), id). The
    * global training order is (shard, pos): statistically shuffled, yet
    * byte-reproducible on any engine/partitioning, and `salt` re-shuffles
    * between epochs without touching the data. NO global sort: one
    * shuffle on the shard key, then a per-shard sort.
    *
    * Sizing contract: EACH SHARD IS SORTED BY ONE TASK (the in-shard
    * rank is inherently sequential), so pick `numShards` such that a
    * shard fits a task — numShards ≈ corpus rows / task budget (≈ the
    * number of output files). The md5 shard assignment is uniform, so
    * there is no skewed key; but numShards = 8 on a 100 TB corpus means
    * 8 straggler sorts — the knob IS the parallelism. */
  def shuffleShards(df: DataFrame, idCol: String, numShards: Int,
      salt: String = ""): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    Seq("shard", "pos", "_h").foreach(c => require(!df.columns.contains(c),
      s"shuffleShards adds a '$c' column; the input already has one — rename it first"))
    val h = md5(concat(col(idCol).cast("string"), lit(salt)).cast("binary"))
    val w = Window.partitionBy(col("shard")).orderBy(col("_h").asc,
      col(idCol).asc)
    df.withColumn("_h", h)
      .withColumn("shard", pmod(conv(substring(col("_h"), 1, 8), 16, 10)
        .cast("long"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_h")
  }

  /** Per-stratum rate sampling — the DoReMi-shaped "mix domains at target
    * rates" selector in the 100 TB shape: each stratum value carries its
    * own keep percentage, rows in unlisted strata keep at `defaultPct`.
    * Same md5 draw as [[hashSample]], so the decision is ROW-LOCAL (no
    * shuffle, no state — adding executors or re-partitioning never
    * changes the sample) and NESTED across rates: the 30% sample of a
    * stratum is a subset of its 80% sample, so a mix can be tightened
    * without churning previously-selected documents. Rates are few
    * (domains), so they compile into a literal CASE chain — nothing is
    * broadcast, the filter whole-stage-codegens. */
  def mixSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    (rates.values.toSeq :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"rates must be in [0,100], got $p"))
    // fold in sorted-key order so the generated plan (and therefore any
    // plan-text diff) is stable across Map iteration orders
    val pctCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (k, p)) => when(col(strataCol) === lit(k), lit(p)).otherwise(acc)
    }
    df.filter(hashDraw(idCol) < pctCol)
  }

  /** Exact weighted mix — per-stratum quotas from target WEIGHTS: stratum
    * s keeps its round(weights(s) · total) lowest rows by (md5(id), id)
    * (the [[stratifiedQuota]] selection rule, per-stratum k). Strata
    * absent from `weights` contribute nothing; a stratum smaller than
    * its quota keeps all its rows (the output can undershoot `total` —
    * exact quota PER STRATUM, not rebalanced across strata, so one
    * domain's scarcity never silently inflates another's share).
    * One shuffle on the stratum key; each stratum ranks in one task
    * ([[stratifiedQuota]]'s sizing contract — quotas are training-mix
    * scale; for corpus-scale strata use [[mixSample]]). Adds `rk`. */
  def mixQuota(df: DataFrame, strataCol: String, idCol: String,
      weights: Map[String, Double], total: Long): DataFrame = {
    require(total >= 0, s"total must be >= 0, got $total")
    weights.values.foreach(w =>
      require(w >= 0.0 && !w.isNaN, s"weights must be >= 0, got $w"))
    require(!df.columns.contains("rk"),
      "mixQuota adds a 'rk' column; the input already has one — rename it first")
    val kCol = weights.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, w)) =>
        when(col(strataCol) === lit(s), lit(math.round(w * total))).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")).asc, col(idCol).asc)
    // unlisted strata contribute nothing by contract — filter them BEFORE
    // the window, not after: a corpus-scale unlisted stratum (one 'web'
    // domain among curated sources) would otherwise funnel all its rows
    // through one window task only to fail rk <= 0
    df.filter(col(strataCol).isin(weights.keys.toSeq: _*))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= kCol)
  }

  /** Exact per-stratum quotas — [[mixQuota]] with the quota GIVEN per
    * stratum instead of derived from weights: stratum s keeps its
    * `quotas(s)` lowest rows by (md5(id), id); unlisted strata drop
    * before the window (the mixQuota pre-filter — a corpus-scale
    * unlisted stratum never funnels through one window task). Same
    * sizing contract as [[mixQuota]]: one shuffle on the stratum key,
    * each stratum ranks in one task. Adds `rk`. */
  def quotaExact(df: DataFrame, strataCol: String, idCol: String,
      quotas: Map[String, Long]): DataFrame = {
    quotas.values.foreach(k =>
      require(k >= 0L, s"quotas must be >= 0, got $k"))
    require(!df.columns.contains("rk"),
      "quotaExact adds a 'rk' column; the input already has one — rename it first")
    val kCol = quotas.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, k)) =>
        when(col(strataCol) === lit(s), lit(k)).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")).asc, col(idCol).asc)
    df.filter(col(strataCol).isin(quotas.keys.toSeq: _*))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= kCol)
  }

  /** Temperature-scaled mixing (the multilingual-LM recipe — e.g.
    * Arivazhagan et al. 2019 §4, mT5): per-stratum quotas ∝ n_s^τ, so
    * τ = 1 reproduces natural proportions, τ → 0 flattens toward
    * uniform, and 0 < τ < 1 up-weights small domains without drowning
    * large ones. The arithmetic is fixed-pointed so both engines derive
    * identical quotas: w6_s = round(n_s^τ · 10⁶) per stratum (one
    * rounding, order-free), W = Σ w6_s exact integer, quota_s =
    * ⌊(2·total·w6_s + W) / (2·W)⌋ — the engine-wide integer half-up
    * division, in arbitrary precision so no count scale overflows.
    *
    * Scale shape: one tiny stratum-count aggregation (driver-bounded by
    * `maxStrata` — strata are domains/languages, not documents), then
    * [[quotaExact]]. Null strata drop (no quota can name them). */
  def temperatureQuota(df: DataFrame, strataCol: String, idCol: String,
      tau: Double, total: Long, maxStrata: Int = 100000): DataFrame = {
    require(tau >= 0.0 && !tau.isNaN && !tau.isInfinite,
      s"tau must be a finite value >= 0, got $tau")
    require(total >= 0L, s"total must be >= 0, got $total")
    require(maxStrata >= 1, s"maxStrata must be >= 1, got $maxStrata")
    // ONE execution, limit-bounded (the collectUniModel guard shape)
    val rows = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("_s")).count()
      .limit(maxStrata + 1).collect()
    require(rows.length <= maxStrata,
      s"temperatureQuota: > $maxStrata strata — not a domain-scale column")
    val w6 = rows.map { r =>
      val p = math.pow(r.getLong(1).toDouble, tau) * 1e6
      r.getString(0) -> java.math.BigDecimal.valueOf(p)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }
    val bigW = w6.iterator.map(e => BigInt(e._2)).sum
    val quotas = w6.map { case (s, v) =>
      s -> (if (bigW == 0) 0L
            else ((BigInt(2) * total * v + bigW) / (BigInt(2) * bigW)).toLong)
    }.toMap
    quotaExact(df, strataCol, idCol, quotas)
  }

  /** Context-length CHUNKING — the dual of [[packGreedy]]: split every
    * document into `maxTokens`-token training chunks, consecutive chunks
    * overlapping by `overlap` tokens (the sliding-window long-document
    * recipe; `overlap = 0` partitions the token stream exactly). Chunk
    * starts step by `maxTokens − overlap` while they still add uncovered
    * tokens (a trailing start whose window is fully contained in the
    * previous chunk — possible only with overlap — is not emitted);
    * the final chunk is short when the document doesn't divide evenly,
    * and a document of ≤ `maxTokens` tokens yields itself as its single
    * chunk. Tokens are `' '`-split
    * (the engine-wide phantom-token contract), chunks re-join by single
    * spaces — with `overlap = 0` the chunks concatenate back to the
    * exact original text.
    *
    * Scale shape: pure per-row column math (slice + concat off one bound
    * token array) feeding ONE posexplode — no shuffle, no state; at
    * 100 TB this is a flat map over the scan, and the output inherits
    * the input's partitioning.
    *
    * Output: (doc_id, chunk_id, n_tokens, chunk_text) with chunk_id
    * 0-based per document in stream order.
    *
    * `carry` passes extra input columns through to the output unchanged
    * (appended after chunk_text). When the caller's id column is UNIQUE,
    * carrying a column is exactly the inner equi-join of the chunks back
    * to the input on doc_id — without re-deriving the input subtree a
    * second time (chunking is a row-local flatmap, so the metadata rides
    * the same pass; the self-join shape re-executes, or at best
    * re-exchanges, everything upstream). */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0,
      carry: Seq[String] = Nil): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap of $maxTokens")
    val reserved = Set("doc_id", "chunk_id", "n_tokens", "chunk_text",
      "_tok", "_n", "_s")
    carry.foreach(c => require(!reserved(c),
      s"chunkDocs cannot carry '$c': the name collides with an output or " +
        "internal column — rename it first"))
    val stride = maxTokens - overlap
    val tok = col("_tok")
    val n = size(tok)
    val cc = carry.map(col)
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id") +: split(col(textCol), " ").as("_tok")
        +: cc: _*)
      .select(col("doc_id") +: tok +: n.as("_n") +: cc: _*)
      // _n ≥ 1 always (split of "" is [""]), so the sequence is non-empty;
      // upper bound _n − overlap: a start past it would emit a window the
      // previous chunk already covers entirely
      .select(col("doc_id") +: tok +: col("_n") +:
        posexplode(sequence(lit(1),
          greatest(lit(1), col("_n") - overlap), lit(stride)))
          .as(Seq("chunk_id", "_s")) +: cc: _*)
      .select(col("doc_id") +: col("chunk_id").cast("long").as("chunk_id") +:
        least(lit(maxTokens), col("_n") - col("_s") + 1).cast("long")
          .as("n_tokens") +:
        concat_ws(" ", slice(tok, col("_s"), lit(maxTokens)))
          .as("chunk_text") +: cc: _*)
  }

  /** Internal row shape for [[packGreedy]] — public because Catalyst's
    * generated deserializer instantiates it from codegen'd bytecode. */
  case class PackRow(strata: String, shard: Int, doc_id: Long, n_tok: Long)

  /** Greedy sequence packing — assemble documents into training bins of
    * at most `budgetTokens` whitespace tokens (the pre-training "pack
    * short documents into fixed-length examples" step). Within each
    * (strata, shard) group, documents are taken in id order and appended
    * to the current bin; a document that would overflow starts a new bin
    * (an oversized single document occupies — and overflows — its own
    * bin, the standard greedy contract). Bins are independent across
    * groups, so packing parallelizes by construction: `shards` (id mod
    * `shards`) is the parallelism knob — at corpus scale pick shards ≈
    * corpus/executor-budget and every task streams its groups with O(1)
    * state (repartition by group key, sort within partitions, one
    * sequential fold; no group is ever collected).
    *
    * Output: (doc_id, strata, shard, n_tok, bin_id) with bin_id 0-based
    * per (strata, shard). */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, budgetTokens: Long, shards: Int = 4): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    // a non-numeric id would coerce to null in the casts below and NPE
    // in the typed encoder (or silently mis-group) — fail with the
    // actual problem instead
    require(docs.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packGreedy requires a numeric id column; '$idCol' is " +
        docs.schema(idCol).dataType.simpleString)
    val spark = docs.sparkSession
    import spark.implicits._
    val in = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(strataCol).cast("string").as("strata"),
        pmod(col(idCol).cast("long"), lit(shards.toLong)).cast("int").as("shard"),
        col(idCol).cast("long").as("doc_id"),
        TextStats.tokenCount(col(textCol)).as("n_tok"))
      .as[PackRow]
    val packed: Dataset[(Long, String, Int, Long, Long)] = in
      .repartition(col("strata"), col("shard"))
      .sortWithinPartitions(col("strata"), col("shard"), col("doc_id"))
      .mapPartitions { it =>
        var curStrata: String = null
        var curShard = -1
        var fill = 0L
        var bin = 0L
        it.map { r =>
          if (r.strata != curStrata || r.shard != curShard) {
            curStrata = r.strata; curShard = r.shard
            bin = 0L; fill = r.n_tok
          } else if (fill + r.n_tok > budgetTokens) {
            bin += 1L; fill = r.n_tok
          } else fill += r.n_tok
          (r.doc_id, r.strata, r.shard, r.n_tok, bin)
        }
      }
    packed.toDF("doc_id", "strata", "shard", "n_tok", "bin_id")
  }
}
