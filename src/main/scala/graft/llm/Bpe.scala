package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer tier: distributed merge-table TRAINING over
  * the corpus word-type table (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — the tokenizer-training
  * pass every pre-training pipeline runs before token counting, packing, or
  * budget accounting can be exact), plus ENCODING of arbitrary documents
  * against a stored merge table.
  *
  * Scale contract — everything iterates over the WORD-TYPE table, never the
  * corpus: one corpus-sized pass builds (word, freq) — the classic BPE
  * reduction, since a word's symbols evolve identically wherever it occurs —
  * and each merge iteration is (a) one vocab-sized pair-count aggregate
  * (partial-agg, the only shuffle, keyed by symbol pair — no viral key: a
  * pair's count rows come pre-combined per map task) and (b) one vocab-sized
  * typed map applying the merge in a JVM kernel (no interpreted lambda per
  * symbol — the fold runs as compiled Scala inside `mapPartitions`-style
  * typed execution). At 100 TB the word-type table is vocab-scale (10⁷–10⁸
  * rows), so `numMerges` iterations cost `numMerges` small jobs after the
  * single corpus scan. Lineage is cut with `localCheckpoint` every few
  * iterations so the plan does not grow linearly with the merge count.
  *
  * Determinism contract (what the DuckDB oracle replays bit-for-bit):
  * words are `' '`-split of the LOWERCASED text with empty tokens dropped;
  * initial symbols are single characters (no end-of-word marker — the
  * within-word contract makes it unnecessary, documented deviation from
  * Sennrich's `</w>`); the winning pair each iteration maximizes summed
  * word frequency with ties broken (count DESC, left ASC, right ASC) in
  * binary string order; one merge application is a single left-to-right
  * non-overlapping pass. Applying merges in ascending rank order, one pass
  * each, is EXACT classic-BPE encoding: a later merge's output symbol can
  * never be an earlier merge's operand (it did not exist when the earlier
  * merge trained), and merging two adjacent symbols into one can never make
  * two other symbols newly adjacent — so no earlier merge ever becomes
  * applicable again after its pass.
  */
object Bpe {

  /** Word-type row carried between merge iterations (the source word
    * string itself is NOT carried — it is `syms.mkString` by invariant,
    * and dropping it cuts the per-iteration cached/scanned bytes ~40%) —
    * public because Catalyst's generated deserializer instantiates it
    * from codegen'd bytecode. */
  case class WordRow(syms: Seq[String], freq: Long)

  /** Apply a rank-ordered run of merges, one left-to-right pass each —
    * the per-word kernel of both batched training and encoding. */
  private[llm] def applyMerges(syms: Seq[String],
      batch: Array[(String, String)]): Seq[String] = {
    var s = syms
    var i = 0
    while (i < batch.length) { s = applyMerge(s, batch(i)._1, batch(i)._2); i += 1 }
    s
  }

  /** One left-to-right non-overlapping merge pass: every adjacent
    * (left, right) becomes left+right; a symbol consumed by a merge never
    * starts another in the same pass. */
  private[llm] def applyMerge(syms: Seq[String], left: String,
      right: String): Seq[String] = {
    val n = syms.length
    if (n < 2) return syms
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      if (i + 1 < n && syms(i) == left && syms(i + 1) == right) {
        out += left + right; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Corpus word-frequency table — the one corpus-sized pass. */
  private def wordFreqs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Word types with initial character symbols for the distributed loop.
    * Java split("") yields single characters — the initial alphabet. */
  private def wordTypes(freqs: DataFrame): Dataset[WordRow] = {
    val spark = freqs.sparkSession
    import spark.implicits._
    freqs.select(split(col("w"), "").as("syms"), col("freq")).as[WordRow]
  }

  /** Train a BPE merge table: iterations of (count all adjacent symbol
    * pairs weighted by word frequency → merge winning pairs everywhere),
    * until `numMerges` merges are recorded. Stops early when no pair
    * reaches `minPairCount`.
    *
    * `maxBatch` > 1 merges up to that many pairs per iteration — the
    * scale path for production vocab sizes (32k-64k merges), where one
    * vocab-sized count job per merge is 12-24 DAYS at 10⁸ word types.
    * Batching is EXACTLY equivalent to the sequential loop, never an
    * approximation; the batch each iteration is:
    *
    *   1. the longest PREFIX of the (cnt DESC, l ASC, r ASC)-sorted pair
    *      list whose members are mutually symbol-disjoint — no member's
    *      left, right, or merged string `l||r` may equal any other
    *      member's (a merge leaves the counts of symbol-disjoint pairs
    *      untouched, so each prefix member is still the argmax at its
    *      turn); the scan CUTS at the first conflicting pair — skipping
    *      it and continuing would reorder selection;
    *   2. cut after a self-pair (l == r): merging `aa` creates pairs over
    *      the new symbol whose counts are bounded only by the self-pair's
    *      own count (e.g. `a a a` yields `(aa, a)` at full frequency), so
    *      nothing ranked below it is safe to pre-commit;
    *   3. strictly truncated to members with cnt > the first non-accepted
    *      pair's cnt: every pair a batch merge CREATES has count bounded
    *      by some non-accepted original pair (each `x·(lr)` adjacency was
    *      an `x·l` adjacency, and `(x, l)` conflicts with the batch so it
    *      was never accepted) — strict inequality keeps a created pair
    *      from tie-break-winning against a pre-committed one. An empty
    *      truncation falls back to the plain argmax step.
    *
    * On sparse-top corpora batches run tens of pairs per job; on dense
    * alphabets (all top pairs sharing letters — natural language at
    * char level) the exactness cut fires immediately and batching
    * degrades to maxBatch = 1 behavior, never to a wrong table. That is
    * why the PRIMARY production path is `driverTypeCap`: when the
    * word-type table holds at most that many rows, training collects it
    * and runs [[BpeKernel]] — the classic incremental algorithm
    * (pair-count deltas from only the words containing each winner, heap
    * argmax), identical contract, with TOTAL work near one pass over the
    * symbol positions instead of one vocab-sized job per merge. The
    * word-type table is vocab-scale, not corpus-scale (this is the whole
    * reason BPE training aggregates to types first), so the cap covers
    * every practical corpus; 0 disables the fast path, and a table past
    * the cap falls back to the distributed loop instead of OOMing the
    * driver.
    *
    * Output: (rank, left, right, cnt) — rank is 1-based merge order, cnt
    * the pair's summed word frequency when it won. The merged symbol is
    * `left || right` by construction. */
  def train(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int, minPairCount: Long = 1L,
      maxBatch: Int = 1, driverTypeCap: Long = 2000000L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minPairCount >= 1L,
      s"minPairCount must be >= 1, got $minPairCount")
    require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
    val spark = docs.sparkSession
    import spark.implicits._
    val freqs = wordFreqs(docs, idCol, textCol).persist()
    val nTypes = freqs.count() // materialize the corpus scan once
    if (driverTypeCap > 0L && nTypes <= driverTypeCap) {
      // collect plain (word, freq) strings — ~5× lighter to deserialize
      // than per-word symbol arrays; the kernel splits to chars itself
      val rows = freqs.as[(String, Long)].collect()
      freqs.unpersist()
      val merges = BpeKernel.train(rows, numMerges, minPairCount)
      return spark.createDataFrame(merges)
        .toDF("rank", "left", "right", "cnt")
    }
    var cur = wordTypes(freqs).persist()
    cur.count() // materialize the symbol split off the persisted freqs
    freqs.unpersist()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 1
    var sinceCkpt = 0
    var done = false
    while (rank <= numMerges && !done) {
      // vocab-sized pair counts; maxBatch+1 rows reach the driver per
      // iteration (the +1 row supplies the truncation bound — when the
      // whole list is shorter, the true list end bounds at 0).
      // Column ops, not a typed flatMap: the count pass stays inside
      // whole-stage codegen over the cached Tungsten rows instead of
      // deserializing every WordRow (measured ~35% of the iteration wall)
      val top = cur.toDF()
        .select(explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("_p"),
          col("freq"))
        .groupBy(col("_p").getField("0").as("l"),
          col("_p").getField("1").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(maxBatch + 1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty || top(0)._3 < minPairCount) done = true
      else {
        val cap = math.min(maxBatch, numMerges - rank + 1)
        val symbols = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        var cutCnt = 0L
        var i = 0
        var cut = false
        while (i < top.length && !cut) {
          val (l, r, c) = top(i)
          if (accepted.length >= cap || c < minPairCount ||
              symbols(l) || symbols(r) || symbols(l + r)) {
            cut = true
            // below-minPairCount pairs still bound created-pair counts,
            // so their cnt is the truncation bar either way
            cutCnt = c
          } else {
            accepted += ((l, r, c))
            symbols += l; symbols += r; symbols += (l + r)
            if (l == r) {
              cut = true
              cutCnt = if (i + 1 < top.length) top(i + 1)._3 else 0L
            }
          }
          i += 1
        }
        if (!cut) cutCnt = 0L // true end of the pair list inside the window
        val batch0 = accepted.takeWhile(_._3 > cutCnt)
        // counts are non-increasing down the prefix, so the strict
        // truncation is a takeWhile; an emptied batch (top pair tied with
        // its own conflict) falls back to the always-exact argmax step
        val batch = if (batch0.nonEmpty) batch0.toArray
          else Array(top(0))
        batch.foreach { case (l, r, c) =>
          merges += ((rank, l, r, c)); rank += 1
        }
        val pairs = batch.map(p => (p._1, p._2))
        val next0 =
          if (pairs.length == 1)
            cur.map(w => w.copy(syms = applyMerge(w.syms, pairs(0)._1,
              pairs(0)._2)))
          else cur.map(w => w.copy(syms = applyMerges(w.syms, pairs)))
        // cut lineage every ~8 applied merges: without this the plan (and
        // task binaries) grow linearly in numMerges
        sinceCkpt += pairs.length
        val next = (if (sinceCkpt >= 8) { sinceCkpt = 0; next0.localCheckpoint() }
          else next0).persist()
        next.count()
        cur.unpersist()
        cur = next
      }
    }
    cur.unpersist()
    spark.createDataFrame(merges.toSeq)
      .toDF("rank", "left", "right", "cnt")
  }

  /** Encode documents against a trained merge table: per word, start from
    * characters and apply every merge in ascending rank order (exact
    * classic-BPE, see the object scaladoc). The merge table is collected
    * (merge tables are hundreds to tens of thousands of rows — driver-
    * bounded by contract, like centroid codebooks) and shipped in the
    * closure; each task memoizes encodings per DISTINCT word in a local
    * map, so encode cost scales with per-partition vocabulary, not tokens.
    *
    * Output: (doc_id, n_bpe_tokens, fp) — the encoded-token count and the
    * md5 fingerprint of the space-joined token stream (word order
    * preserved), per input document with non-null id and text. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    // a non-numeric id would coerce to null in the cast below and NPE in
    // the typed encoder — fail with the actual problem instead (the
    // packGreedy contract)
    require(docs.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"encode requires a numeric id column; '$idCol' is " +
        docs.schema(idCol).dataType.simpleString)
    val spark = docs.sparkSession
    import spark.implicits._
    val ms: Seq[(String, String)] = merges
      .select(col("rank").cast("int"), col("left"), col("right"))
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val in = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        lower(col(textCol)).as("_t"))
      .as[(Long, String)]
    in.mapPartitions { it =>
      val cache = scala.collection.mutable.HashMap.empty[String, String]
      def encodeWord(w: String): String = {
        // bounded memo: a pathological partition (every word distinct)
        // must not grow the map past executor memory — dropping the whole
        // cache is correct (pure function) and keeps the common case
        // (Zipfian corpora) fully memoized
        if (cache.size >= 2000000) cache.clear()
        cache.getOrElseUpdate(w, {
          var syms: Seq[String] = w.split("").toSeq
          ms.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
          syms.mkString(" ")
        })
      }
      it.map { case (id, t) =>
        val toks = t.split(" ").iterator.filter(_.nonEmpty)
          .map(encodeWord).mkString(" ")
        val n = if (toks.isEmpty) 0L
          else toks.count(_ == ' ').toLong + 1L
        val fp = java.security.MessageDigest.getInstance("MD5")
          .digest(toks.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (id, n, fp)
      }
    }.toDF("doc_id", "n_bpe_tokens", "fp")
  }
}
