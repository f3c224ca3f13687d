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

  /** Corpus word-type table with initial character symbols. */
  private def wordTypes(docs: DataFrame, idCol: String,
      textCol: String): Dataset[WordRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      // Java split("") yields single characters — the initial alphabet
      .select(split(col("w"), "").as("syms"), col("freq"))
      .as[WordRow]
  }

  /** Train a BPE merge table: `numMerges` iterations of (count all adjacent
    * symbol pairs weighted by word frequency → merge the argmax pair
    * everywhere). Stops early when no pair reaches `minPairCount`.
    *
    * Output: (rank, left, right, cnt) — rank is 1-based merge order, cnt
    * the pair's summed word frequency when it won. The merged symbol is
    * `left || right` by construction. */
  def train(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int, minPairCount: Long = 1L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minPairCount >= 1L,
      s"minPairCount must be >= 1, got $minPairCount")
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = wordTypes(docs, idCol, textCol).persist()
    cur.count() // materialize the corpus scan once, outside the loop
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // vocab-sized pair counts; ONE row reaches the driver per iteration.
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
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((rank, l, r, c))
        val next0 = cur.map(w => w.copy(syms = applyMerge(w.syms, l, r)))
        // cut lineage every few merges: without this the plan (and task
        // binaries) grow linearly in numMerges
        val next = (if (rank % 8 == 0) next0.localCheckpoint()
          else next0).persist()
        next.count()
        cur.unpersist()
        cur = next
        rank += 1
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
