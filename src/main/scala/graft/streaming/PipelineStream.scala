package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.llm.Similarity

/** The composed training-data ingest loop: documents and their embeddings
  * land together, every delivery is near-dup deduped against the ENTIRE
  * accumulated corpus ([[DedupStream]] state), and ONLY the embeddings of
  * documents that become NEW cluster representatives enter the persisted
  * ANN index ([[graft.llm.Similarity.appendIvfIndex]]) — the index serves
  * a deduplicated corpus by construction: one vector per near-dup
  * cluster, re-deliveries and near-copies never inflate it.
  *
  * Per micro-batch, inside ONE checkpointed stream:
  *   1. [[DedupStream.processBatch]] clusters the delivery against state
  *      (its own exactly-once story: per-batch state dirs, replays
  *      rewrite bit-identically, snapshot compaction);
  *   2. the batch's assignment table (`assign/b<id>`) names the new reps:
  *      `rep_id = doc_id` — a doc attaching to any stored cluster gets
  *      the stored (smaller-id) rep instead;
  *   3. those docs' embeddings append to the index as delta `b<id>`
  *      ([[graft.llm.Similarity.appendIvfIndex]]'s replay/fold-ledger
  *      idempotence; a delivery with no new reps appends nothing).
  *
  * A crash between (1) and (3) replays the whole batch: (1) rewrites the
  * same state dirs, (2) reads the same rewritten assignment, (3) rewrites
  * the same delta or no-ops via the `_FOLDED` ledger — convergent at
  * every cut point.
  *
  * Seed the index before the first poll — with a corpus, or EMPTY with
  * externally-trained centroids (`saveIvfIndex(centroids = Some(...))`
  * over zero rows) to grow purely by ingest.
  *
  * Documented deviation, inherited from [[DedupStream]]: clusters never
  * merge across batches, so a later bridge doc attaches to ONE stored rep
  * while batch semantics would merge two clusters — after an offline
  * [[DedupStream.repairMerges]], reps rewritten away remain in the index
  * until the next operator-initiated full rebuild (`saveIvfIndex` over
  * the repaired representative corpus, poller stopped): the index is a
  * superset of the repaired representative set, never missing one.
  *
  * Landing layout: parquet files of [[landingSchema]] one level below
  * `landingDir`.
  */
object PipelineStream {
  val landingSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Semantic-floor state (`workDir/sem/b<id>` + `snap<m>`): the
    * (id, coarse cell, vector, kept) of every SCORABLE document the gate
    * ever saw. `kept = true` rows are the survivors — the reference set
    * later deliveries score against; `kept = false` rows (floored at
    * landing) carry their vectors so [[repairSem]] can rebuild the FULL
    * near-dup graph offline, bridges through dropped documents included
    * — without them the chain deviation would be unrepairable (the
    * bridge vector would be gone). State stays corpus-proportional
    * either way. */
  private[streaming] val semSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("cell", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("kept", BooleanType)))

  /** Fold `sem/b<i>` (i < uptoExclusive) into `snap<uptoExclusive−1>` —
    * [[DedupStream.compactState]]'s single-table body over the semantic
    * state (same dot-temp + rename-once commit, same sweep). */
  private[streaming] def compactSemState(sp: SparkSession, workDir: String,
      uptoExclusive: Long): Unit = {
    val root = s"$workDir/sem"
    val m = uptoExclusive - 1
    val f = DedupStream.fs(sp, root)
    if (!f.exists(new org.apache.hadoop.fs.Path(root, s"snap$m"))) {
      val tmp = new org.apache.hadoop.fs.Path(root, s".tmpsnap$m")
      DedupStream.readState(sp, root, semSchema, uptoExclusive)
        .sortWithinPartitions("cell")
        .write.mode("overwrite").parquet(tmp.toString)
      if (!f.rename(tmp, new org.apache.hadoop.fs.Path(root, s"snap$m")))
        throw new java.io.IOException(
          s"semantic-state compaction rename failed: $root/snap$m")
    }
    DedupStream.sweep(sp, root, m)
  }

  /** Score one delivery through the semantic floor (contract in
    * [[pollIngest]]'s scaladoc) and land its survivors as `sem/b<id>`;
    * returns the delivery minus floored documents. */
  private def semGate(sp: SparkSession, batch0: DataFrame, workDir: String,
      indexDir: String, semMinCos: Double, compactEvery: Int,
      batchId: Long): DataFrame = {
    // fold BEFORE reading, the DedupStream discipline: every dir folded
    // here is from a checkpoint-committed batch, and a replay of THIS
    // batch re-enters through the same idempotent fold
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compactSemState(sp, workDir, batchId)
    val cents = Similarity.ivfCentroids(sp, indexDir)
    // consumed by the within-delivery dedup, the anti-join, the cell
    // assignment, and the state landing — materialize the poll-sized
    // projection once
    val vecs = batch0
      .select(col("doc_id").cast("long").as("vec_id"), col("embedding"))
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
      .dropDuplicates("vec_id")
      .localCheckpoint()
    // (a) within-delivery, cluster-scoped keep-min
    val d1 = Similarity.semDedupDropped(vecs, cents, "vec_id", "embedding",
      semMinCos).localCheckpoint()
    val surv1 = vecs.join(d1.select(col("_drop").as("vec_id")),
      Seq("vec_id"), "left_anti")
    val dSide = surv1
      .join(Similarity.assignCells(surv1, cents, "vec_id", "embedding", 1),
        "vec_id")
      .localCheckpoint()
    // (b) against accumulated survivors, replay-blind to own/later dirs;
    // the state scan is pre-filtered to the delivery's probed cells (an
    // isin filter parquet prunes row groups by — snapshots are written
    // sorted by cell), and the DELIVERY side broadcasts: the state never
    // shuffles, the DedupStream index-probe shape
    val probedCells = dSide.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val state = DedupStream.readState(sp, s"$workDir/sem", semSchema, batchId)
      .filter(col("kept") && col("cell").isin(probedCells: _*))
      .select(col("cell"), col("embedding").as("_se"))
    val cos = Similarity.dotNative(col("_se"), col("embedding")) /
      (sqrt(Similarity.dotNative(col("_se"), col("_se"))) *
        sqrt(Similarity.dotNative(col("embedding"), col("embedding"))))
    val d2 = state.join(broadcast(dSide), Seq("cell"))
      .filter(!isnan(cos) && cos >= semMinCos)
      .select("vec_id").distinct()
      .localCheckpoint()
    // floored documents land too (kept = false), WITH their vectors —
    // the repair's raw material (see semSchema); within-delivery drops
    // re-assign their cell here (they skipped the survivor-side
    // assignment), and an unscorable drop cannot exist (a drop requires
    // a finite-cosine pair), so the inner assign join loses nothing
    val drops1 = vecs.join(d1.select(col("_drop").as("vec_id")),
      Seq("vec_id"), "left_semi")
    val drop1Side = drops1
      .join(Similarity.assignCells(drops1, cents, "vec_id", "embedding", 1),
        "vec_id")
    dSide.join(d2, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"), col("embedding"))
      .withColumn("kept", lit(true))
      .unionByName(dSide.join(d2, Seq("vec_id"), "left_semi")
        .select(col("vec_id"), col("cell"), col("embedding"))
        .withColumn("kept", lit(false)))
      .unionByName(drop1Side
        .select(col("vec_id"), col("cell"), col("embedding"))
        .withColumn("kept", lit(false)))
      .sortWithinPartitions("cell")
      .write.mode("overwrite").parquet(s"$workDir/sem/b$batchId")
    val floored = d1.select(col("_drop").as("doc_id"))
      .unionByName(d2.select(col("vec_id").as("doc_id")))
    batch0.join(floored, Seq("doc_id"), "left_anti")
  }

  /** One incremental poll over doc+embedding deliveries: dedup against
    * the full corpus state under `workDir`, then index only the new
    * representatives. `compactEvery`/`retain` control the INDEX fold
    * cadence ([[IvfStream.pollAppend]] semantics); the dedup state
    * compacts on `p.compactEvery` as always.
    *
    * `spanTokens > 0` additionally applies the SPAN-DUPLICATION FLOOR at
    * ingest — the streaming analogue of [[graft.llm.Corpus.prepare]]'s
    * `spanTokens` gate, with the identical parameter tail: the delivery
    * is first scored by [[SpanDupStream.processBatch]] against the
    * accumulated window state (which accumulates EVERY landed document,
    * floored ones included — exactly as the batch floor counts dropped
    * documents' windows toward others' frequencies), then documents
    * whose dup_frac exceeds `maxDupFrac` are dropped BEFORE dedup and
    * indexing: boilerplate-heavy documents never enter cluster state or
    * the index. Crash replay stays convergent — the span scorer's
    * per-batch dirs rewrite bit-identically and the gate re-reads them.
    * Inherits [[SpanDupStream]]'s scored-at-landing contract: a document
    * is floored against the corpus as of its delivery (the batch floor
    * over the final corpus is the repair, as ever).
    *
    * `maxDupWordFrac` / `maxTopBigramFrac < 1.0` additionally apply the
    * WITHIN-document repetition floor at ingest — the streaming analogue
    * of [[graft.llm.Corpus.prepare]]'s Gopher-style gate with the
    * identical parameter tail. Repetition is a per-document property
    * ([[graft.llm.Quality.repetitionStats]] keys within the doc), so
    * unlike the span floor this needs NO accumulated state: a stateless
    * per-delivery filter, bit-identical to the batch floor over the same
    * documents, applied after the span gate (the batch composition's
    * order) and before dedup — looping documents never enter cluster
    * state or the index.
    *
    * `benchDocs` (with `maxContamFrac < 1.0`) applies BENCHMARK
    * DECONTAMINATION at ingest — [[graft.llm.Dedup.contaminationStats]]
    * as a gate: documents whose fraction of distinct `contamN`-token
    * shingles found in the benchmark set exceeds `maxContamFrac` are
    * dropped before dedup and indexing. The benchmark set is broadcast
    * (eval suites are tiny next to a corpus), so this too is stateless
    * per delivery — nothing delivery-sized shuffles, and the composed
    * landing-time recipe quality ∘ repetition ∘ span ∘ dedup ∘
    * decontamination closes without an offline pass.
    *
    * `lmModel` (with `maxPpl`) applies the PERPLEXITY floor at ingest —
    * the streaming analogue of [[graft.llm.Corpus.prepare]]'s `lm` gate:
    * documents whose smoothed perplexity under the reference unigram LM
    * ([[graft.llm.Quality.lmPerplexity]]) exceeds `maxPpl` are dropped
    * before dedup and indexing. The model is vocab-sized and broadcast,
    * so like repetition this is stateless per delivery — applied after
    * the repetition gate and before decontamination (the batch
    * composition's relative order).
    *
    * `gopher = true` applies the Gopher/MassiveText rule floor at ingest
    * — [[graft.llm.Quality.gopherRules]] at its published defaults
    * (`gopherStops` the retunable knob), the batch `prepare(gopher =
    * true)` gate with the identical parameter tail. The rules are
    * doc-local column math: stateless per delivery, no shuffle, applied
    * between the repetition and perplexity gates (the batch composition's
    * relative order).
    *
    * `minQuality > 0` / `langs` non-empty apply the QUALITY and LANGUAGE
    * floors at ingest — the batch `prepare`'s built-in final filter
    * ([[graft.llm.TextStats.qualityScore]] on the 6-decimal fixed point,
    * [[graft.llm.TextStats.langId]] over `langMarkers`) as optional
    * landing gates, applied last before dedup. Doc-local column math:
    * stateless, no shuffle. With every gate enabled the landing-time
    * recipe is now parameter-complete against the batch composition:
    * normalize ∘ semantic ∘ span ∘ repetition ∘ gopher ∘ perplexity ∘
    * classifier ∘ decontamination ∘ quality ∘ language ∘ dedup.
    *
    * `classifier` + `minLogitMicro` apply the CLASSIFIER floor
    * ([[graft.llm.Quality.scoreTextClassifier]] under a frozen
    * [[graft.llm.Quality.trainTextClassifier]] weight table): deliveries
    * whose exact integer logit falls below the floor are dropped after
    * the perplexity gate — the batch `prepare` parameter tail,
    * stateless per delivery, dim-bounded broadcast model.
    *
    * `normalize = true` canonicalizes delivery text FIRST
    * ([[graft.llm.Quality.normalizeText]] — the batch `prepare` order),
    * so transport noise cannot split an exact-duplicate group in cluster
    * state and every gate below sees the canonical token stream. Pure
    * per-row column math on the delivery; deterministic, so crash replay
    * re-lands identical bytes.
    *
    * `semMinCos < 1.0` applies the SEMANTIC floor at ingest — the
    * streaming analogue of [[graft.llm.Corpus.prepare]]'s
    * embeddings/semCentroids gate (SemDeDup), using the INDEX's stored
    * coarse centroids: a delivery document is dropped when its embedding
    * is within `semMinCos` cosine of (a) a surviving lower-id document
    * in the SAME delivery (within-delivery [[graft.llm.Similarity
    * .semDedup]], cluster-scoped), or (b) any previously-landed SURVIVOR
    * (the `sem/b<id>` state table — per-batch dirs with [[DedupStream]]'s
    * exactly-once discipline: replays read only below their own id and
    * rewrite their own dir bit-identically; folded into `snap<m>` on the
    * dedup state's cadence). Survivors' (id, cell, vector) land as the
    * next deliveries' reference set — unscorable vectors (zero/NaN norm)
    * are never floored and never become reference vectors, the batch
    * contract. Scale shape: the delivery side is BROADCAST, the state
    * scan is pre-filtered to the delivery's probed cells (an `isin` the
    * parquet scan prunes row groups by — state files are written sorted
    * by cell), and nothing corpus-sized shuffles. Documented deviation,
    * the [[DedupStream]] bridge contract's semantic twin: components
    * never merge ACROSS deliveries — a doc within `semMinCos` of an
    * already-DROPPED doc (but of no survivor) survives where batch
    * `semDedup` over the full corpus would drop it; the floor is scored
    * at landing, as ever.
    *
    * Defaults leave the pipeline byte-identical to the ungated form. */
  def pollIngest(spark: SparkSession, landingDir: String, workDir: String,
      indexDir: String, p: DedupStream.Params = DedupStream.Params(),
      compactEvery: Int = 16, retain: Int = 0,
      spanTokens: Int = 0, maxDupFrac: Double = 1.0,
      spanMinDocs: Int = 2,
      maxDupWordFrac: Double = 1.0, maxTopBigramFrac: Double = 1.0,
      benchDocs: Option[DataFrame] = None, contamN: Int = 5,
      maxContamFrac: Double = 1.0,
      normalize: Boolean = false,
      lmModel: Option[DataFrame] = None, maxPpl: Double = Double.MaxValue,
      semMinCos: Double = 1.0,
      gopher: Boolean = false,
      gopherStops: Seq[String] = graft.llm.Quality.GopherStops,
      minQuality: Double = 0.0,
      qualityStops: Seq[String] = Seq.empty,
      langs: Seq[String] = Seq.empty,
      langMarkers: Seq[(String, Seq[String])] = Seq.empty,
      // new defaulted parameters go at the END of the list (the
      // Corpus.prepare convention): contamHash was once inserted
      // mid-signature and any positional caller written against the old
      // shape would have silently bound its normalize flag here
      contamHash: Boolean = true,
      classifier: Option[DataFrame] = None,
      classifierDim: Int = 1 << 18,
      minLogitMicro: Long = Long.MinValue,
      // bigram upgrade of the perplexity gate, parameter-symmetric with
      // Corpus.prepare: with `biLm` the gate scores under the
      // stupid-backoff n-gram model instead of the unigram scorer
      biLm: Option[DataFrame] = None,
      lmBackoff: Double = 0.4,
      // trained language gate, parameter-symmetric with Corpus.prepare:
      // with `langClassifier` the language selection scores argmax under
      // the multi-class model instead of the marker vote
      langClassifier: Option[DataFrame] = None,
      langClassifierDim: Int = 1 << 18): Unit = {
    // a bench set with the threshold left at its 1.0 default means the
    // caller BELIEVES decontamination is on while the gate below
    // (`if maxContamFrac < 1.0`) never fires — refuse loudly instead of
    // silently ingesting contaminated documents
    require(benchDocs.isEmpty || maxContamFrac < 1.0,
      "pollIngest: benchDocs given but maxContamFrac is 1.0 (gate off) — " +
        "set maxContamFrac < 1.0 to decontaminate, or drop benchDocs")
    require(lmModel.isEmpty || maxPpl < Double.MaxValue,
      "pollIngest: lmModel given but maxPpl is unset (gate off) — " +
        "set maxPpl to floor on perplexity, or drop lmModel")
    require(biLm.isEmpty || lmModel.nonEmpty,
      "pollIngest: biLm given without lmModel — the bigram gate backs " +
        "off to the unigram model; pass both")
    require(classifier.isEmpty || minLogitMicro > Long.MinValue,
      "pollIngest: classifier given but minLogitMicro is unset (gate " +
        "off) — set the logit floor, or drop the classifier argument")
    require(if (langs.isEmpty) langMarkers.isEmpty
        else langMarkers.nonEmpty || langClassifier.nonEmpty,
      "pollIngest: langs needs a language identifier (langMarkers or " +
        "langClassifier) and vice versa — pass them together")
    require(langClassifier.isEmpty || langs.nonEmpty,
      "pollIngest: langClassifier given but langs is empty (gate off) — " +
        "select the languages to keep, or drop the classifier")
    // an empty stop list zeroes the score's 0.3 stopword band — a caller
    // flooring at minQuality > 0.7 would silently drop EVERYTHING, and
    // any positive floor would silently diverge from the batch prepare
    // (where stops is a mandatory argument feeding the same score)
    require(minQuality <= 0.0 || qualityStops.nonEmpty,
      "pollIngest: minQuality set but qualityStops is empty — the quality " +
        "score's stopword band would be zero for every document; pass the " +
        "stop list the batch prepare uses")
    spark.readStream.schema(landingSchema).parquet(s"$landingDir/*")
      .writeStream.option("checkpointLocation", s"$workDir/ckpt")
      .outputMode("append")
      .foreachBatch { (batch1: DataFrame, batchId: Long) =>
        val sp = batch1.sparkSession
        val normGated =
          if (!normalize) batch1
          else batch1.withColumn("text",
            graft.llm.Quality.normalizeText(col("text")))
        // semantic floor first — the batch prepare order (embedding
        // near-dups drop before any text floor sees them)
        val batch0 =
          if (semMinCos >= 1.0) normGated
          else semGate(sp, normGated, workDir, indexDir, semMinCos,
            p.compactEvery, batchId)
        val spanGated =
          if (spanTokens <= 0) batch0
          else {
            SpanDupStream.processBatch(sp, batch0.select("doc_id", "text"),
              workDir, SpanDupStream.Params(spanTokens, spanMinDocs,
                p.compactEvery), batchId)
            val floored = sp.read.schema(SpanDupStream.statsSchema)
              .parquet(s"$workDir/stats/b$batchId")
              .filter(col("dup_frac") > maxDupFrac)
              .select("doc_id")
            batch0.join(floored, Seq("doc_id"), "left_anti")
          }
        // within-document repetition floor is stateless per delivery AND
        // doc-local: the same compiled scan filter as Corpus.prepare
        // (repetitionPass — no drop list, no join, no shuffle); null
        // id/text rows pass through to die in the final quality gate
        val repGated =
          if (maxDupWordFrac >= 1.0 && maxTopBigramFrac >= 1.0) spanGated
          else spanGated.filter(col("doc_id").isNull || col("text").isNull ||
            graft.llm.Quality.repetitionPass(col("text"),
              maxDupWordFrac, maxTopBigramFrac))
        // Gopher rule floor: doc-local column math (the batch prepare's
        // gate with the identical parameter tail) — a TRUE filter via
        // gopherPass, no join, no state, no shuffle
        val gopherGated =
          if (!gopher) repGated
          else repGated.filter(col("doc_id").isNull || col("text").isNull ||
            graft.llm.Quality.gopherPass(col("text"), stops = gopherStops))
        // perplexity floor: stateless per delivery like the repetition
        // gate — the vocab-sized model broadcasts into the batch plan
        val pplGated = lmModel match {
          case Some(model) if maxPpl < Double.MaxValue =>
            val scored = biLm match {
              case Some(bi) => graft.llm.Quality.ngramPerplexity(
                gopherGated, model, bi, "doc_id", "text", lmBackoff)
              case None => graft.llm.Quality.lmPerplexity(gopherGated,
                model, "doc_id", "text")
            }
            gopherGated.join(
              scored.filter(col("ppl") > maxPpl).select("doc_id"),
              Seq("doc_id"), "left_anti")
          case _ => gopherGated
        }
        // classifier floor: the batch prepare's gate at the identical
        // parameter tail — frozen weight table broadcasts into the
        // delivery-sized plan, exact integer logits, drop-list left-anti
        val clfGated = classifier match {
          case Some(w) if minLogitMicro > Long.MinValue =>
            pplGated.join(
              graft.llm.Quality.scoreTextClassifier(pplGated, "doc_id",
                  "text", w, classifierDim)
                .filter(col("logit_micro") < minLogitMicro)
                .select("doc_id"),
              Seq("doc_id"), "left_anti")
          case _ => pplGated
        }
        val contamGated = benchDocs match {
          case Some(bench) if maxContamFrac < 1.0 =>
            clfGated.join(
              graft.llm.Dedup.contaminationStats(clfGated, bench,
                  "doc_id", "text", contamN, hashShingles = contamHash)
                .filter(col("contam_frac") > maxContamFrac)
                .select("doc_id"),
              Seq("doc_id"), "left_anti")
          case _ => clfGated
        }
        // quality/language floor: prepare's built-in final filter as an
        // optional landing gate — doc-local column math, same rounded
        // fixed point, so stream ≡ batch exactly
        val qualityGated = {
          val q = if (minQuality <= 0.0) contamGated
            else contamGated.filter(round(
              graft.llm.TextStats.qualityScore(col("text"), qualityStops),
              6) >= minQuality)
          langClassifier match {
            case Some(w) if langs.nonEmpty =>
              q.join(
                graft.llm.Quality.langIdTrained(q, "doc_id", "text", w,
                    langClassifierDim)
                  .filter(col("lang").isin(langs: _*))
                  .select("doc_id"),
                Seq("doc_id"), "left_semi")
            case _ =>
              if (langs.isEmpty) q
              else q.filter(graft.llm.TextStats.langId(col("text"),
                langMarkers).isin(langs: _*))
          }
        }
        val batch = qualityGated
        DedupStream.processBatch(sp, batch.select("doc_id", "text"),
          workDir, p, batchId)
        // explicit schema: an all-filtered batch writes an assignment dir
        // with zero part files, where schema inference would throw
        val assigned = sp.read.schema(
            StructType(Seq(StructField("doc_id", LongType),
              StructField("rep_id", LongType))))
          .parquet(s"$workDir/assign/b$batchId")
        val newReps = assigned.filter(col("rep_id") === col("doc_id"))
          .select(col("doc_id").as("vec_id"))
        // dropDuplicates: a doc_id landing twice in one delivery (double-
        // landed file rows) must still append ONE vector — readers never
        // re-check the one-vector-per-representative invariant
        val newVecs = batch
          .select(col("doc_id").as("vec_id"), col("embedding"))
          .dropDuplicates("vec_id")
          .join(newReps, "vec_id")
        Similarity.appendIvfIndex(newVecs, "vec_id", "embedding", indexDir,
          Some(s"b$batchId"))
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          Similarity.compactIvfIndex(sp, indexDir, retain)
      }
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
  }

  /** Close the cross-batch deviation END TO END, offline (poller
    * stopped): run [[DedupStream.repairMerges]] — bridge clusters the
    * stream left split merge to their true component reps — then PRUNE
    * the index to exactly the repaired representative set. Every
    * post-repair rep is an EXISTING rep (a merged component's rep is the
    * min assigned doc id = the min of its sub-clusters' reps, and every
    * sub-cluster rep was indexed when it appeared), so pruning the stored
    * corpus is sufficient: no embedding needs to be re-landed, and
    * afterwards the index holds one vector per REPAIRED cluster — the
    * state a batch pipeline over the full corpus would have produced.
    * Rides the index version protocol ([[graft.llm.Similarity
    * .rewriteIvfIndex]]): crash-safe, `_FOLDED` ledger carried, resuming
    * the poller afterwards is the documented single-writer hand-back. */
  def repairAndPrune(spark: SparkSession, workDir: String, indexDir: String,
      p: DedupStream.Params = DedupStream.Params(), retain: Int = 0): Unit = {
    DedupStream.repairMerges(spark, workDir, p)
    val reps = DedupStream.assignments(spark, workDir)
      .filter(col("rep_id") === col("doc_id"))
      .select(col("doc_id").as("neighbor_id"))
    // plain semi-join: the representative set IS the deduplicated corpus
    // (huge at scale) — no broadcast hint; AQE may still choose one when
    // it fits
    Similarity.rewriteIvfIndex(spark, indexDir, retain)(
      _.join(reps, Seq("neighbor_id"), "left_semi"))
  }

  /** Offline repair of the semantic gate's cross-delivery deviation —
    * [[DedupStream.repairMerges]]' twin for the `sem/` state. The gate
    * scores each delivery against SURVIVORS only, so a document near an
    * already-DROPPED document (but no survivor) survives where batch
    * [[Similarity.semDedup]] over the full corpus would fold it into the
    * chain component (documented at [[pollIngest]]). The state carries
    * every scorable vector it ever gated, dropped ones included (see
    * `semSchema`), so the FULL within-cell near-dup graph is rebuildable
    * offline: [[Similarity.semDedupDropped]] over ALL stored vectors
    * (the index's current coarse centroids, the gate's own geometry),
    * survivors = component min-ids — exactly the batch rule. Kept flags
    * rewrite into the `snap<maxId>r` repaired-snapshot flavor (rename-
    * once, wins the same-id tie, idempotent re-repair skips an existing
    * snapshot), and newly-dropped documents are pruned from the index
    * under the version protocol. Run with the poller STOPPED (the
    * single-writer contract); the restarted poller reads the repaired
    * snapshot like any other state. Like `repairMerges`, the fold stops
    * at the checkpoint-committed frontier so a mid-batch crash replays
    * cleanly. Scope: the sem state and the index — cluster/assignment
    * state keeps its landing-time membership, exactly as the dedup
    * repair leaves the sem state alone. Assumes the semantic gate was
    * enabled for every delivery in this work dir — a pre-gate document
    * has no sem-state row and the survivor prune would drop it from the
    * index.
    *
    * PipelineStreamSpec pins stream + repairSem ≡ batch `semDedup`
    * survivors on the bridge-chain fixture. */
  /** The semantic gate's current survivor set as a (vec_id, cell) table
    * — every state row with `kept = true`, repaired snapshots included
    * ([[DedupStream.assignments]]' twin for the `sem/` state). */
  def semSurvivors(spark: SparkSession, workDir: String): DataFrame =
    DedupStream.readState(spark, s"$workDir/sem", semSchema, Long.MaxValue)
      .filter(col("kept")).select("vec_id", "cell")

  def repairSem(spark: SparkSession, workDir: String, indexDir: String,
      semMinCos: Double, retain: Int = 0): Unit = {
    import org.apache.hadoop.fs.Path
    val root = s"$workDir/sem"
    val (snap, bdirs) = DedupStream.stateDirs(spark, root, Long.MaxValue)
    val dirMax = (snap.map(_._1).toSeq ++ bdirs.map(_._1)).maxOption
      .getOrElse(return)
    val maxId = DedupStream.committedFrontier(spark, workDir)
      .getOrElse(dirMax).min(dirMax)
    val S = DedupStream.readState(spark, root, semSchema, maxId + 1)
      .localCheckpoint()
    val cents = Similarity.ivfCentroids(spark, indexDir)
    val drops = Similarity.semDedupDropped(
      S.select(col("vec_id"), col("embedding")), cents,
      "vec_id", "embedding", semMinCos)
    val newS = S.join(drops.withColumnRenamed("_drop", "vec_id")
        .withColumn("_d", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("embedding"),
        col("_d").isNull.as("kept"))
    val f = DedupStream.fs(spark, root)
    val target = new Path(root, s"snap${maxId}r")
    if (!f.exists(target)) {
      val tmp = new Path(root, s".tmpsnap${maxId}r")
      newS.sortWithinPartitions("cell")
        .write.mode("overwrite").parquet(tmp.toString)
      if (!f.rename(tmp, target))
        throw new java.io.IOException(
          s"semantic repair rename failed: $root/snap${maxId}r")
    }
    DedupStream.sweep(spark, root, maxId)
    val kept = DedupStream.readState(spark, root, semSchema, maxId + 1)
      .filter(col("kept")).select(col("vec_id").as("neighbor_id"))
    Similarity.rewriteIvfIndex(spark, indexDir, retain)(
      _.join(kept, Seq("neighbor_id"), "left_semi"))
  }
}
