package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora — exact, MinHash+LSH,
  * SimHash, and exact n-gram Jaccard via an inverted shingle index.
  *
  * Scale design (the point of these shapes at 100 TB):
  *   - exact dedup shuffles 32-byte content hashes, never full documents;
  *   - Jaccard candidates come from an equi-join on shingles (inverted
  *     index), never an all-pairs cross join — cost is Σ df(shingle)², which
  *     AQE skew-splits; a df-cap filter (`maxShingleDf`) bounds hot shingles;
  *   - MinHash reduces each document to a fixed-width signature in ONE
  *     aggregation pass (k mins over one explode), and LSH banding turns
  *     near-dup search into b equi-joins on 8-byte band keys;
  *   - SimHash banding is exact for hamming ≤ bands−1 by pigeonhole: any
  *     pair within distance d < b must agree on ≥1 of b disjoint bit bands.
  */
object Dedup {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct n-word shingles as array<string>; empty when < n tokens.
    *
    * Performance note: when `text` is a raw text column, the tokenize
    * runs INSIDE the transform lambda — re-splitting the document per
    * shingle position (lambdas are interpreted, and CollapseProject
    * refuses to substitute a multiply-referenced split into them).
    * Hot paths should project `tokens(text)` into a bound column first
    * and call [[shinglesFromTokens]] — measured ~2× on the shingle-
    * dominated pipelines. */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** [[shingles]] over an ALREADY-TOKENIZED column (ideally a bound
    * attribute — see the performance note there). */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    // compiled one-pass windows ([[graft.functions.Cols.windowStrings]]
    // — zero-copy views over one joined buffer, byte-identical to the
    // transform/slice/array_join form it replaces, which re-ran an
    // interpreted lambda per position and allocated every window);
    // short arrays yield [] inside the kernel, null arrays keep the
    // historical empty-array result
    when(toks.isNotNull,
      array_distinct(graft.functions.Cols.windowStrings(toks, n)))
      .otherwise(array().cast("array<string>"))

  /** Exact dedup by content hash: one row per distinct content with the
    * smallest id as representative. Shuffles sha2 hashes, not documents.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))

  /** Exact-duplicate pre-collapse shared by the near-dup pair generators:
    * returns (membership, repDocs) where membership maps every document
    * (`_id`) to the min-id representative of its exact-content group
    * (`_rid`) and repDocs (`_id`, `_text`) holds one document per distinct
    * content. Banding / indexing ONLY representatives removes the
    * hot-bucket quadratic: B byte-identical documents (the NORM in crawl
    * corpora — boilerplate, mirrors, reposts) would otherwise put B copies
    * into every band bucket and push B² candidate pairs through the band
    * self-join before any `distinct` can drop them. After collapse a group
    * contributes ONE row per bucket; member pairs re-expand afterwards at
    * output-proportional cost ([[expandMemberPairs]]). Only 8-byte ids and
    * 32-byte content hashes shuffle here, never documents.
    */
  private[graft] def collapseExactDups(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val base = docs.select(col(idCol).cast("long").as("_id"), col(textCol).as("_text"))
      .filter(col("_id").isNotNull && col("_text").isNotNull)
    val members = base.select(col("_id"), sha2(col("_text"), 256).as("_ch"))
    val groups = members.groupBy("_ch").agg(min("_id").as("_rid"))
    // the membership table is consumed by several separate JOBS of every
    // caller (the eager shingle-set checkpoint, the candidate/verify query,
    // the member re-expansion) and cross-job plans share no exchange reuse
    // — without materialization the full-content sha2 shuffle re-runs once
    // per job. localCheckpoint pins the 16-byte (id, rid) rows once; the
    // representative filter below is then a block read, not a second
    // aggregation over the corpus.
    val m = members.join(groups, "_ch").select(col("_id"), col("_rid"))
      .localCheckpoint()
    val repDocs = base.join(m.filter(col("_id") === col("_rid")).select("_id"),
      Seq("_id"), "left_semi")
    (m, repDocs)
  }

  /** Representatives whose content actually produces shingles (≥ n
    * tokens) — the only groups whose members can appear in a pair table
    * (a document with no shingles never bands and never becomes a
    * candidate, so exact copies of it must NOT pair either). */
  private def bandableReps(repDocs: DataFrame, n: Int): DataFrame =
    repDocs.filter(size(split(lower(col("_text")), " ")) >= n)
      .select(col("_id").as("_rid"))

  /** Expand representative-level pairs back to member-level pairs.
    * Cross-group member pairs inherit their rep pair's value columns
    * verbatim (identical content ⇒ identical similarity to everything);
    * within-group pairs (exact duplicates of each other) take the value
    * columns carried on `withinGroups` (`_rid` + value columns — pass only
    * groups that should self-pair). Cost is proportional to the OUTPUT
    * pair count, which is the inherent size of a member-level pair table;
    * consumers that only need clusters should use
    * [[minhashRepresentatives]] and skip this expansion entirely.
    */
  private[llm] def expandMemberPairs(repPairs: DataFrame, m: DataFrame,
      withinGroups: DataFrame, valueCols: Seq[String]): DataFrame = {
    val vals = valueCols.map(col)
    val rp = repPairs.select(col("i").as("_ri") +: col("j").as("_rj") +: vals: _*)
    val cross = rp
      .join(m.select(col("_rid").as("_ri"), col("_id").as("_a")), "_ri")
      .join(m.select(col("_rid").as("_rj"), col("_id").as("_b")), "_rj")
      .select(least(col("_a"), col("_b")).as("i") +:
        greatest(col("_a"), col("_b")).as("j") +: vals: _*)
    val within = m.join(withinGroups, "_rid")
      .select(col("_rid") +: col("_id").as("_a") +: vals: _*)
      .join(m.select(col("_rid"), col("_id").as("_b")), "_rid")
      .filter(col("_a") < col("_b"))
      .select(col("_a").as("i") +: col("_b").as("j") +: vals: _*)
    cross.unionByName(within)
  }

  /** Loud band-bucket cap: when `cap` > 0, buckets holding more than `cap`
    * DISTINCT fingerprints are dropped from candidate generation — a B-row
    * bucket inherently feeds B² pairs through the band self-join, which no
    * optimizer can split — with a WARN naming the count (recall loss must
    * be loud, never silent). 0 disables the cap (exact semantics — the
    * oracle-differential setting). Callers collapse exact duplicates
    * first, so only a bucket of genuinely DIVERSE near-identical contents
    * can trip it.
    */
  private[graft] def capBandBuckets(bt: DataFrame, keys: Seq[String],
      cap: Long, what: String): DataFrame =
    if (cap <= 0L) bt
    else {
      // materialize the band table ONCE: the hot-bucket count below is an
      // eager separate job, and the caller then feeds the capped result
      // into both sides of a self-join — without this, the full band
      // computation (a typed flatMap over every representative document)
      // would run once for the count and again per consumer, since
      // cross-job plans share no exchange reuse. localCheckpoint (not
      // cache): no CacheManager entry to leak, blocks are narrow
      // (id + band + digest) and freed by the ContextCleaner.
      val mat = bt.localCheckpoint()
      val hot = mat.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
        .filter(col("_n") > cap)
        .select(keys.map(col): _*)
      val nHot = hot.count()
      if (nHot > 0)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"$what: dropping $nHot band bucket(s) exceeding maxBandBucket=$cap " +
            "distinct fingerprints — near-duplicate recall is reduced for their members")
      mat.join(broadcast(hot), keys, "left_anti")
    }

  /** (id, shingle) long table, distinct per document. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("_id"), tokens(col(textCol)).as("_tk"))
      .select(col("_id"),
        explode(shinglesFromTokens(col("_tk"), n)).as("shingle"))

  /** FNV-1a 64-bit string hash (public-domain algorithm) — the kernel-side
    * shingle/token hash. */
  @inline def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Sorted distinct hashed n-gram shingle sets, built in one typed map —
    * the column-expression form (split/transform/slice/array_join/
    * array_distinct/array_sort) evaluates interpreted per element and is an
    * order of magnitude slower on wide documents. Sorted ascending = the
    * global "hash order" used by prefix filtering.
    */
  def hashedShingleSets(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
        val m = math.max(0, toks.length - n + 1)
        val raw = new Array[Long](m)
        var i = 0
        while (i < m) {
          val sb = new StringBuilder(toks(i))
          var k = i + 1
          while (k < i + n) { sb.append(' ').append(toks(k)); k += 1 }
          raw(i) = fnv64(sb.toString)
          i += 1
        }
        // primitive sort + in-place dedup (no boxing)
        java.util.Arrays.sort(raw)
        var w = 0; var r = 0
        while (r < m) {
          if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
          r += 1
        }
        (id, java.util.Arrays.copyOf(raw, w))
      }.toDF("_id", "_sh")
  }

  /** Exact-Jaccard verification of id-only candidate pairs: join the cached
    * shingle sets once per side, then merge-count the two ascending arrays
    * in a typed mapPartitions kernel. (A `udf` + filter formulation of the
    * same math measured ~20× slower here — the UDF forces the verify stage
    * out of codegen into per-row interpreted evaluation.)
    */
  private[graft] def verifyJaccard(cand: DataFrame, sets: DataFrame,
      minJaccard: Double): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    cand
      .join(sets.select(col("_id").as("i"), col("_sh").as("sh_i")), "i")
      .join(sets.select(col("_id").as("j"), col("_sh").as("sh_j")), "j")
      .select(col("i"), col("j"), col("sh_i"), col("sh_j"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .mapPartitions { rows =>
        rows.flatMap { case (i, j, a, b) =>
          var x = 0; var y = 0; var m = 0L
          while (x < a.length && y < b.length) {
            if (a(x) == b(y)) { m += 1; x += 1; y += 1 }
            else if (a(x) < b(y)) x += 1 else y += 1
          }
          val jac = m.toDouble / (a.length + b.length - m)
          if (jac >= minJaccard) Iterator.single((i, j, jac)) else Iterator.empty
        }
      }.toDF("i", "j", "jaccard")
  }

  /** Exact n-gram Jaccard pairs ≥ minJaccard via **prefix-filtered**
    * inverted index (Chaudhuri/Xiao-style): under any fixed global shingle
    * order, two sets with Jaccard ≥ τ must share an element within their
    * first |d| − ⌈τ·|d|⌉ + 1 shingles — so only those prefixes are indexed
    * and joined, shrinking candidate generation ~(1−τ)²× while staying
    * exact. Candidates are then verified with true set intersection.
    *
    * `maxShingleDf` additionally drops prefix shingles present in more than
    * that many DISTINCT contents (stopword-shingle skew guard; exact
    * duplicates are pre-collapsed before the index is built, so the count
    * is duplicate-robust). 0 = keep all, which preserves exactness — the
    * setting used for oracle differential tests.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, n: Int,
      minJaccard: Double, maxShingleDf: Long = 0L): DataFrame = {
    // Exact-duplicate pre-collapse: index, candidate join, and
    // verification all run over DISTINCT contents only (B copies of a
    // boilerplate page contribute ONE set of prefix probes, not B copies
    // in every probe bucket → B² candidates); member pairs re-expand at
    // output-proportional cost at the end.
    val (m, repDocs) = collapseExactDups(docs, idCol, textCol)
    // Shingles travel as 64-bit hashes: 3× less shuffle than strings and
    // integer equi-joins; a collision would need ~10⁹ distinct shingles in
    // one corpus to matter (birthday bound).
    // Global shingle order = the hash value itself. Any fixed total order
    // preserves prefix-filter exactness, and hash order (i) decorrelates
    // prefix membership from vocabulary frequency — a lexicographic order
    // puts the same hot shingles in every prefix and regenerates the n²
    // candidate blow-up — and (ii) needs NO global document-frequency pass.
    // localCheckpoint, not cache(): the DAG below consumes it three times
    // (prefix probes + both verify sides); eager localCheckpoint
    // materializes once WITHOUT registering in the CacheManager, so blocks
    // are freed by the ContextCleaner when the plan is GC'd — a bare
    // .cache() here leaked storage in long-running services until an
    // explicit clearCache(). Known tradeoffs (they apply to every
    // localCheckpoint in this module): (i) materialization is EAGER —
    // CONSTRUCTING this DataFrame runs the shingle job even if the caller
    // never executes the result; (ii) checkpointed blocks carry no
    // lineage, so an executor lost while holding them fails the query
    // instead of recomputing — on clusters with dynamic allocation /
    // spot executors, disable executor decommission for these jobs or
    // swap in reliable checkpoint() to an HDFS dir.
    val sets = hashedShingleSets(repDocs, "_id", "_text", n)
      .filter(size(col("_sh")) > 0)
      .localCheckpoint()
    val prefLen = (size(col("_sh")) - ceil(size(col("_sh")) * minJaccard) + 1).cast("int")
    // probes are (id, shingle) ONLY — the full set never rides through the
    // inverted-index join, so per-match shuffle is 16 bytes, not an array.
    // Candidates dedup to id pairs, then verification joins the cached sets
    // once per side (the same shape minhashDedupPairs uses).
    val probes0 = sets.select(col("_id"),
      explode(slice(col("_sh"), lit(1), prefLen)).as("shingle"))
    val probes =
      if (maxShingleDf <= 0) probes0
      else {
        val hot = probes0.groupBy("shingle").agg(count(lit(1)).as("_df"))
          .filter(col("_df") > maxShingleDf).select("shingle")
        probes0.join(broadcast(hot), Seq("shingle"), "left_anti")
      }
    val cand = probes.select(col("_id").as("i"), col("shingle"))
      .join(probes.select(col("_id").as("j"), col("shingle")), "shingle")
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
    val repPairs = verifyJaccard(cand, sets, minJaccard)
    // within-group (exact-duplicate) pairs have Jaccard exactly 1.0; only
    // groups that produce shingles self-pair (`sets` is already filtered)
    expandMemberPairs(repPairs, m,
      sets.select(col("_id").as("_rid"), lit(1.0).as("jaccard"))
        .filter(lit(1.0) >= minJaccard),
      Seq("jaccard"))
  }

  /** MinHash signature: k column mins over one shingle explode.
    * Output: (_id, h0 … h{k-1}).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, n)
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy("_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs: split the k-wide signature into `bands` bands of
    * k/bands rows; two docs are candidates when any band hashes equal.
    * One explode + one equi-join shuffle on (band, bandHash).
    */
  def lshCandidates(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val bandStructs = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        xxhash64((bi * r until (bi + 1) * r).map(i => col(s"h$i")): _*).as("bh"))
    }
    val exploded = sig.select(col("_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    exploded.alias("a").join(exploded.alias("b"), Seq("band", "bh"))
      .filter(col("a._id") < col("b._id"))
      .select(col("a._id").as("i"), col("b._id").as("j")).distinct()
  }

  /** Murmur3 finalizer (public-domain mixing constants) — permutes a
    * shingle hash into the i-th minhash family member. */
  @inline private def mix(h: Long, i: Int): Long = {
    var x = h ^ (0x9E3779B97F4A7C15L * (i + 1))
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
    x
  }

  /** (id, band, bandHash) LSH bucket table computed in ONE typed map per
    * document: k minhash mins and the band digests come out of the same
    * shingle pass — no explode, no k-column aggregation. */
  def minhashBandTable(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
        val mins = Array.fill(numHashes)(Long.MaxValue)
        var i = 0
        while (i + n <= toks.length) {
          val sb = new StringBuilder(toks(i))
          var k = i + 1
          while (k < i + n) { sb.append(' ').append(toks(k)); k += 1 }
          val h = fnv64(sb.toString)
          var f = 0
          while (f < numHashes) {
            val m = mix(h, f)
            if (m < mins(f)) mins(f) = m
            f += 1
          }
          i += 1
        }
        if (i == 0) Iterator.empty
        else (0 until bands).iterator.map { b =>
          var bh = 1125899906842597L
          var j = b * r
          while (j < (b + 1) * r) { bh = 31 * bh + mins(j); j += 1 }
          (id, b, bh)
        }
      }.toDF("_id", "band", "bh")
  }

  /** Band-join candidate pairs among REPRESENTATIVE documents only (one
    * per distinct content — callers run [[collapseExactDups]] first). The
    * self-join key space is distinct contents, so a duplicate-heavy corpus
    * cannot inflate any bucket; `maxBandBucket` > 0 additionally drops
    * (loudly) buckets of more than that many distinct fingerprints.
    * Exposed package-private as the stress-test observation point: specs
    * assert the candidate count stays bounded under planted mass
    * duplication. */
  private[graft] def minhashRepCandidates(repDocs: DataFrame, n: Int,
      numHashes: Int, bands: Int, maxBandBucket: Long): DataFrame = {
    val bt = capBandBuckets(
      minhashBandTable(repDocs, "_id", "_text", n, numHashes, bands),
      Seq("band", "bh"), maxBandBucket, "minhashDedupPairs")
    bt.alias("a").join(bt.alias("b"), Seq("band", "bh"))
      .filter(col("a._id") < col("b._id"))
      .select(col("a._id").as("i"), col("b._id").as("j")).distinct()
  }

  /** MinHash+LSH near-dup pairs, exact-verified: band candidates are checked
    * with true shingle-set Jaccard (array intersect on the two docs' shingle
    * sets), so emitted pairs are exactly those ≥ minJaccard that banding
    * surfaced. Verification joins only candidate ids — no second index pass.
    *
    * Exact duplicates are PRE-COLLAPSED before banding ([[collapseExactDups]]):
    * banding, candidate generation, and verification see one representative
    * per distinct content, and member pairs re-expand afterwards (cross-group
    * pairs inherit the rep pair's Jaccard — identical content ⇒ identical
    * similarity; within-group pairs are exactly 1.0). This kills the
    * hot-bucket quadratic (B identical docs → B² candidates in one bucket)
    * while leaving the emitted pair set bit-identical. `maxBandBucket` > 0
    * drops oversized DISTINCT-content buckets with a loud WARN (0 = exact,
    * the oracle setting). Consumers that only need clusters should prefer
    * [[minhashRepresentatives]], which skips the (output-inherent)
    * member-pair expansion entirely.
    */
  def minhashDedupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int, minJaccard: Double,
      maxBandBucket: Long = 0L): DataFrame = {
    val (m, repDocs) = collapseExactDups(docs, idCol, textCol)
    val cand = minhashRepCandidates(repDocs, n, numHashes, bands, maxBandBucket)
    // hashed shingle sets over representatives (see jaccardPairs):
    // localCheckpoint, not cache() — both verify sides reuse it without a
    // CacheManager entry to leak.
    val sets = hashedShingleSets(repDocs, "_id", "_text", n).localCheckpoint()
    val repPairs = verifyJaccard(cand, sets, minJaccard)
    expandMemberPairs(repPairs, m,
      bandableReps(repDocs, n).select(col("_rid"), lit(1.0).as("jaccard"))
        .filter(lit(1.0) >= minJaccard),
      Seq("jaccard"))
  }

  /** Tiered connected components (label propagation with star-contraction
    * fallback — see [[withRepresentatives]] for the rationale). */
  private[graft] def componentsTiered(pairs: DataFrame): DataFrame = {
    val pairsC = pairs.select(col("i"), col("j")).localCheckpoint()
    try connectedComponents(pairsC, maxIter = 12)
    catch {
      // ONLY the round-cap blowout falls over to star — any other
      // IllegalArgumentException is a real defect and must surface
      case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.contains("did not converge") =>
        connectedComponentsStar(pairsC)
    }
  }

  /** Full near-duplicate dedup (docs columns + `rep_id`) WITHOUT ever
    * materializing the member-level pair set — the SCALE path for
    * clustering. [[minhashDedupPairs]] → [[withRepresentatives]] must
    * expand B byte-identical documents into B·(B−1)/2 pairs (inherent for
    * a pair TABLE, pure waste when the goal is components: 10⁶ copies of
    * one boilerplate page = 5·10¹¹ pairs). Here banding, verification, and
    * connected components all run on DISTINCT contents, and members
    * inherit their representative's component at the end — valid because
    * each rep is the min id of its exact group, so the component min over
    * members equals the min over reps. Documents with fewer than n tokens
    * produce no shingles, hence no pairs, hence stay their own
    * representative (matching the pair-table semantics exactly;
    * equivalence is property-tested against the expanded path).
    */
  def minhashRepresentatives(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int, minJaccard: Double,
      maxBandBucket: Long = 0L): DataFrame = {
    val (m, repDocs) = collapseExactDups(docs, idCol, textCol)
    val cand = minhashRepCandidates(repDocs, n, numHashes, bands, maxBandBucket)
    val sets = hashedShingleSets(repDocs, "_id", "_text", n).localCheckpoint()
    val repPairs = verifyJaccard(cand, sets, minJaccard)
    val comp = componentsTiered(repPairs)
    val inherit =
      if (minJaccard > 1.0) m.filter(lit(false)) // within-group Jaccard 1.0 < threshold
      else m.join(bandableReps(repDocs, n), "_rid")
    val repComp = inherit
      .join(comp.select(col("id").as("_rid"), col("component")), Seq("_rid"), "left")
      .select(col("_id"), coalesce(col("component"), col("_rid")).as("_comp"))
    docs.join(repComp, docs(idCol).cast("long") === repComp("_id"), "left")
      .withColumn("rep_id", coalesce(col("_comp"), docs(idCol).cast("long")))
      .drop("_id", "_comp")
  }

  /** Connected components over a near-duplicate pair table — the step that
    * turns pairs into CLUSTERS so a corpus can actually be deduplicated
    * (each component keeps one survivor). Distributed min-label
    * propagation: every node starts as its own label; each round, every
    * node adopts the minimum label among itself and its neighbors;
    * converges in O(component diameter) rounds (near-dup chains are
    * shallow). Each round is one equi-join + one aggregation, and the
    * label frontier is `localCheckpoint`ed so lineage (and Catalyst
    * analysis cost) stays CONSTANT per round instead of compounding.
    *
    * @return (id, component) with component = min id reachable
    */
  /** Driver union-find cutover bound for both CC solvers: an edge list
    * at or below this many DISTINCT rows (16 bytes each — ≤ 64 MB at
    * the default 2²²) collects to the driver and solves with
    * union-by-min + path compression in microseconds, instead of paying
    * 3–4 chained tiny shuffle stages per distributed round on a
    * metadata-sized frontier (~100 ms/round of pure job latency at any
    * scale factor). Above the bound the distributed loops run
    * unchanged — the tiering is SIZE-adaptive, not a local-mode
    * constant: a 100 TB corpus whose verified near-dup pair table still
    * fits the bound (pairs are post-banding metadata, not documents)
    * takes the same driver path a laptop does, and a genuinely huge
    * pair graph iterates distributed. Session-configurable so the
    * equality tests exercise both paths (0 disables the cutover). */
  private def ccDriverMaxEdges(
      spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get("spark.graft.cc.driverMaxEdges",
      (1L << 22).toString).toLong

  /** Union-find with union-by-min-root and full path compression: every
    * union links the LARGER root under the smaller, so each final root
    * is its component's minimum id — exactly the fixed point both
    * distributed solvers converge to. Returns node → component-min for
    * every node that appears in `edges` (minima map to themselves). */
  private def unionFindMin(
      edges: Array[(Long, Long)]): scala.collection.mutable.LongMap[Long] = {
    val parent =
      new scala.collection.mutable.LongMap[Long](edges.length * 2 + 8)
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) {
        val gp = parent.getOrElse(p, p)
        parent.update(x, gp); x = p; p = gp
      }
      x
    }
    edges.foreach { case (a, b) =>
      if (!parent.contains(a)) parent.update(a, a)
      if (!parent.contains(b)) parent.update(b, b)
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent.update(rb, ra)
      else if (rb < ra) parent.update(ra, rb)
    }
    parent.keys.toArray.foreach(k => parent.update(k, find(k)))
    parent
  }

  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // The ITERATION runs on RDDs: a DataFrame loop pays Catalyst planning
    // plus one AQE query-stage job PER EXCHANGE per round (~10 driver
    // round-trips each), which dominates wall time on metadata-sized
    // frontiers — the RDD loop is one job per round (count on the
    // checkpointed frontier) plus one cheap isEmpty. Ids are processed as
    // longs and the result cast back to the caller's id type, so the
    // output schema is unchanged.
    val spark = pairs.sparkSession
    import spark.implicits._
    val iType = pairs.schema("i").dataType
    val edges0 = pairs
      .select(col("i").cast("long"), col("j").cast("long"))
      .as[(Long, Long)].rdd
      .flatMap { case (i, j) => Iterator((i, j), (j, i)) }
      .distinct().localCheckpoint()
    val edgeCount = edges0.count()
    val cap = ccDriverMaxEdges(spark)
    if (cap > 0L && edgeCount <= cap) {
      // metadata-sized graph: one bounded collect (≤ cap rows, the
      // weight-table-guard pattern), solve on the driver, done — no
      // distributed rounds at all
      val comp = unionFindMin(edges0.collect())
      return comp.toSeq.toDF("id", "component")
        .select(col("id").cast(iType).as("id"),
          col("component").cast(iType).as("component"))
    }
    // one fixed partitioner for the whole loop: the per-round
    // reduceByKey and both joins then run NARROW against it, so a round
    // costs ONE shuffle (the candidate label updates) instead of four —
    // in particular the full edge set is never re-shuffled per round
    val part = new org.apache.spark.HashPartitioner(
      math.max(edges0.getNumPartitions, 1))
    // keyed by DEST (j): each edge row delivers its source id as a label
    // candidate to j's partition
    val edgesRev = edges0.map { case (i, j) => (j, i) }
      .partitionBy(part).localCheckpoint()
    var labels = edgesRev.mapPartitions(
        _.map { case (j, _) => (j, j) }, preservesPartitioning = true)
      .reduceByKey(part, (a, _) => a).localCheckpoint()
    labels.count()
    // convergence piggybacks on the checkpoint-materializing count():
    // the mapValues closure bumps the accumulator for every label that
    // changed this round, so `value == 0` IS the fixed-point test — no
    // second job per round. Task retries can only over-count real
    // changes (a round with zero changes has nothing to add), so the
    // == 0 test is exact; later reads of the checkpointed RDD replay
    // stored blocks, not the closure.
    val changed = spark.sparkContext.longAccumulator("cc label changes")
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = edgesRev
        .join(labels) // narrow: both sides partitioned by `part`
        .map { case (_, (i, c)) => (i, c) }
        .reduceByKey(part, math.min(_: Long, _: Long))
      changed.reset()
      val next = labels.leftOuterJoin(neighborMin) // narrow
        .mapValues { case (old, cand) =>
          val nw = math.min(old, cand.getOrElse(old))
          if (nw != old) changed.add(1L)
          nw
        }.localCheckpoint()
      next.count()
      converged = changed.value == 0L
      labels = next
      iter += 1
    }
    // silent non-convergence would split true clusters and under-dedup —
    // fail loudly instead (rounds ≈ component diameter; raise maxIter for
    // pathological chains)
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds; raise maxIter")
    labels.toDF("id", "component")
      .select(col("id").cast(iType).as("id"),
        col("component").cast(iType).as("component"))
  }

  /** Connected components by alternating large-star / small-star edge
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC '14 — public algorithm): converges in O(log n) rounds
    * regardless of component DIAMETER, where min-label propagation
    * ([[connectedComponents]]) needs diameter-many rounds — the difference
    * between ~10 and ~thousands of shuffle rounds on the chain-shaped
    * duplicate clusters web crawls produce. Two shuffles per round,
    * `localCheckpoint` per round for constant lineage. Output
    * (id, component) with component = the component's minimum id —
    * identical to [[connectedComponents]] (equality-property-tested).
    */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 40): DataFrame = {
    val edges = starEdges(pairs, maxIter)
    val ids = pairs.select(col("i").as("id"))
      .unionByName(pairs.select(col("j").as("id"))).distinct()
    ids.join(edges.select(col("u").as("id"), col("v").as("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** The star-contraction FIXED POINT edge set of a pair table: one edge
    * `u → v` per non-minimum member u of each connected component, with v
    * the component's minimum id (the Kiveris stars-on-minima invariant —
    * u values are unique at the fixed point, or small-star would contract
    * further). Materialized (`localCheckpoint`ed), so consumers that only
    * need the NON-SURVIVOR side — every dedup drop list — read a tiny
    * checkpointed table instead of replaying the pair pipeline that
    * [[connectedComponentsStar]]'s id-side join re-executes lazily. */
  private[graft] def starEdges(pairs: DataFrame, maxIter: Int = 40): DataFrame = {
    // The iteration runs on RDDs for the same reason as
    // [[connectedComponents]]: per-round Catalyst planning plus one AQE
    // query-stage job per exchange (~10 driver round-trips each round)
    // dominated wall time; the RDD round is one count job (+ a subtract
    // check only when the counts already match). Long ids in flight, cast
    // back to the caller's type on return.
    val spark = pairs.sparkSession
    import spark.implicits._
    val iType = pairs.schema("i").dataType
    // canonical directed edges: larger endpoint → smaller endpoint
    var edges = pairs
      .select(greatest(col("i"), col("j")).cast("long").as("u"),
        least(col("i"), col("j")).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .as[(Long, Long)].rdd.localCheckpoint()
    var edgeCount = edges.count()
    val cap = ccDriverMaxEdges(spark)
    if (cap > 0L && edgeCount <= cap) {
      // metadata-sized graph: bounded collect + driver union-find (the
      // connectedComponents cutover, same bound). The fixed point is one
      // (u, componentMin) edge per NON-minimum member — exactly the
      // union-find map minus its self-rooted minima.
      val comp = unionFindMin(edges.collect())
      return comp.iterator.filter { case (k, v) => k != v }.toSeq
        .toDF("u", "v")
        .select(col("u").cast(iType).as("u"), col("v").cast(iType).as("v"))
    }
    // one fixed partitioner per loop: each phase shuffles its edge list
    // ONCE (partitionBy), then the min-reduce and the join both run
    // NARROW against it — 3 shuffles per round instead of 6. The
    // intermediate large-star distinct is dropped outright: duplicate
    // (n, m) rows cannot change a min and the small-star distinct
    // canonicalizes the round's output (the convergence count only ever
    // reads that final distinct set).
    val part = new org.apache.spark.HashPartitioner(
      math.max(edges.getNumPartitions, 1))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // LARGE-STAR: gather the full neighborhood of each center c; link
      // every strictly-larger neighbor to m = min(N(c) ∪ {c})
      val nbrs = edges.flatMap { case (u, v) => Iterator((u, v), (v, u)) }
        .partitionBy(part)
      val mins = nbrs.reduceByKey(part, math.min(_: Long, _: Long))
      val large = nbrs.join(mins).flatMap { case (c, (n, mn)) =>
        val m = math.min(mn, c)
        if (n > c && n != m) Iterator((n, m)) else Iterator.empty
      }.partitionBy(part)
      // SMALL-STAR: large-star edges all point larger → smaller, so each
      // center c's gathered neighbors are its smaller ones; link them AND
      // c itself to m = min(N(c))
      val smins = large.reduceByKey(part, math.min(_: Long, _: Long))
      val small = large.join(smins).flatMap { case (c, (n, m)) =>
        Iterator((n, m), (c, m))
      }.filter { case (u, v) => u != v }.distinct().localCheckpoint()
      // fixed point: the edge set is unchanged (stars rooted at component
      // minima — the paper's termination invariant); count equality gates
      // the set-difference check so it only runs when it can pass
      val smallCount = small.count()
      converged = smallCount == edgeCount && small.subtract(edges).isEmpty()
      if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
        System.err.println(s"[starEdges] iter=$iter edges=$edgeCount -> $smallCount converged=$converged")
      edges = small
      edgeCount = smallCount
      iter += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds; raise maxIter")
    edges.toDF("u", "v")
      .select(col("u").cast(iType).as("u"), col("v").cast(iType).as("v"))
  }

  /** Deduplicate a corpus given its near-duplicate pairs: every document
    * keeps its component's min id as `rep_id` (documents in no pair are
    * their own representative); survivors are the rows with
    * `doc_id = rep_id` — filter on it to drop near-duplicates.
    */
  def withRepresentatives(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    // no broadcast hint: the component table scales with the number of
    // near-duplicated docs — let AQE pick the strategy.
    // Tiered solver: label propagation costs ~2 shuffles/round and real
    // near-dup clusters are shallow (verified-similarity graphs are
    // clique-ish, diameter ≲ 10), so it wins the common case; a corpus
    // with chain-shaped components (template drift in crawls) blows its
    // round cap and falls over to star contraction — O(log n) rounds
    // regardless of diameter, at ~6 shuffles/round. The pairs plan is
    // checkpointed FIRST: it is often an expensive dedup pipeline
    // (band → candidate → verify), and the fallback must pay only the
    // contraction rounds, not a second full pipeline run.
    val comp = componentsTiered(pairs)
      .select(col("id").as(idCol), col("component"))
    docs.join(comp, Seq(idCol), "left")
      .withColumn("rep_id", coalesce(col("component"), col(idCol)))
      .drop("component")
  }

  /** 64-bit SimHash per document: each token hash votes ±1 per bit position
    * weighted by term frequency; the signature sets bits with positive sums.
    * One typed pass per document.
    *
    * The token hash is the first 8 bytes (big-endian) of md5(token) — a
    * cross-engine-reproducible choice (`('0x' || substr(md5(w),1,16))
    * ::UBIGINT` in DuckDB computes the identical value), which makes the
    * whole pair set differentially testable against an independent SQL
    * engine. md5 costs a few times more than an FNV mix per token but the
    * signature pass is a single map over documents either way.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          val counts = new Array[Long](64)
          // Locale.ROOT: default-locale lowercasing (tr_TR: I → ı) would
          // diverge from the DuckDB oracle's lower() and make signatures
          // JVM-locale-dependent
          text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).foreach { w =>
            md.reset()
            val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val h = java.nio.ByteBuffer.wrap(d).getLong // big-endian first 8 bytes
            var b = 0
            while (b < 64) {
              if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
              b += 1
            }
          }
          var sig = 0L; var b = 0
          while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
          (id, sig)
        }
      }.toDF("_id", "simhash")
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist via band
    * blocking over `bands` disjoint bit ranges. Exact-complete when
    * maxDist < bands (pigeonhole), so no recall loss at maxDist ≤ bands−1.
    *
    * Identical documents have identical signatures, so signatures are
    * PRE-COLLAPSED to one representative per distinct value before
    * banding (the hot-bucket guard: B identical docs would otherwise
    * collide in every band and feed B² rows through the self-join).
    * Members re-expand afterwards — cross-group hamming is a pure
    * function of the two signatures, so every member pair inherits its
    * rep pair's distance verbatim; within-group distance is 0.
    * `maxBandBucket` > 0 drops oversized distinct-signature buckets with
    * a loud WARN (0 = exact, the oracle setting).
    */
  def simhashPairs(sig: DataFrame, maxDist: Int, bands: Int = 4,
      maxBandBucket: Long = 0L): DataFrame = {
    require(maxDist < bands, "band blocking is only exact for maxDist < bands")
    val s = sig.select(col("_id").cast("long").as("_id"), col("simhash"))
      .filter(col("_id").isNotNull && col("simhash").isNotNull)
    val groups = s.groupBy("simhash").agg(min("_id").as("_rid"))
    val m = s.join(groups, "simhash").select(col("_id"), col("_rid"))
    val width = 64 / bands
    val mask = (1L << width) - 1
    val bandStructs = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        shiftright(col("simhash"), bi * width).bitwiseAND(lit(mask)).as("bv"))
    }
    val exploded = groups.select(col("_rid").as("_id"), col("simhash"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("_id"), col("simhash"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    val capped = capBandBuckets(exploded, Seq("band", "bv"), maxBandBucket,
      "simhashPairs")
    val repPairs = capped.alias("a").join(capped.alias("b"), Seq("band", "bv"))
      .filter(col("a._id") < col("b._id"))
      .select(col("a._id").as("i"), col("b._id").as("j"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
    expandMemberPairs(repPairs, m,
      groups.select(col("_rid"), lit(0L).as("hamming"))
        .filter(lit(0) <= maxDist),
      Seq("hamming"))
  }

  /** [[graft.expressions.CollectByKeyCapped]] /
    * [[graft.expressions.CountByKeyCapped]] as Columns — see the span
    * operators below for why the capped by-key collect is the
    * skew-proof single-shuffle shape. */
  private def collectByKeyCapped(k: Column, v: Column, cap: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CollectByKeyCapped(
        org.apache.spark.sql.graft.ColumnBridge.expression(k),
        org.apache.spark.sql.graft.ColumnBridge.expression(v), cap)
        .toAggregateExpression())

  private def countByKeyCapped(k: Column, cap: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CountByKeyCapped(
        org.apache.spark.sql.graft.ColumnBridge.expression(k), cap)
        .toAggregateExpression())

  /** Exact substring-span duplication stats — the "duplicate text
    * fraction" corpus-cleaning signal (cf. Lee et al., "Deduplicating
    * Training Data Makes Language Models Better": exact substring
    * duplication matters independently of document-level near-dups):
    * per document, the fraction of its `spanTokens`-token windows that
    * appear verbatim in at least `minDocs` DISTINCT documents. Unlike
    * the n-gram Jaccard/MinHash tier (document-level similarity), this
    * catches boilerplate spans embedded in otherwise-unique documents.
    *
    * Scale shape: each document emits (n_tokens − L + 1) window keys;
    * with `hashWindows` (the default) the key is a 64-bit `xxhash64`, so
    * everything downstream of the explode shuffles 8-byte hashes — never
    * window text. The windows-per-doc blowup is L× the token count, the
    * inherent cost of span-level granularity, and it is paid exactly
    * ONCE, in a plan with exactly ONE window-key exchange and NO hot
    * key anywhere: the insight is the COMPLEMENT — a window that fails
    * the `minDocs` threshold appears in at most `minDocs − 1` documents
    * BY DEFINITION, so only non-duplicated windows ever need their
    * (doc, occurrences) pairs carried. The dominant `minDocs = 2` needs
    * no typed aggregate at all: one distinct doc ⇔ `min(doc) =
    * max(doc)`, so a single codegen'd `groupBy(window).agg(min, max,
    * count)` suffices (fixed-width buffers, whole-stage codegen end to
    * end); `minDocs > 2` rides [[graft.expressions.CountByKeyCapped]]
    * (a partial-agg typed aggregate tracking per-doc counts for ≤
    * `minDocs − 1` distinct docs, evaluating to null the moment a
    * group proves duplicated — a viral license-header key present in
    * 10⁷⁺ documents costs every task a bounded buffer and ships ≤ cap
    * entries per map task). Earlier forms pre-grouped by (window, doc)
    * first — a second corpus-sized exchange of nearly identical row
    * count that this shape deletes outright: at 100 TB the two
    * window-side shuffles were the dominant bytes, and now there is
    * one.
    * Per doc, n_windows is a per-row expression on the source text and
    * n_dup_windows = n_windows − Σ occurrences over non-dup windows.
    * No join on the window key, no window function, nothing a skewed
    * key can stall ([[graft.SpanSkewProbe]] measures max rows per task
    * against the window-function form on a planted viral span; the
    * count-join-back alternative was rejected during development — its
    * sort-merge join sorts the viral probe partition unless both sides
    * are materialized bare for AQE's OptimizeSkewedJoin, and a
    * shuffle_hash hint OOMs building the distinct-window table).
    * `hashWindows = false` keys by the
    * window STRING — bit-replayable by a SQL oracle with no hash-function
    * parity assumption; a spec pins hashed ≡ string-keyed on real data.
    *
    * Doc ids are assumed unique (the corpus/landing contract shared
    * with [[graft.streaming.DedupStream]]).
    *
    * Output: (doc_id, n_windows, n_dup_windows, dup_frac) — documents
    * shorter than `spanTokens` tokens have no windows and are absent,
    * exactly as in the oracle replay. */
  def spanDupStats(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, minDocs: Int = 2,
      hashWindows: Boolean = true): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")
    // tokenize ONCE into a bound column BEFORE the window lambda: a
    // lambda body referencing `split(text)` re-tokenizes the document
    // per window position (transform lambdas are interpreted, and
    // CollapseProject rightly refuses to substitute a multiply-
    // referenced split into them) — measured 2× the whole pipeline's
    // wall at sf0.1. With `_tok` materialized the per-window work is a
    // bound-attribute slice + concat.
    val base = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_tok"))
    val tok = col("_tok")
    val m = size(tok) - (spanTokens - 1)
    // sequence(1, 0) yields [1, 0] (negative-step inference), not empty —
    // the when-guard is load-bearing for texts shorter than the span
    val idxs = when(m < 1, array().cast("array<int>"))
      .otherwise(sequence(lit(1), m))
    // hashed mode: ONE compiled rolling-hash pass over the token array
    // ([[graft.expressions.WindowHashes]]) — the string-building
    // transform/concat_ws/xxhash64 form it replaces materialized every
    // L-token window string inside an interpreted lambda (O(tokens×span)
    // bytes; was the d8/d9 wall). String mode stays for the oracle replay.
    val winKey = if (hashWindows)
      graft.functions.Cols.windowHashes(tok, spanTokens)
    else graft.functions.Cols.windowStrings(tok, spanTokens)
    val w = base.select(col("doc_id"), explode(winKey).as("_w"))
    // per window, straight off the explode (ONE window-key exchange):
    // the (doc, occurrences) pairs of windows that can still be
    // non-duplicated. minDocs = 2: one distinct doc ⇔ min = max, and
    // count(*) is then that doc's occurrence count — all codegen'd.
    // minDocs > 2: the capped by-key typed aggregate, null (dropped)
    // the moment a window proves duplicated. minDocs ≤ 1: NO window is
    // non-duplicated (present in ≥ 1 doc trivially) — the filter below
    // folds to an empty relation and every window counts as duplicated,
    // same as the historical behavior.
    val nonDup = if (minDocs <= 2)
      w.groupBy("_w").agg(min(col("doc_id")).as("_d1"),
          max(col("doc_id")).as("_d2"), count(lit(1)).as("_c1"))
        .filter(if (minDocs <= 1) lit(false) else col("_d1") === col("_d2"))
        .groupBy(col("_d1").as("doc_id"))
        .agg(sum(col("_c1")).as("_nonDup"))
    else
      w.groupBy("_w")
        .agg(countByKeyCapped(col("doc_id"), minDocs - 1).as("_ds"))
        .filter(col("_ds").isNotNull)
        .select(explode(col("_ds")).as("_d"))
        .groupBy(col("_d.key").as("doc_id"))
        .agg(sum(col("_d.cnt")).as("_nonDup"))
    base.select(col("doc_id"), m.cast("long").as("n_windows"))
      .filter(col("n_windows") >= 1L)
      .join(nonDup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        (col("n_windows") - coalesce(col("_nonDup"), lit(0L)))
          .as("n_dup_windows"))
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        round(col("n_dup_windows") / col("n_windows"), 6).as("dup_frac"))
  }

  /** Span-level duplicate REMOVAL — the cleaning action behind
    * [[spanDupStats]]'s signal (the Lee-et-al exact-substring recipe:
    * excise the duplicated spans themselves, not whole documents): every
    * token covered by ANY `spanTokens`-token window appearing verbatim in
    * ≥ `minDocs` distinct documents is removed, the survivors re-joined
    * by single spaces. Overlapping duplicated spans merge naturally
    * (coverage is per token position), and documents shorter than the
    * span — or with no duplicated window — pass through unchanged.
    *
    * Scale shape mirrors [[spanDupStats]]'s complement trick: posexplode
    * window keys with their 1-based start positions, then — in ONE
    * window-key exchange, straight off the explode — the CAPPED
    * (doc → positions) map per window
    * ([[graft.expressions.CollectByKeyCapped]], ≤ `minDocs − 1` distinct
    * docs, null the moment a window proves duplicated — complete exactly
    * for the NON-duplicated windows, which are the only ones read; the
    * earlier (window, doc) pre-group was a second corpus-sized exchange
    * this shape deletes). Per doc, the duplicated start set is the
    * COMPLEMENT `array_except(all starts, non-dup starts)` — so no join
    * on the window key, no window function, and a viral boilerplate key
    * costs every task a bounded buffer. One join back to the source by
    * doc_id (uniform) rebuilds the text.
    * Window text never shuffles when
    * `hashWindows` (the default; `false` keys by window string for the
    * no-hash-parity oracle replay, spec-pinned equal on real data).
    * Coverage comes from MERGED DISJOINT INTERVALS built from the
    * sorted starts — a heavily-duplicated doc's overlapping spans
    * collapse (a fully-duplicated doc is ONE interval). The text rebuild
    * is interval-bounded SET ALGEBRA, not a per-token test: the KEPT
    * ranges are the complement of the merged intervals in [1, n]
    * (`zip_with` of the interval bounds shifted by one — O(intervals)
    * lambda evaluations per doc), and each kept range reassembles via
    * native `slice` + `array_join` (O(tokens) flat array copies, no
    * lambda). The earlier per-token `filter(tok, !exists(ivl, …))` form
    * ran an interpreted lambda per token × interval — Catalyst does not
    * codegen HOF lambdas — and benched ~20× slower at sf0.1 with no
    * asymptotic advantage; this shape keeps every O(tokens) step inside
    * native array kernels.
    *
    * Output: (doc_id, clean_text, n_removed) for EVERY input document
    * (n_removed = tokens excised, 0 for untouched docs). A doc whose
    * every token is covered keeps an empty clean_text row — dropping it
    * silently would make the output unusable as a corpus rewrite. */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, minDocs: Int = 2,
      hashWindows: Boolean = true): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")
    val base = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("_text"))
    // tokenize ONCE into a bound column before the window lambda (see
    // spanDupStats — a split inside the lambda re-tokenizes per window
    // position); expressions below close over the bound `_tok`
    val tok = col("_tok")
    val m = size(tok) - (spanTokens - 1)
    val idxs = when(m < 1, array().cast("array<int>"))
      .otherwise(sequence(lit(1), m))
    // hashed mode: the compiled rolling-hash pass (see spanDupStats) —
    // no per-window string materialization; string mode for the oracle
    val winKey = if (hashWindows)
      graft.functions.Cols.windowHashes(tok, spanTokens)
    else graft.functions.Cols.windowStrings(tok, spanTokens)
    // (doc_id, start, key) — posexplode gives the 0-based array index,
    // +1 makes it the window's 1-based token start
    val w = base
      .select(col("doc_id"), split(col("_text"), " ").as("_tok"))
      .select(col("doc_id"), posexplode(winKey).as(Seq("_p0", "_w")))
      .select(col("doc_id"), (col("_p0") + 1).as("_pos"), col("_w"))
    // the complement trick (see spanDupStats), in ONE window-key
    // exchange: only NON-duplicated windows — which hold at most
    // minDocs−1 distinct docs by definition — carry their
    // (doc → positions) map; a window proving duplicated evaluates to
    // null and is dropped, so a viral key stays bounded. minDocs ≤ 1:
    // no window is non-duplicated — everything is covered, matching the
    // historical behavior (the filter folds to an empty relation).
    val perW = w.groupBy("_w").agg(
      collectByKeyCapped(col("doc_id"), col("_pos"),
        math.max(minDocs - 1, 1)).as("_ds"))
    val nonDupStarts = perW
      .filter(if (minDocs <= 1) lit(false) else col("_ds").isNotNull)
      .select(explode(col("_ds")).as("_d"))
      .groupBy(col("_d.key").as("doc_id"))
      .agg(flatten(collect_list(col("_d.vals"))).as("_nstarts"))
    // merged disjoint coverage intervals from the sorted DUPLICATED
    // starts — all starts minus the non-duplicated ones (array_except
    // preserves the ascending order of its left argument): span
    // [s, s+L-1] extends the open interval iff s ≤ hi+1 (touching counts
    // — coverage is a position set), else opens a new one. `get` (not
    // element_at) so the empty-accumulator probe is null, falling to the
    // open-new-interval branch without an ANSI index error.
    // rebuild tail: interval merge + complement + reassembly FUSED in one
    // compiled pass ([[graft.expressions.SpanRemoveRebuild]], O(tokens +
    // starts), one output buffer). The earlier declarative tail ran an
    // interpreted `aggregate` lambda that re-copied the interval
    // accumulator per start (O(intervals²) array copies on heavily-
    // duplicated docs) plus zip_with/transform reassembly — ~2.7 s of
    // the 4.5 s sf1 wall, paid TWICE under a global sort (range
    // partitioning re-executes the final stage for sampling).
    base.join(nonDupStarts, Seq("doc_id"), "left")
      // the join ships compact `_text`; re-split ONCE per row here (a
      // bound column, so the `idxs` expression below sees an attribute)
      .select(col("doc_id"), split(col("_text"), " ").as("_tok"),
        col("_nstarts"))
      .select(col("doc_id"), col("_tok"),
        array_except(idxs,
          coalesce(col("_nstarts"), array().cast("array<int>")))
          .as("_starts"))
      .select(col("doc_id"),
        graft.functions.Cols.spanRemoveRebuild(col("_tok"), col("_starts"),
          spanTokens).as("_r"))
      .select(col("doc_id"), col("_r.clean_text").as("clean_text"),
        col("_r.n_removed").as("n_removed"))
  }

  /** LINE-level duplicate removal — the CCNet/RefinedWeb recipe at its
    * natural granularity: drop every line whose exact content appears in
    * ≥ `minDocs` DISTINCT documents (navigation bars, cookie banners,
    * boilerplate footers — the text that survives document-level dedup
    * because the documents around it differ), survivors re-joined by the
    * same separator. A line repeated WITHIN one document is not
    * corpus-duplicated (one distinct doc) and is kept — the distinct-doc
    * threshold contract shared with [[spanDupStats]]/[[removeDupSpans]];
    * within-document looping is [[Quality.repetitionStats]]'s job.
    *
    * Scale shape is the span family's complement trick, simplified by
    * lines never overlapping: posexplode lines with their 1-based
    * positions, then in ONE line-key exchange straight off the explode
    * the CAPPED (doc → positions) map per line
    * ([[graft.expressions.CollectByKeyCapped]], ≤ `minDocs − 1` distinct
    * docs, null the moment a line proves duplicated) — complete exactly
    * for the NON-duplicated lines, which here are exactly the KEPT
    * positions, so there is no interval algebra at all: per doc the kept
    * positions sort once and each survivor line is one `element_at`. No
    * join on the line key, no window function; a viral boilerplate line
    * present in 10⁷⁺ documents costs every task a bounded buffer and
    * ships ≤ cap entries per map task. `hashLines` (the default) keys by
    * 64-bit `xxhash64` so line text never shuffles; `false` keys by the
    * line string for the no-hash-parity oracle replay (spec-pinned equal
    * on real data). One doc_id join (uniform) rebuilds the text.
    *
    * Output: (doc_id, clean_text, n_lines, n_removed) for EVERY input
    * document with non-null id and text (n_removed = lines dropped; a doc
    * whose every line is duplicated keeps an empty clean_text row). */
  def removeDupLines(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2, sep: String = "\n",
      hashLines: Boolean = true, md5Keys: Boolean = false): DataFrame = {
    require(sep.nonEmpty, "removeDupLines: sep must be non-empty")
    val sepRe = java.util.regex.Pattern.quote(sep)
    val base = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), split(col(textCol), sepRe).as("_ln"))
    // md5Keys swaps the xxhash64 line keys for the cross-engine
    // md5-low-60 ([[graft.expressions.ElementMd5Low60]]): the SAME
    // 8-byte-key exchange shape — line text never shuffles either way —
    // but an oracle can replay the keys, so the hashed path itself is
    // hash-gateable (the d16 gate runs it; spec pins all three key
    // modes equal on real data)
    val lineKey =
      if (hashLines && md5Keys) graft.functions.Cols.elementMd5Low60(col("_ln"))
      else if (hashLines) graft.functions.Cols.elementXxHash(col("_ln"))
      else col("_ln")
    val w = base.select(col("doc_id"), posexplode(lineKey).as(Seq("_p0", "_w")))
      .select(col("doc_id"), (col("_p0") + 1).as("_pos"), col("_w"))
    // the complement, in ONE line-key exchange: only NON-duplicated lines
    // (≤ minDocs−1 distinct docs by definition) carry their
    // (doc → positions) map; duplicated lines evaluate to null and drop.
    // minDocs ≤ 1: no line is non-duplicated — everything is removed
    // (the filter folds to an empty relation), mirroring the span family.
    val keptPos = w.groupBy("_w").agg(
        collectByKeyCapped(col("doc_id"), col("_pos"),
          math.max(minDocs - 1, 1)).as("_ds"))
      .filter(if (minDocs <= 1) lit(false) else col("_ds").isNotNull)
      .select(explode(col("_ds")).as("_d"))
      .groupBy(col("_d.key").as("doc_id"))
      .agg(array_sort(flatten(collect_list(col("_d.vals")))).as("_kpos"))
    // rebuild tail: one compiled measured-and-filled buffer per doc
    // ([[graft.expressions.LineRemoveRebuild]]) instead of the
    // interpreted transform/element_at lambda + array_join
    base.join(keptPos, Seq("doc_id"), "left")
      .select(col("doc_id"), col("_ln"),
        graft.functions.Cols.lineRemoveRebuild(col("_ln"),
          coalesce(col("_kpos"), array().cast("array<int>")), sep).as("_r"))
      .select(col("doc_id"), col("_r.clean_text").as("clean_text"),
        size(col("_ln")).cast("long").as("n_lines"),
        col("_r.n_removed").as("n_removed"))
  }

  /** Benchmark decontamination signal — the GPT-3/PaLM-style recipe as a
    * first-class operator: for each corpus document, how many of its
    * distinct n-token shingles ([[shingles]]: lowercased, `' '`-split)
    * appear in ANY benchmark document. Training sets are decontaminated
    * by thresholding this before a run; compose as
    * `corpus.join(contaminationStats(...).filter(...), Seq(id), "left_anti")`.
    *
    * Scale shape: the benchmark shingle set is BROADCAST (eval suites
    * are tiny next to a training corpus — override `broadcastBench`
    * when not), so the corpus side is a scan → explode → broadcast-hash
    * semi-join → per-doc count, with NOTHING corpus-sized shuffled; the
    * per-doc aggregate keys on doc_id (uniform). `hashShingles` (the
    * default) joins 8-byte `xxhash64` keys so shingle text never ships;
    * `false` keys by the string for the no-hash-parity oracle replay
    * (spec-pinned equal).
    *
    * Output: (doc_id, n_shingles, n_contaminated, contam_frac) for EVERY
    * corpus document — a doc shorter than the shingle has 0 shingles and
    * contam_frac 0.0. */
  def contaminationStats(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 5, hashShingles: Boolean = true,
      broadcastBench: Boolean = true): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // tokens materialized into a bound column before the shingle lambda
    // (see [[shingles]]' performance note)
    val sh = shinglesFromTokens(col("_tk"), n)
    val key = if (hashShingles) graft.functions.Cols.elementXxHash(sh)
      else sh
    val corp = corpus.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_tk"))
    val benchSet = bench.filter(col(textCol).isNotNull)
      .select(tokens(col(textCol)).as("_tk"))
      .select(explode(key).as("_s")).distinct()
    val nContaminated: DataFrame => DataFrame =
      if (broadcastBench) {
        // bench sets are broadcast-by-contract — collect the distinct
        // keys once (require-bounded) and probe them PER ROW in one
        // compiled pass: the join form exploded one row per corpus
        // shingle into a broadcast hash join and re-grouped by doc_id
        // just to count the survivors (two corpus-scale operators for a
        // doc-local count)
        val sc = corpus.sparkSession.sparkContext
        val cap = 1 << 24
        val rows = benchSet.limit(cap + 1).collect()
        require(rows.length <= cap,
          s"contaminationStats: > $cap distinct bench shingles — pass " +
            "broadcastBench = false for a corpus-scale bench side")
        import org.apache.spark.sql.graft.ColumnBridge
        val hitsCol = if (hashShingles) {
          val set = new scala.collection.mutable.LongMap[Unit](
            math.max(8, rows.length * 2))
          rows.foreach(r => if (!r.isNullAt(0)) set(r.getLong(0)) = ())
          val bc = sc.broadcast(set)
          ColumnBridge.column(graft.expressions.BcLongSetHits(
            ColumnBridge.expression(key), bc))
        } else {
          val set = new java.util.HashSet[
            org.apache.spark.unsafe.types.UTF8String](
            math.max(8, rows.length * 2))
          rows.foreach(r => if (!r.isNullAt(0)) set.add(
            org.apache.spark.unsafe.types.UTF8String.fromString(
              r.getString(0))))
          val bc = sc.broadcast(set)
          ColumnBridge.column(graft.expressions.BcStringSetHits(
            ColumnBridge.expression(key), bc))
        }
        df => df.select(col("doc_id"),
          size(key).cast("long").as("n_shingles"),
          hitsCol.as("n_contaminated"))
      } else { df =>
        val hits = df.select(col("doc_id"), explode(key).as("_s"))
          .join(benchSet, Seq("_s"))
          .groupBy("doc_id").agg(count(lit(1)).as("_hits"))
        df.select(col("doc_id"), size(key).cast("long").as("n_shingles"))
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_shingles"),
            coalesce(col("_hits"), lit(0L)).as("n_contaminated"))
      }
    nContaminated(corp)
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        when(col("n_shingles") === 0L, 0.0)
          .otherwise(round(col("n_contaminated") / col("n_shingles"), 6))
          .as("contam_frac"))
  }

  /** Winnowing document sketch (Schleimer et al. 2003 — the MOSS local
    * fingerprint): one (doc_id, wh) row per DISTINCT sliding-window
    * minimum of the rolling k-gram hashes of the lowercased text. Unlike
    * token-shingle MinHash (d3), winnowing guarantees a LOCAL match
    * property: any shared substring of length ≥ k + window − 1 is
    * caught by at least one shared fingerprint regardless of position —
    * the plagiarism/quotation detector the token-level family can miss
    * under heavy reordering. Per-row compiled kernel
    * ([[graft.expressions.WinnowSketchExpr]] ≡ the property-tested
    * [[TextStats.winnow]]), one explode, no shuffle — the sketch
    * inherits the scan's partitioning. Texts shorter than `k` sketch to
    * no rows. */
  def winnowSketch(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, window: Int = 4): DataFrame =
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.Cols.winnowSketch(col(textCol), k, window))
          .as("wh"))

  /** Candidate near-duplicate pairs by shared winnowing fingerprints:
    * documents sharing ≥ `minShared` sketch hashes, with the shared
    * count. Fingerprints present in more than `maxBucket` documents are
    * dropped FIRST (MOSS's over-represented-fingerprint rule —
    * boilerplate substrings every document carries would otherwise pair
    * everything with everything), which also bounds the bucket
    * self-join: a kept fingerprint yields ≤ maxBucket·(maxBucket−1)/2
    * pair rows, so the quadratic term is capped by a constant at any
    * corpus size. Shape: sketch → per-hash doc-frequency aggregate →
    * semi-join keep → bucket self-join → pair-keyed count (the d2/d3
    * family with the frequency cap in front). Output:
    * (doc_a, doc_b, n_shared), doc_a < doc_b. */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, window: Int = 4, minShared: Long = 2L,
      maxBucket: Long = 50L): DataFrame = {
    require(minShared >= 1L, s"minShared must be >= 1, got $minShared")
    require(maxBucket >= 2L, s"maxBucket must be >= 2, got $maxBucket")
    // localCheckpoint: the DAG below consumes the sketch repeatedly (the
    // doc-frequency aggregate, the semi-join keep side, and both bucket
    // self-join sides — 8 copies of the scan+kernel+explode subtree in
    // the unchecked plan) and the winnow kernel is the expensive part.
    // Same pattern and tradeoffs as jaccardPairs' `sets` (see the long
    // note there: eager, lineage-free).
    val sk = winnowSketch(docs, idCol, textCol, k, window).localCheckpoint()
    val kept = sk.join(
      sk.groupBy("wh").agg(count(lit(1)).as("_docs"))
        .filter(col("_docs") <= maxBucket).select("wh"),
      Seq("wh"), "left_semi")
    kept.select(col("doc_id").as("doc_a"), col("wh"))
      .join(kept.select(col("doc_id").as("doc_b"), col("wh")), Seq("wh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
