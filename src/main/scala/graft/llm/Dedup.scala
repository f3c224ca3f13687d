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

  /** Distinct n-word shingles as array<string>; empty when < n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup by content hash: one row per distinct content with the
    * smallest id as representative. Shuffles sha2 hashes, not documents.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))

  /** (id, shingle) long table, distinct per document. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("_id"), explode(shingles(col(textCol), n)).as("shingle"))

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
  private def verifyJaccard(cand: DataFrame, sets: DataFrame,
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
    * that many documents (stopword-shingle skew guard). 0 = keep all, which
    * preserves exactness — the setting used for oracle differential tests.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, n: Int,
      minJaccard: Double, maxShingleDf: Long = 0L): DataFrame = {
    // Shingles travel as 64-bit hashes: 3× less shuffle than strings and
    // integer equi-joins; a collision would need ~10⁹ distinct shingles in
    // one corpus to matter (birthday bound).
    // Global shingle order = the hash value itself. Any fixed total order
    // preserves prefix-filter exactness, and hash order (i) decorrelates
    // prefix membership from vocabulary frequency — a lexicographic order
    // puts the same hot shingles in every prefix and regenerates the n²
    // candidate blow-up — and (ii) needs NO global document-frequency pass.
    // Cached: the DAG below consumes it three times (prefix probes + both
    // verify sides). Plans returned by this function hold the cache ref;
    // batch drivers running many queries should clearCache() between them.
    val sets = hashedShingleSets(docs, idCol, textCol, n)
      .filter(size(col("_sh")) > 0)
      .cache()
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
    verifyJaccard(cand, sets, minJaccard)
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

  /** MinHash+LSH near-dup pairs, exact-verified: band candidates are checked
    * with true shingle-set Jaccard (array intersect on the two docs' shingle
    * sets), so emitted pairs are exactly those ≥ minJaccard that banding
    * surfaced. Verification joins only candidate ids — no second index pass.
    */
  def minhashDedupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int, minJaccard: Double): DataFrame = {
    val bt = minhashBandTable(docs, idCol, textCol, n, numHashes, bands)
    val cand = bt.alias("a").join(bt.alias("b"), Seq("band", "bh"))
      .filter(col("a._id") < col("b._id"))
      .select(col("a._id").as("i"), col("b._id").as("j")).distinct()
    // hashed shingle sets (see jaccardPairs), cached: both verify sides.
    // Returned plans hold the cache ref; batch drivers should clearCache().
    val sets = hashedShingleSets(docs, idCol, textCol, n).cache()
    verifyJaccard(cand, sets, minJaccard)
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
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("i"), col("j"))
      .unionByName(pairs.select(col("j").as("i"), col("i").as("j")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("i").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("j"), col("component").as("_nc")), "j")
        .groupBy(col("i").as("id")).agg(min("_nc").as("_cand"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("_cand"), col("component")))
            .as("component"))
        .localCheckpoint()
      converged = next.join(
          labels.select(col("id"), col("component").as("_old")), "id")
        .filter(col("component") =!= col("_old")).isEmpty
      labels = next
      iter += 1
    }
    // silent non-convergence would split true clusters and under-dedup —
    // fail loudly instead (rounds ≈ component diameter; raise maxIter for
    // pathological chains)
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds; raise maxIter")
    labels
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
    // canonical directed edges: larger endpoint → smaller endpoint
    var edges = pairs
      .select(greatest(col("i"), col("j")).as("u"), least(col("i"), col("j")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // LARGE-STAR: gather the full neighborhood of each center c; link
      // every strictly-larger neighbor to m = min(N(c) ∪ {c})
      val nbrs = edges.select(col("u").as("c"), col("v").as("n"))
        .unionByName(edges.select(col("v").as("c"), col("u").as("n")))
      val mins = nbrs.groupBy("c").agg(min(col("n")).as("_mn"))
        .select(col("c"), least(col("_mn"), col("c")).as("m"))
      val large = nbrs.join(mins, "c")
        .filter(col("n") > col("c"))
        .select(col("n").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // SMALL-STAR: large-star edges all point larger → smaller, so each
      // center c's gathered neighbors are its smaller ones; link them AND
      // c itself to m = min(N(c))
      val smins = large.groupBy(col("u").as("c")).agg(min(col("v")).as("m"))
      val small = large.select(col("u").as("c"), col("v").as("n"))
        .join(smins, "c")
        .select(col("n").as("u"), col("m").as("v"))
        .unionByName(smins.select(col("c").as("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint()
      // fixed point: the edge set is unchanged (stars rooted at component
      // minima — the paper's termination invariant)
      converged = small.count() == edges.count() &&
        small.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edges = small
      iter += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds; raise maxIter")
    val ids = pairs.select(col("i").as("id"))
      .unionByName(pairs.select(col("j").as("id"))).distinct()
    ids.join(edges.select(col("u").as("id"), col("v").as("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
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
    val pairsC = pairs.localCheckpoint()
    val comp =
      (try connectedComponents(pairsC, maxIter = 12)
       catch {
         // ONLY the round-cap blowout falls over to star — any other
         // IllegalArgumentException is a real defect and must surface
         case e: IllegalArgumentException
             if e.getMessage != null && e.getMessage.contains("did not converge") =>
           connectedComponentsStar(pairsC)
       })
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
    */
  def simhashPairs(sig: DataFrame, maxDist: Int, bands: Int = 4): DataFrame = {
    require(maxDist < bands, "band blocking is only exact for maxDist < bands")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val bandStructs = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        shiftright(col("simhash"), bi * width).bitwiseAND(lit(mask)).as("bv"))
    }
    val exploded = sig.select(col("_id"), col("simhash"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("_id"), col("simhash"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    exploded.alias("a").join(exploded.alias("b"), Seq("band", "bv"))
      .filter(col("a._id") < col("b._id"))
      .select(col("a._id").as("i"), col("b._id").as("j"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
