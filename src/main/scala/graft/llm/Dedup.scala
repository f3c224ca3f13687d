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
    // Shingles travel as xxhash64 longs: 3× less shuffle than strings and
    // integer equi-joins; a 64-bit collision would need ~10⁹ distinct
    // shingles in one corpus to matter (birthday bound).
    // Global shingle order = the hash value itself. Any fixed total order
    // preserves prefix-filter exactness, and hash order (i) decorrelates
    // prefix membership from vocabulary frequency — a lexicographic order
    // puts the same hot shingles in every prefix and regenerates the n²
    // candidate blow-up — and (ii) needs NO global document-frequency pass,
    // so the per-doc sorted set is pure column math off the scan.
    // Cached because the DAG below consumes it three times (probe explode +
    // both verify sides); one row per doc.
    val sets = docs
      .select(col(idCol).as("_id"),
        array_sort(transform(shingles(col(textCol), n), s => xxhash64(s))).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .cache()
    val prefLen = (size(col("_sh")) - ceil(size(col("_sh")) * minJaccard) + 1).cast("int")
    // probes carry their full set alongside the prefix shingle, so candidate
    // generation and verification are ONE equi-join + one dedup — no
    // re-join of the sets afterwards
    val probes0 = sets.select(col("_id"), col("_sh"),
      explode(slice(col("_sh"), lit(1), prefLen)).as("shingle"))
    val probes =
      if (maxShingleDf <= 0) probes0
      else {
        val hot = probes0.groupBy("shingle").agg(count(lit(1)).as("_df"))
          .filter(col("_df") > maxShingleDf).select("shingle")
        probes0.join(broadcast(hot), Seq("shingle"), "left_anti")
      }
    probes.select(col("_id").as("i"), col("_sh").as("sh_i"), col("shingle"))
      .join(probes.select(col("_id").as("j"), col("_sh").as("sh_j"), col("shingle")),
        "shingle")
      .filter(col("i") < col("j"))
      .groupBy("i", "j") // dedup multi-shingle matches; sets are constant per id
      .agg(first(col("sh_i")).as("sh_i"), first(col("sh_j")).as("sh_j"))
      .withColumn("m", size(array_intersect(col("sh_i"), col("sh_j"))).cast("long"))
      .withColumn("jaccard", col("m").cast("double") /
        (size(col("sh_i")) + size(col("sh_j")) - col("m")))
      .filter(col("jaccard") >= minJaccard)
      .select("i", "j", "jaccard")
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

  /** MinHash+LSH near-dup pairs, exact-verified: band candidates are checked
    * with true shingle-set Jaccard (array intersect on the two docs' shingle
    * sets), so emitted pairs are exactly those ≥ minJaccard that banding
    * surfaced. Verification joins only candidate ids — no second index pass.
    */
  def minhashDedupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int, minJaccard: Double): DataFrame = {
    val sig = minhashSignatures(docs, idCol, textCol, n, numHashes)
    val cand = lshCandidates(sig, numHashes, bands)
    // hashed shingle sets (see jaccardPairs), cached: both verify sides
    val sets = docs
      .select(col(idCol).as("_id"),
        array_sort(transform(shingles(col(textCol), n), s => xxhash64(s))).as("_sh"))
      .cache()
    cand
      .join(sets.select(col("_id").as("i"), col("_sh").as("sh_i")), "i")
      .join(sets.select(col("_id").as("j"), col("_sh").as("sh_j")), "j")
      .withColumn("m", size(array_intersect(col("sh_i"), col("sh_j"))).cast("long"))
      .withColumn("jaccard", col("m").cast("double") /
        (size(col("sh_i")) + size(col("sh_j")) - col("m")))
      .filter(col("jaccard") >= minJaccard)
      .select("i", "j", "jaccard")
  }

  /** 64-bit SimHash per document: each token hash votes ±1 per bit position
    * weighted by term frequency; the signature sets bits with positive sums.
    * One explode + one aggregation (64 conditional sums).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        .as(s"s$b")
    }
    val summed = tok.groupBy("_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    summed.select(col("_id"), sig.as("simhash"))
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
