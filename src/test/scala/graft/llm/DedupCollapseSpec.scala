package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Hot-bucket stress and exact-duplicate pre-collapse semantics: planted
  * mass duplication (the NORMAL shape of crawl corpora — boilerplate,
  * mirrors, reposts) must NOT inflate candidate generation quadratically,
  * while the emitted pair sets stay bit-identical to the uncollapsed
  * semantics. This is the scale gate for d3/d4/d5 at 100 TB.
  */
class DedupCollapseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "lorem ipsum dolor sit amet consectetur"

  /** 1000 byte-identical docs + 30 distinct docs + one near-dup of the
    * identical content (Jaccard 4/5 = 0.8). */
  private lazy val massDup = {
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val rng = new scala.util.Random(7)
    val distinct = (0 until 30).map { k =>
      (2100L + k, Array.fill(8)(words(rng.nextInt(words.length))).mkString(" ") + s" uniq$k")
    }
    val dups = (0L until 1000L).map(i => (i, base))
    val nearDup = Seq((2000L, base + " extra"))
    (dups ++ nearDup ++ distinct).toDF("doc_id", "text")
  }

  test("mass exact duplication: rep-level candidates stay bounded by DISTINCT contents") {
    val (m, repDocs) = Dedup.collapseExactDups(massDup, "doc_id", "text")
    val nDistinct = repDocs.count()
    assert(nDistinct === 32, "1 dup group + 1 near-dup + 30 distinct")
    assert(m.count() === 1031)
    val cand = Dedup.minhashRepCandidates(repDocs, 3, 64, 16, 0L)
    val nCand = cand.count()
    // without pre-collapse the identical group alone would push
    // C(1000,2) ≈ 5·10⁵ pairs through the band join; collapsed, the
    // candidate space is bounded by pairs of distinct contents
    assert(nCand <= 32L * 31 / 2,
      s"candidates $nCand exceed the distinct-content bound")
  }

  test("mass exact duplication: pair output is exact (within 1.0, cross inherits rep Jaccard)") {
    val out = Dedup.minhashDedupPairs(massDup, "doc_id", "text", 3, 64, 16, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // all C(1000,2) within-group pairs at exactly 1.0
    val within = out.filter { case ((i, j), _) => i < 1000 && j < 1000 }
    assert(within.size === 1000 * 999 / 2)
    assert(within.values.forall(_ == 1.0))
    // every member pairs with the planted near-dup at the rep pair's Jaccard
    val cross = out.filter { case ((_, j), _) => j == 2000L }
    assert(cross.size === 1000)
    assert(cross.values.forall(v => math.abs(v - 0.8) < 1e-12))
    // and the full set equals the exact prefix-filtered reference
    val exact = Dedup.jaccardPairs(massDup, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.keySet === exact)
  }

  test("minhashRepresentatives ≡ withRepresentatives ∘ minhashDedupPairs (incl. short and null docs)") {
    val fixture = (
      (0L until 5L).map(i => (i, base)) ++                // exact-dup group
        Seq((10L, base + " extra")) ++                    // near-dup of the group
        Seq((20L, "hi there"), (21L, "hi there")) ++      // < n tokens: never pair
        Seq((30L, "one completely different sentence entirely"))
      ).toDF("doc_id", "text")
      .unionByName(Seq(40L).toDF("doc_id")
        .withColumn("text", lit(null).cast("string")))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("rep_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPairs = asMap(Dedup.withRepresentatives(fixture, "doc_id",
      Dedup.minhashDedupPairs(fixture, "doc_id", "text", 3, 64, 16, 0.8)))
    val direct = asMap(Dedup.minhashRepresentatives(fixture, "doc_id", "text",
      3, 64, 16, 0.8))
    assert(direct === viaPairs)
    // the dup group + near-dup collapse to component 0; short dups stay
    // their own representatives (no shingles ⇒ no pairs)
    assert(direct(4L) === 0L && direct(10L) === 0L)
    assert(direct(20L) === 20L && direct(21L) === 21L && direct(40L) === 40L)
  }

  test("simhash: identical signatures pre-collapse; band-bucket cap drops loudly, 0 = exact") {
    // 10 distinct signatures k<<48 (bands 0-2 all zero → one 10-wide
    // bucket each) + 10 exact copies of signature 0
    val sig = ((0 until 10).map(k => (k.toLong, k.toLong << 48)) ++
      (100 until 110).map(i => (i.toLong, 0L))).toDF("_id", "simhash")
    val uncapped = Dedup.simhashPairs(sig, 3, 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // brute-force reference over the full member set
    val sigs = sig.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (i, si) <- sigs; (j, sj) <- sigs if i < j
      if java.lang.Long.bitCount(si ^ sj) <= 3
    } yield ((i, j), java.lang.Long.bitCount(si ^ sj).toLong)).toMap
    assert(uncapped === brute)
    // the 11-member signature-0 group self-pairs at hamming 0
    assert(uncapped.count { case (_, h) => h == 0L } === 11 * 10 / 2)
    // cap=5: the three 10-wide distinct-signature buckets are dropped →
    // no cross-signature candidates survive; exact-duplicate (within-group)
    // pairs are NOT affected by the cap
    val capped = Dedup.simhashPairs(sig, 3, 4, maxBandBucket = 5L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(capped.nonEmpty && capped.values.forall(_ == 0L),
      "cap must drop cross-signature buckets but keep exact-duplicate pairs")
    assert(capped.size === 11 * 10 / 2)
  }

  test("lshNearDupPairs: duplicated vectors collapse before banding, pairs re-expand exactly") {
    val dim = 32
    val rng = new scala.util.Random(11)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(Similarity.dotKernel(v, v)).toFloat
      v.map(_ / n)
    }
    def randv() = unit(Array.fill(dim)(rng.nextGaussian().toFloat))
    val a = randv()
    val nearA = unit(a.zip(Array.fill(dim)((rng.nextGaussian() * 0.02).toFloat))
      .map { case (x, e) => x + e })
    // 10 byte-identical copies of `a`, one near-dup, 50 background
    val rows = (0L until 10L).map(i => (i, a)) ++ Seq((10L, nearA)) ++
      (0 until 50).map(i => ((100 + i).toLong, randv()))
    val df = rows.toDF("vec_id", "embedding")
    val brute = (for {
      (i, vi) <- rows; (j, vj) <- rows if i < j
      if Similarity.dotKernel(vi, vj) /
        (math.sqrt(Similarity.dotKernel(vi, vi)) * math.sqrt(Similarity.dotKernel(vj, vj))) >= 0.9
    } yield (i, j)).toSet
    assert(brute.size >= 10 * 9 / 2 + 10, "fixture must contain the dup clique + cross pairs")
    val lsh = Similarity.lshNearDupPairs(df, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === brute, s"missed=${brute.diff(lsh)} spurious=${lsh.diff(brute)}")
  }
}
