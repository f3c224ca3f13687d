package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** Parity and recall tests for the LLM-pipeline operators over the
  * sf0.001 documents/embeddings tables. */
class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = Tables.documents(spark, TestSpark.sfDir)
  lazy val embs = Tables.embeddings(spark, TestSpark.sfDir)

  test("minhash+LSH finds exactly the exact-Jaccard pair set on planted near-dups") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 64, 16, 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-duplicates")
    assert(lsh === exact, s"missed=${exact.diff(lsh)} spurious=${lsh.diff(exact)}")
  }

  test("simhash band blocking equals brute-force hamming pairs (pigeonhole exactness)") {
    val sig = Dedup.simhash(docs, "doc_id", "text")
    val banded = Dedup.simhashPairs(sig, 3, 4)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = sig.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (i, si) <- sigs; (j, sj) <- sigs if i < j
      if java.lang.Long.bitCount(si ^ sj) <= 3
    } yield (i, j)).toSet
    assert(banded === brute)
  }

  test("span-dup stats: hashed scale path ≡ string-keyed oracle path; planted spans detected") {
    import spark.implicits._
    // real-data parity: 64-bit hashing must not change any count
    val hashed = Dedup.spanDupStats(docs, "doc_id", "text", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val strKeyed = Dedup.spanDupStats(docs, "doc_id", "text", 5,
        hashWindows = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hashed === strKeyed)
    // planted fixture: a 5-token boilerplate span embedded in two
    // otherwise-unique documents; a third document shares nothing
    val boiler = "one two three four five"
    val fix = Seq(
      1L -> s"aa bb cc $boiler dd ee",
      2L -> s"zz yy $boiler xx ww vv",
      3L -> "qq rr ss tt uu pp oo nn").toDF("doc_id", "text")
    val out = Dedup.spanDupStats(fix, "doc_id", "text", 5).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // doc 1: 10 tokens → 6 windows, exactly 1 of them is the boiler span
    assert(out(1L) === ((6L, 1L)))
    assert(out(2L) === ((6L, 1L)))
    assert(out(3L) === ((4L, 0L)), "no cross-doc span → zero dup windows")
    // a doc shorter than the span has no windows and is absent
    val short = Dedup.spanDupStats(
      Seq(9L -> "just four tokens here").toDF("doc_id", "text"),
      "doc_id", "text", 5)
    assert(short.count() === 0L)
  }

  test("span-dup removal: excised boilerplate, merged overlaps, untouched docs pass through, cleaned corpus re-scores dup-free") {
    import spark.implicits._
    val boiler = "one two three four five"
    val fix = Seq(
      1L -> s"aa bb cc $boiler dd ee",
      2L -> s"zz yy $boiler xx ww vv",
      // doc 4 repeats the boiler twice back-to-back: overlapping covered
      // spans must merge (coverage is per token position, not per span)
      4L -> s"$boiler $boiler kk",
      3L -> "qq rr ss tt uu pp oo nn",
      // shorter than the span → no windows → untouched
      9L -> "just four tokens here").toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(fix, "doc_id", "text", 5).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("aa bb cc dd ee", 5L)))
    assert(out(2L) === (("zz yy xx ww vv", 5L)))
    assert(out(4L) === (("kk", 10L)), "back-to-back duplicated spans merge")
    assert(out(3L) === (("qq rr ss tt uu pp oo nn", 0L)), "untouched")
    assert(out(9L) === (("just four tokens here", 0L)), "shorter than span")
    // the advertised closure: re-running the stats on the cleaned corpus
    // finds NO duplicated window (excision cannot leave the signal behind
    // on this fixture, and re-joining does not create a new shared span)
    val cleaned = Dedup.removeDupSpans(fix, "doc_id", "text", 5)
      .select(col("doc_id"), col("clean_text").as("text"))
    val re = Dedup.spanDupStats(cleaned, "doc_id", "text", 5)
    assert(re.agg(sum("n_dup_windows")).head.getLong(0) === 0L,
      "cleaned corpus must re-score dup_frac 0")
    // a document whose EVERY token is covered keeps an empty-text row —
    // removal is a corpus rewrite, rows must not vanish
    val allDup = Seq(5L -> boiler, 6L -> boiler).toDF("doc_id", "text")
    val gone = Dedup.removeDupSpans(allDup, "doc_id", "text", 5).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(gone(5L) === (("", 5L)) && gone(6L) === (("", 5L)))
    // hashed scale path ≡ string-keyed oracle path on the real table
    def rows(hw: Boolean) = Dedup.removeDupSpans(docs, "doc_id", "text", 5,
        hashWindows = hw).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows(true) === rows(false))
  }

  test("span-dup minDocs > 2 rides the capped-collect path and matches hand-computed stats") {
    import spark.implicits._
    // boiler in THREE docs (≥ minDocs=3 → duplicated); pair-only span in
    // two docs (< 3 → NOT duplicated at this threshold, and its capped
    // per-window doc set has exactly 2 = minDocs−1 entries — the cap
    // boundary); repeated occurrences within one doc exercise _c > 1
    val boiler = "one two three four five"
    val pair = "six seven eight nine ten"
    val fix = Seq(
      1L -> s"aa $boiler bb",
      2L -> s"cc $boiler dd",
      3L -> s"$boiler $pair",
      4L -> s"ee $pair $pair ff").toDF("doc_id", "text")
    val out = Dedup.spanDupStats(fix, "doc_id", "text", 5, minDocs = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((3L, 1L)))
    assert(out(2L) === ((3L, 1L)))
    // doc 3: 10 tokens → 6 windows; only the boiler window crosses 3 docs
    assert(out(3L) === ((6L, 1L)))
    // doc 4: 12 tokens → 8 windows, pair appears at 2 starts, both below
    // the 3-doc floor → zero duplicated windows
    assert(out(4L) === ((8L, 0L)))
    // removal at minDocs=3: only the boiler is excised; the pair span
    // (2 docs) survives untouched
    val rm = Dedup.removeDupSpans(fix, "doc_id", "text", 5, minDocs = 3)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(rm(1L) === (("aa bb", 5L)))
    assert(rm(3L) === ((pair, 5L)))
    assert(rm(4L) === ((s"ee $pair $pair ff", 0L)))
    // hashed ≡ string-keyed on the same threshold
    val hw = Dedup.spanDupStats(docs, "doc_id", "text", 5, minDocs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val sw = Dedup.spanDupStats(docs, "doc_id", "text", 5, minDocs = 3,
        hashWindows = false)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(hw === sw)
  }

  test("line dedup: corpus-duplicated lines drop, within-doc repeats survive, minDocs threshold, custom sep, hashed ≡ string") {
    import spark.implicits._
    val boiler = "accept all cookies"
    val fix = Seq(
      1L -> s"intro one\n$boiler\nbody a",
      2L -> s"$boiler\nbody b\noutro two",
      // a line repeated WITHIN one doc is 1 distinct doc → kept twice
      3L -> "solo line\nsolo line\nbody c",
      // every line duplicated → empty row survives (corpus rewrite)
      4L -> s"$boiler\n$boiler").toDF("doc_id", "text")
    val out = Dedup.removeDupLines(fix, "doc_id", "text").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("intro one\nbody a", 3L, 1L)))
    assert(out(2L) === (("body b\noutro two", 3L, 1L)))
    assert(out(3L) === (("solo line\nsolo line\nbody c", 3L, 0L)))
    assert(out(4L) === (("", 2L, 2L)))
    // minDocs=3: boiler is in 3 distinct docs → still drops; a pair-only
    // line (docs 1+2 only) would survive — add one and check both fates
    val fix3 = Seq(
      1L -> s"$boiler\npair line\nuniq a",
      2L -> s"pair line\n$boiler",
      5L -> s"$boiler\nuniq b").toDF("doc_id", "text")
    val out3 = Dedup.removeDupLines(fix3, "doc_id", "text", minDocs = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out3(1L) === "pair line\nuniq a", "2-doc line survives minDocs=3")
    assert(out3(2L) === "pair line")
    assert(out3(5L) === "uniq b")
    // minDocs ≤ 1: no line is non-duplicated — everything removed
    val all = Dedup.removeDupLines(fix, "doc_id", "text", minDocs = 1)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    assert(all.forall { case (t, _) => t == "" })
    // custom separator (sep is regex-quoted — '|' must not alternate)
    val sepFix = Seq(10L -> "a b | c d | e", 11L -> "c d | f").toDF("doc_id", "text")
    val sepOut = Dedup.removeDupLines(sepFix, "doc_id", "text", sep = " | ")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(sepOut(10L) === "a b | e" && sepOut(11L) === "f")
    // hashed scale path ≡ string-keyed oracle path on the real table with
    // d16's line injection — and the fixture must actually remove lines
    val lined = docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        regexp_replace(col("text"), "((\\S+ ){3}\\S+) ", "$1\n").as("text"))
    def rows(h: Boolean, m: Boolean = false) =
      Dedup.removeDupLines(lined, "doc_id", "text",
        hashLines = h, md5Keys = m).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    val hashed = rows(true)
    assert(hashed === rows(false))
    // the cross-engine md5-low-60 key mode (the d16 gate's path) agrees
    // with both the xxhash64 default and the string mode
    assert(hashed === rows(true, m = true))
    assert(hashed.exists(_._3 > 0L), "injected corpus should drop some lines")
  }

  test("span-dup removal: long fully-duplicated docs collapse to one coverage interval") {
    import spark.implicits._
    // two identical 4000-token docs: every window duplicated, the 3996
    // overlapping spans must merge into a SINGLE coverage interval — the
    // worst case for the old per-position flatten (~n·L entries probed
    // per token); a partially-shared doc pins the interval boundaries
    val shared = (1 to 4000).map(i => s"s$i").mkString(" ")
    val fix = Seq(
      1L -> shared, 2L -> shared,
      3L -> (s"u1 u2 u3 $shared z1 z2 z3"),
      7L -> ((1 to 50).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(fix, "doc_id", "text", 5).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("", 4000L)) && out(2L) === (("", 4000L)))
    assert(out(3L) === (("u1 u2 u3 z1 z2 z3", 4000L)),
      "only the shared middle is excised; the unique flanks survive")
    assert(out(7L)._2 === 0L, "unique long doc untouched")
  }

  test("Corpus.prepare span floor drops high-dup-fraction docs before the composition") {
    import spark.implicits._
    val stops = Seq("the", "a", "of", "and", "to")
    val markers = Seq("en" -> Seq("the", "a", "of", "and"))
    // both docs pass quality+lang; the boilerplate-heavy one must fall to
    // the span floor (its windows are all shared with doc 2)
    val boiler = (1 to 30).map(i => s"b$i").mkString(" ")
    val fix = Seq(
      1L -> s"the a of and to $boiler",
      2L -> s"the of a and to $boiler",
      3L -> ("the a of and to " + (1 to 30).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val kept = Corpus.prepare(fix, "doc_id", "text", stops, markers,
        0.0, Seq("en"), spanTokens = 5, maxDupFrac = 0.2)
      .select("rep_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L),
      s"docs 1/2 share a 30-token span (dup_frac > 0.2) and must drop: $kept")
    // default params leave the composition unchanged (no span filtering)
    val all = Corpus.prepare(fix, "doc_id", "text", stops, markers,
      0.0, Seq("en")).count()
    assert(all === 3L)
  }

  test("exact dedup groups by content, representative = min id") {
    val out = Dedup.exactDedup(docs, "doc_id", "text")
    val nDocs = docs.count()
    val nTexts = docs.select("text").distinct().count()
    assert(out.count() === nTexts)
    assert(out.agg(sum("n_copies")).head.getLong(0) === nDocs)
  }

  test("IVF ANN reaches a recall floor vs exact top-k") {
    val q = embs.filter(col("vec_id") < 50)
    val cents = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
    val exact = Similarity.cosineTopK(q, embs, "vec_id", "embedding", 5)
    val approx = Similarity.ivfTopK(q, embs, cents, "vec_id", "embedding", 5, 3)
    val recall = Similarity.recallAgainst(exact, approx, 5)
      .head.getDouble(1)
    assert(recall >= 0.4, s"IVF recall@5 = $recall below floor")
  }

  test("IVF cell skew: cellStats reports the hot cell; salted scoring join is exact") {
    import spark.implicits._
    // 90 %-one-cell corpus: 900 vectors in a tight cluster around e0, 100
    // spread around e1 — the degenerate shape where the scoring join's
    // hot-cell reducer dominates unless salted
    val dim = 8
    def vec(base: Int, wobble: Int): Array[Float] = {
      val a = new Array[Float](dim)
      a(base) = 1.0f
      a((base + 1) % dim) = 0.001f * (wobble % 97)
      a
    }
    val corpus = (0L until 1000L).map(i =>
      (i, vec(if (i < 900) 0 else 1, i.toInt))).toDF("vec_id", "embedding")
    val cents = Seq((0L, vec(0, 0)), (1L, vec(1, 0)))
      .toDF("cell", "_cv")
    val assigned = Similarity.assignCells(corpus, cents, "vec_id", "embedding", 1)
    val stats = Similarity.cellStats(assigned).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(stats.head._2 === 900L && stats.head._3 === 0.9,
      s"diagnostic must surface the hot cell: $stats")
    val q = corpus.filter(col("vec_id") % 50 === 0)
    def res(salt: Int) =
      Similarity.ivfTopK(q, corpus, cents, "vec_id", "embedding",
          k = 5, nprobe = 1, salt = salt)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val unsalted = res(1)
    assert(unsalted.nonEmpty)
    // exactness under salting: every corpus row lands in exactly one
    // sub-bucket, so the salted join scores the same pair set
    assert(res(8) === unsalted)
  }

  test("persisted IVF index serves identical results to the live path and prunes probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfidx").toString
    val q = embs.filter(col("vec_id") % 37 === 0)
    Similarity.saveIvfIndex(embs, "vec_id", "embedding", dir, nlist = 8)
    val cents = Similarity.trainCentroids(embs, "embedding", 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val live = rows(Similarity.ivfTopK(q, embs, cents, "vec_id", "embedding",
      k = 5, nprobe = 3))
    assert(live.nonEmpty)
    val served = Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding",
      k = 5, nprobe = 3)
    assert(rows(served) === live, "indexed ≡ live")
    // salted serving stays exact too
    assert(rows(Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding",
      k = 5, nprobe = 3, salt = 4)) === live)
    // the corpus layout is cell-partitioned (the probed-cells-only scan
    // at the file level)
    val parts = new java.io.File(s"$dir/v1/corpus").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    assert(parts.length === 8, s"expected 8 cell partitions, got ${parts.toSeq}")
    // a crashed rebuild (uncommitted version dir, no _COMMIT) is invisible
    // to readers — the old version keeps serving consistent results
    val crashed = new java.io.File(s"$dir/v2/corpus"); crashed.mkdirs()
    assert(rows(Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding",
      k = 5, nprobe = 3)) === live)
    // a completed rebuild commits v3, serves identically, and sweeps both
    // the crashed v2 and the superseded v1
    Similarity.saveIvfIndex(embs, "vec_id", "embedding", dir, nlist = 8)
    assert(rows(Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding",
      k = 5, nprobe = 3)) === live)
    val vdirs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("v")).sorted.toSeq
    assert(vdirs === Seq("v3"), s"superseded/crashed versions must sweep: $vdirs")
  }

  test("parquetDirSchema \u2261 Spark inference on index layouts (partitioned corpus + metadata tables)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfschema").toString
    Similarity.saveIvfIndex(embs, "vec_id", "embedding", dir, nlist = 8)
    for (sub <- Seq("corpus", "centroids")) {
      val path = s"$dir/v1/$sub"
      val inferred = spark.read.parquet(path).schema
      val footer = Similarity.parquetDirSchema(spark, path)
      assert(footer === inferred, s"$sub: footer schema must match inference")
    }
    // no parquet file under the dir fails like inference does (Try-able)
    val emptyDir = java.nio.file.Files
      .createTempDirectory("graft_ivfschema_empty").toString
    intercept[IllegalArgumentException] {
      Similarity.parquetDirSchema(spark, emptyDir)
    }
  }

  test("filtered ANN serving: true top-k of the allowed subset, not a post-filter of the global top-k") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfflt").toString
    val q = embs.filter(col("vec_id") % 37 === 0)
    Similarity.saveIvfIndex(embs, "vec_id", "embedding", dir, nlist = 8)
    val allow = embs.filter(col("vec_id") % 3 === 0).select("vec_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val filtered = rows(Similarity.ivfTopKIndexed(q, dir, "vec_id",
      "embedding", k = 5, nprobe = 3, allow = Some(allow)))
    // ≡ serving a corpus that only ever contained the allowed ids (same
    // stored centroids: inject them so assignments match)
    val cents = Similarity.ivfCentroids(spark, dir)
      .select(col("cell"), col("_cv"))
    val dirAllowed = java.nio.file.Files
      .createTempDirectory("graft_ivfflt2").toString
    Similarity.saveIvfIndex(embs.filter(col("vec_id") % 3 === 0), "vec_id",
      "embedding", dirAllowed, nlist = 8, centroids = Some(cents))
    val subsetServe = rows(Similarity.ivfTopKIndexed(q, dirAllowed,
      "vec_id", "embedding", k = 5, nprobe = 3))
    assert(filtered === subsetServe,
      "filtered serve ≡ serving the allowed-only corpus")
    // and ≠ post-filtering the unfiltered top-k: that returns fewer than
    // k for queries whose global winners are disallowed
    val global = Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding",
      k = 5, nprobe = 3)
    val postFiltered = rows(global.filter(col("neighbor_id") % 3 === 0))
    assert(postFiltered.subsetOf(filtered) && postFiltered.size < filtered.size,
      "post-filtering loses allowed neighbors ranked below global winners")
    // every returned neighbor honors the predicate
    assert(filtered.forall(_._2 % 3 == 0))
  }

  test("IVF append: served ≡ live over the grown corpus; crash-safe deltas; compaction folds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfapp").toString
    val base = embs.filter(col("vec_id") % 5 =!= 0)
    val growth1 = embs.filter(col("vec_id") % 5 === 0 && col("vec_id") % 10 =!= 0)
    val growth2 = embs.filter(col("vec_id") % 10 === 0)
    val q = embs.filter(col("vec_id") % 37 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    Similarity.saveIvfIndex(base, "vec_id", "embedding", dir, nlist = 8)
    // live reference: the full grown corpus scored against the STORED
    // centroids (append never retrains)
    val cents = Similarity.ivfCentroids(spark, dir)
    def live(corpus: org.apache.spark.sql.DataFrame) = rows(
      Similarity.ivfTopK(q, corpus, cents, "vec_id", "embedding", k = 5, nprobe = 3))
    Similarity.appendIvfIndex(growth1, "vec_id", "embedding", dir)
    assert(rows(Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding",
      k = 5, nprobe = 3)) === live(base.union(growth1)), "after first append")
    // a crashed append (no _COMMIT) is invisible to readers
    val crashed = new java.io.File(s"$dir/v1/delta2/corpus"); crashed.mkdirs()
    assert(rows(Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding",
      k = 5, nprobe = 3)) === live(base.union(growth1)))
    // the next append sweeps it and serves the further-grown corpus
    Similarity.appendIvfIndex(growth2, "vec_id", "embedding", dir)
    val full = live(base.union(growth1).union(growth2))
    assert(rows(Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding",
      k = 5, nprobe = 3)) === full, "after second append")
    assert(!new java.io.File(s"$dir/v1/delta2").exists(),
      "crashed delta must be swept by the next successful append")
    assert(new java.io.File(s"$dir/v1").listFiles().map(_.getName)
      .count(_.startsWith("delta")) === 2)
    // salted serving over base+deltas stays exact
    assert(rows(Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding",
      k = 5, nprobe = 3, salt = 4)) === full)
    // a crashed compaction (uncommitted version) is invisible
    new java.io.File(s"$dir/v2/corpus").mkdirs()
    assert(rows(Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding",
      k = 5, nprobe = 3)) === full)
    // compaction folds deltas into one new committed version, same
    // centroids, identical results; old version + crashed v2 swept
    Similarity.compactIvfIndex(spark, dir)
    assert(rows(Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding",
      k = 5, nprobe = 3)) === full, "after compaction")
    val vdirs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("v")).sorted.toSeq
    assert(vdirs === Seq("v3"), s"compaction must sweep old versions: $vdirs")
    assert(new java.io.File(s"$dir/v3").listFiles().map(_.getName)
      .count(_.startsWith("delta")) === 0)
    // compaction with no deltas is a no-op (no new version)
    Similarity.compactIvfIndex(spark, dir)
    assert(new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("v")).sorted.toSeq === Seq("v3"))
  }

  test("appending an all-excluded delivery leaves NO delta (an empty partitioned dir would poison union reads)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfempty").toString
    Similarity.saveIvfIndex(embs.limit(100), "vec_id", "embedding", dir, nlist = 4)
    val q = embs.filter(col("vec_id") % 37 === 0)
    def rows() = Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding", 5, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = rows()
    // every vector zero-norm → assignCells drops all rows by contract
    val allZero = Seq((9001L, Array.fill(8)(0.0f)), (9002L, Array.fill(8)(0.0f)))
      .toDF("vec_id", "embedding")
    Similarity.appendIvfIndex(allZero, "vec_id", "embedding", dir, Some("bz"))
    assert(new java.io.File(s"$dir/v1").listFiles().map(_.getName)
      .count(_.startsWith("delta")) === 0, "no unreadable empty delta")
    assert(rows() === before, "serving unchanged and readable")
    // replay converges to the same nothing
    Similarity.appendIvfIndex(allZero, "vec_id", "embedding", dir, Some("bz"))
    assert(rows() === before)
  }

  test("SQ8 quantized index: recall floor vs exact, ~4x smaller vectors, append-grown ≡ full save across fold and replay") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfq").toString
    val fdir = java.nio.file.Files.createTempDirectory("graft_ivff").toString
    val q = embs.filter(col("vec_id") < 50)
    Similarity.saveIvfIndexQuantized(embs, "vec_id", "embedding", dir, nlist = 8)
    Similarity.saveIvfIndex(embs, "vec_id", "embedding", fdir, nlist = 8)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
    val exact = pairs(Similarity.cosineTopK(q, embs, "vec_id", "embedding", 5))
    val served = pairs(Similarity.ivfTopKQuantized(q, dir, "vec_id",
      "embedding", k = 5, nprobe = 3))
    val recall = Similarity.recallAgainst(exact, served, 5).head.getDouble(1)
    // IVF(float, nprobe=3) itself is the probing ceiling; quantization
    // must not lose more than a few points below it
    val floatServed = pairs(Similarity.ivfTopKIndexed(q, fdir, "vec_id",
      "embedding", k = 5, nprobe = 3))
    val floatRecall = Similarity.recallAgainst(exact, floatServed, 5)
      .head.getDouble(1)
    assert(recall >= floatRecall - 0.05,
      s"SQ8 recall $recall fell too far below float-IVF recall $floatRecall")
    // salted serving returns the identical set
    assert(pairs(Similarity.ivfTopKQuantized(q, dir, "vec_id", "embedding",
        5, 3, salt = 4)).collect().toSet === served.collect().toSet)
    // storage: quantized corpus bytes well under the float corpus
    def corpusBytes(d: String) = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(s"$d/v1/corpus"))
    }
    assert(corpusBytes(dir) < (corpusBytes(fdir) * 0.5),
      s"quantized ${corpusBytes(dir)} vs float ${corpusBytes(fdir)}")
    // constant vectors reconstruct exactly (step 0 path)
    val const = Seq((1L, Array.fill(8)(0.25f)), (2L, Array.fill(8)(0.25f)),
      (3L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val cdir = java.nio.file.Files.createTempDirectory("graft_ivfqc").toString
    Similarity.saveIvfIndexQuantized(const, "vec_id", "embedding", cdir,
      nlist = 2, centroids = Some(Seq((0L, Array.fill(8)(0.25f)),
        (1L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))).toDF("cell", "_cv")))
    val cServed = Similarity.ivfTopKQuantized(
        const.filter(col("vec_id") === 1L), cdir, "vec_id", "embedding", 2, 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(math.abs(cServed(2L) - 1.0) < 1e-9,
      "identical constant vectors must score cosine 1 exactly")
    // refine: with every cell probed and a full-width candidate set, the
    // refined result IS the exact top-k (the quantized tier only
    // proposes; exact rescoring decides) — and scores are exact cosines
    val refined = Similarity.ivfTopKQuantizedRefined(q, dir, embs,
        "vec_id", "embedding", k = 5, nprobe = 8,
        refineFactor = embs.count().toInt / 5 + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exactRows = Similarity.cosineTopK(q, embs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(refined === exactRows,
      "full-width refine must equal the exact scan, scores included")
    // appending to a quantized index quantizes the delivery per-row (the
    // _QUANTIZED marker, not corpus-schema sniffing, selects the format):
    // an index grown by appends serves BIT-IDENTICALLY to a full
    // quantize-everything save with the same centroids — per-row encoding
    // and cell assignment cannot depend on arrival order
    val half1 = embs.filter(col("vec_id") % 2 === 0)
    val half2 = embs.filter(col("vec_id") % 2 =!= 0)
    val cents8 = Similarity.ivfCentroids(spark, dir).localCheckpoint(true)
    val gdir = java.nio.file.Files.createTempDirectory("graft_ivfqg").toString
    Similarity.saveIvfIndexQuantized(half1, "vec_id", "embedding", gdir,
      nlist = 8, centroids = Some(cents8))
    Similarity.appendIvfIndex(half2, "vec_id", "embedding", gdir, Some("b7"))
    def full(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val grownServed = full(Similarity.ivfTopKQuantized(q, gdir, "vec_id",
      "embedding", k = 5, nprobe = 3))
    assert(grownServed === full(Similarity.ivfTopKQuantized(q, dir, "vec_id",
      "embedding", k = 5, nprobe = 3)),
      "append-grown quantized index must serve exactly the full-save result")
    // replaying the named delta converges (same dir rewritten)
    Similarity.appendIvfIndex(half2, "vec_id", "embedding", gdir, Some("b7"))
    assert(full(Similarity.ivfTopKQuantized(q, gdir, "vec_id", "embedding",
      5, 3)) === grownServed)
    // compaction folds the quantized delta and carries the flavor marker:
    // a post-fold append must still quantize (not land float rows)
    Similarity.compactIvfIndex(spark, gdir)
    assert(new java.io.File(s"$gdir/v2/_QUANTIZED").exists(),
      "compaction must carry the _QUANTIZED marker forward")
    assert(full(Similarity.ivfTopKQuantized(q, gdir, "vec_id", "embedding",
      5, 3)) === grownServed, "across the fold")
    // a replay of the folded delta no-ops via the _FOLDED ledger
    Similarity.appendIvfIndex(half2, "vec_id", "embedding", gdir, Some("b7"))
    assert(full(Similarity.ivfTopKQuantized(q, gdir, "vec_id", "embedding",
      5, 3)) === grownServed, "folded replay must no-op")
  }

  test("PQ index: deep compression, recall floor, refined = exact, append-grown ≡ full save across fold") {
    import spark.implicits._
    val cents = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    Similarity.saveIvfIndexPQ(embs, "vec_id", "embedding", dir, nlist = 8,
      pqM = 8, pqK = 64, centroids = Some(cents))
    val q = embs.filter(col("vec_id") < 50)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id")
    val exact = Similarity.cosineTopK(q, embs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
    val served = pairs(Similarity.ivfTopKPQ(q, dir, "vec_id", "embedding",
      k = 5, nprobe = 3))
    val recall = Similarity.recallAgainst(exact, served, 5).head.getDouble(1)
    // 8 bytes of payload per dim-64 vector is a LOSSY proposal tier, and
    // this synthetic near-iid embedding table is PQ's adversarial case
    // (no manifold structure for the subspace codebooks to exploit —
    // the same honesty note as the SQ8 degenerate fixture): measured
    // ~0.30 here vs ~0.01 chance. The gates are a chance-relative floor,
    // MONOTONICITY in codebook size (the knob a deployment turns), and
    // the refine pass below as the exact remedy.
    assert(recall >= 0.2, s"PQ raw recall $recall below the sanity floor")
    val dirSmall = java.nio.file.Files.createTempDirectory("graft_ivfpqs").toString
    Similarity.saveIvfIndexPQ(embs, "vec_id", "embedding", dirSmall,
      nlist = 8, pqM = 8, pqK = 8, centroids = Some(cents))
    val recallSmall = Similarity.recallAgainst(exact,
      pairs(Similarity.ivfTopKPQ(q, dirSmall, "vec_id", "embedding",
        k = 5, nprobe = 3)), 5).head.getDouble(1)
    assert(recall > recallSmall,
      s"recall must grow with codebook size: k=64 $recall vs k=8 $recallSmall")
    // storage: PQ corpus bytes well under the SQ8 corpus (codes are
    // m bytes vs dim bytes + per-row params)
    val qdir = java.nio.file.Files.createTempDirectory("graft_ivfpq8").toString
    Similarity.saveIvfIndexQuantized(embs, "vec_id", "embedding", qdir,
      nlist = 8, centroids = Some(cents))
    def corpusBytes(d: String) = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(s"$d/v1/corpus"))
    }
    assert(corpusBytes(dir) < corpusBytes(qdir),
      s"PQ ${corpusBytes(dir)} vs SQ8 ${corpusBytes(qdir)}")
    // full-width refine: exact rescoring decides every rank → equals the
    // exact scan, scores included, regardless of the proposal tier
    val refined = Similarity.ivfTopKPQRefined(q, dir, embs, "vec_id",
        "embedding", k = 5, nprobe = 8,
        refineFactor = embs.count().toInt / 5 + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exactRows = Similarity.cosineTopK(q, embs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(refined === exactRows)
    // append-grown ≡ full save with the SAME centroids and codebooks:
    // per-row encoding against stored codebooks cannot depend on order
    val cbs = Similarity.trainPqCodebooks(
      embs.filter(col("vec_id") % 2 === 0), "embedding", 8, 16)
    val gdir = java.nio.file.Files.createTempDirectory("graft_ivfpqg").toString
    val fdir = java.nio.file.Files.createTempDirectory("graft_ivfpqf").toString
    Similarity.saveIvfIndexPQ(embs.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", gdir, nlist = 8, centroids = Some(cents),
      codebooks = Some(cbs))
    Similarity.appendIvfIndex(embs.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", gdir, Some("b3"))
    Similarity.saveIvfIndexPQ(embs, "vec_id", "embedding", fdir, nlist = 8,
      centroids = Some(cents), codebooks = Some(cbs))
    def full(d: String) = Similarity.ivfTopKPQ(q, d, "vec_id", "embedding",
        5, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val grown = full(gdir)
    assert(grown === full(fdir),
      "append-grown PQ index must serve exactly the full-save result")
    // compaction folds the delta and carries flavor + codebooks — a
    // post-fold append must still PQ-encode against the same codebooks
    Similarity.compactIvfIndex(spark, gdir)
    assert(new java.io.File(s"$gdir/v2/_PQ").exists(), "marker carried")
    assert(new java.io.File(s"$gdir/v2/codebooks").exists(), "codebooks carried")
    assert(full(gdir) === grown, "across the fold")
    Similarity.appendIvfIndex(embs.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", gdir, Some("b3"))
    assert(full(gdir) === grown, "folded replay must no-op")
  }

  test("PQ codebook drift: appended shifted deliveries raise delta mean_qerr; refresh restores the floor and raw recall") {
    import spark.implicits._
    // dim 8, m=4 (sub=2). Corpus A lives on the even components, corpus B
    // (the post-training distribution shift) on the odd ones — codebooks
    // trained on A reconstruct A exactly (2 distinct subvectors per
    // subspace, pqK=4) and B not at all.
    def aVec(i: Long) = Array.tabulate(8)(j =>
      if (j % 2 == 0) (i % 2 + 1).toFloat else 0f)
    def bVec(i: Long) = Array.tabulate(8)(j =>
      if (j % 2 == 1) (i % 2 + 3).toFloat else 0f)
    val a = (0L until 100L).map(i => (i, aVec(i))).toDF("vec_id", "embedding")
    val b = (100L until 200L).map(i => (i, bVec(i))).toDF("vec_id", "embedding")
    val cents = Seq(
      (0L, Array.tabulate(8)(j => if (j % 2 == 0) 1f else 0f)),
      (1L, Array.tabulate(8)(j => if (j % 2 == 1) 1f else 0f)))
      .toDF("cell", "_cv")
    val dir = java.nio.file.Files.createTempDirectory("graft_pqdrift").toString
    Similarity.saveIvfIndexPQ(a, "vec_id", "embedding", dir, nlist = 2,
      pqM = 4, pqK = 4, centroids = Some(cents))
    def stats() = Similarity.pqIndexStats(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val s0 = stats()
    assert(s0.keySet === Set("base") && s0("base")._1 === 100L)
    assert(s0("base")._2 < 1e-3,
      s"trained-corpus error must sit at the floor, got ${s0("base")._2}")
    // the shifted delivery encodes against the FROZEN codebooks
    Similarity.appendIvfIndex(b, "vec_id", "embedding", dir, Some("b1"))
    val s1 = stats()
    assert(s1.keySet === Set("base", "deltab1"))
    assert(s1("base")._2 < 1e-3 && s1("deltab1")._2 > 0.5,
      s"drift alarm: delta mean_qerr ${s1("deltab1")._2} must dwarf base " +
        s"${s1("base")._2}")
    // pre-refresh raw ADC serve of a B query: B rows reconstruct to
    // even-component centroids, so every ADC dot against the query's odd
    // components is ~0 — the measurable recall rot behind the alarm
    val q = b.filter(col("vec_id") === 100L)
    def top1Cos() = Similarity.ivfTopKPQ(q, dir, "vec_id", "embedding",
      k = 1, nprobe = 2).head.getDouble(2)
    assert(math.abs(top1Cos()) < 0.1, "drifted codebooks flatten B scores")
    // refresh: retrain on the full-precision source of truth, same coarse
    // centroids, version-swap with retain=1 for concurrent readers
    Similarity.refreshPqCodebooks(a.unionByName(b), "vec_id", "embedding",
      dir, pqK = 4)
    assert(new java.io.File(s"$dir/v1/_COMMIT").exists(),
      "retain=1 keeps the previous version serving")
    assert(new java.io.File(s"$dir/v2/_PQ").exists(), "flavor carried")
    val s2 = stats()
    assert(s2.keySet === Set("base") && s2("base")._1 === 200L)
    assert(s2("base")._2 < 1e-3,
      s"refresh must restore the error floor, got ${s2("base")._2}")
    assert(top1Cos() > 0.9,
      "refreshed codebooks restore raw ADC ranking for the shifted region")
  }

  test("residual PQ: clustered corpus encodes near-exactly where plain PQ cannot; appends and folds keep the flavor") {
    import spark.implicits._
    // 4 far-apart cell centers on even components 0/2/4/6, every vector =
    // its center ± 1 at component 1 — the SAME fine offset in every cell.
    // Plain PQ at pqK=2 must cover 4 distinct subspace-0 values
    // {(10,±1), (0,±1)} with 2 codes → irreducible error; residuals are
    // globally {(0,±1)} → 2 codes encode EXACTLY. Same m, same bytes.
    def vec(i: Long) = {
      val a = new Array[Float](8)
      a(((i % 4) * 2).toInt) = 10f
      a(1) = if (i % 2 == 0) 1f else -1f
      a
    }
    val corpus = (0L until 200L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    // centroids are the ACTUAL cluster centers (magnitude included):
    // cosine assignment only needs the direction, but the residual is
    // v − c, so a unit-length "centroid" would leave 9·e_{2c} in every
    // residual and the fine structure would not collapse
    val cents = (0L until 4L).map { c =>
      val a = new Array[Float](8); a((c * 2).toInt) = 10f; (c, a)
    }.toDF("cell", "_cv")
    val plainDir = java.nio.file.Files.createTempDirectory("graft_pqp").toString
    val resDir = java.nio.file.Files.createTempDirectory("graft_pqr").toString
    Similarity.saveIvfIndexPQ(corpus, "vec_id", "embedding", plainDir,
      nlist = 4, pqM = 4, pqK = 2, centroids = Some(cents))
    Similarity.saveIvfIndexPQ(corpus, "vec_id", "embedding", resDir,
      nlist = 4, pqM = 4, pqK = 2, centroids = Some(cents), residual = true)
    def meanErr(d: String) = Similarity.pqIndexStats(spark, d)
      .filter(col("source") === "base").head.getDouble(2)
    assert(meanErr(resDir) < 1e-3,
      s"residual codes capture the shared fine structure: ${meanErr(resDir)}")
    assert(meanErr(plainDir) > 0.05,
      s"plain codes cannot: ${meanErr(plainDir)}")
    // raw residual serve is exact here (zero reconstruction error): each
    // query's top-1 is its true nearest neighbor, scores = exact cosine
    val q = corpus.filter(col("vec_id") < 8)
    val exact = Similarity.cosineTopK(q, corpus, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))).toSet
    val raw = Similarity.ivfTopKPQ(q, resDir, "vec_id", "embedding",
        k = 3, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))).toSet
    assert(raw === exact, "zero-error residual codes serve the exact ranking")
    // append-grown ≡ full save: the _PQRES marker routes delivery
    // encoding through the stored residual space
    // split by id RANGE: an even/odd split would correlate with the
    // offset sign and train the codebooks on half the residual alphabet
    val gdir = java.nio.file.Files.createTempDirectory("graft_pqrg").toString
    Similarity.saveIvfIndexPQ(corpus.filter(col("vec_id") < 100),
      "vec_id", "embedding", gdir, nlist = 4, pqM = 4, pqK = 2,
      centroids = Some(cents), residual = true)
    Similarity.appendIvfIndex(corpus.filter(col("vec_id") >= 100),
      "vec_id", "embedding", gdir, Some("b1"))
    def serve(d: String) = Similarity.ivfTopKPQ(q, d, "vec_id", "embedding",
        3, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))).toSet
    val grown = serve(gdir)
    assert(grown === serve(resDir),
      "append-grown residual index serves the full-save result")
    // stats see both units at the error floor (the shifted-space alarm
    // CANNOT fire here — deliveries share the training distribution)
    val st = Similarity.pqIndexStats(spark, gdir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(st.keySet === Set("base", "deltab1") && st.values.forall(_ < 1e-3))
    // compaction carries _PQRES; a folded replay stays a no-op
    Similarity.compactIvfIndex(spark, gdir)
    assert(new java.io.File(s"$gdir/v2/_PQRES").exists(), "flavor carried")
    assert(serve(gdir) === grown, "across the fold")
    // refresh preserves the residual flavor
    Similarity.refreshPqCodebooks(corpus, "vec_id", "embedding", gdir,
      pqK = 2, retain = 0)
    assert(new java.io.File(s"$gdir/v3/_PQRES").exists(),
      "refresh keeps the residual encoding space")
    assert(serve(gdir) === grown, "refreshed index serves the same exact ranking")
  }

  test("per-cell PQ: local codebooks encode cell-specific fine structure shared residual codebooks cannot; appends/folds/refresh keep the flavor") {
    import spark.implicits._
    // 4 far-apart cells; the fine offset at component 1 is ±(cell+1) — a
    // DIFFERENT residual alphabet per cell. Shared residual codebooks at
    // pqK=2 must cover 8 distinct subspace-0 residuals {(0, ±1..±4)}
    // with 2 codes → irreducible error; per-cell codebooks see exactly 2
    // distinct residuals each → exact at the same code bytes.
    def vec(i: Long) = {
      val c = (i % 4).toInt
      val a = new Array[Float](8)
      a(c * 2) = 10f
      // sign from i/4, NOT i%2: the cell id is i%4, so an i%2 sign would
      // correlate with the cell and leave half the cells single-signed
      a(1) = (if ((i / 4) % 2 == 0) 1f else -1f) * (c + 1)
      a
    }
    val corpus = (0L until 200L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    val cents = (0L until 4L).map { c =>
      val a = new Array[Float](8); a((c * 2).toInt) = 10f; (c, a)
    }.toDF("cell", "_cv")
    val sharedDir = java.nio.file.Files.createTempDirectory("graft_pqs").toString
    val localDir = java.nio.file.Files.createTempDirectory("graft_pql").toString
    Similarity.saveIvfIndexPQ(corpus, "vec_id", "embedding", sharedDir,
      nlist = 4, pqM = 4, pqK = 2, centroids = Some(cents), residual = true)
    Similarity.saveIvfIndexPQ(corpus, "vec_id", "embedding", localDir,
      nlist = 4, pqM = 4, pqK = 2, centroids = Some(cents), perCell = true)
    def meanErr(d: String) = Similarity.pqIndexStats(spark, d)
      .filter(col("source") === "base").head.getDouble(2)
    assert(meanErr(localDir) < 1e-3,
      s"per-cell codes encode each cell's alphabet exactly: ${meanErr(localDir)}")
    assert(meanErr(sharedDir) > 0.01,
      s"shared residual codes cannot: ${meanErr(sharedDir)}")
    // zero reconstruction error ⇒ the raw ADC serve IS the exact ranking
    val q = corpus.filter(col("vec_id") < 8)
    val exact = Similarity.cosineTopK(q, corpus, "vec_id", "embedding", 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .toSet
    def serve(d: String) = Similarity.ivfTopKPQ(q, d, "vec_id", "embedding",
        3, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .toSet
    assert(serve(localDir) === exact,
      "zero-error per-cell codes serve the exact ranking")
    // append-grown ≡ full save: _PQLOCAL routes delivery encoding through
    // the stored CELL's codebooks (range split — see the residual test)
    val gdir = java.nio.file.Files.createTempDirectory("graft_pqlg").toString
    Similarity.saveIvfIndexPQ(corpus.filter(col("vec_id") < 100),
      "vec_id", "embedding", gdir, nlist = 4, pqM = 4, pqK = 2,
      centroids = Some(cents), perCell = true)
    Similarity.appendIvfIndex(corpus.filter(col("vec_id") >= 100),
      "vec_id", "embedding", gdir, Some("b1"))
    val grown = serve(gdir)
    assert(grown === exact,
      "append-grown per-cell index serves the full-save exact ranking")
    val st = Similarity.pqIndexStats(spark, gdir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(st.keySet === Set("base", "deltab1") && st.values.forall(_ < 1e-3),
      s"both units at the per-cell error floor: $st")
    // compaction carries _PQLOCAL (and _PQRES) with the codebooks table
    Similarity.compactIvfIndex(spark, gdir)
    assert(new java.io.File(s"$gdir/v2/_PQLOCAL").exists(), "flavor carried")
    assert(new java.io.File(s"$gdir/v2/_PQRES").exists(),
      "per-cell implies the residual encoding space")
    assert(spark.read.parquet(s"$gdir/v2/codebooks").columns.contains("cell"),
      "per-cell codebooks carried across the fold")
    assert(serve(gdir) === exact, "across the fold")
    // refresh preserves the per-cell flavor and the error floor
    Similarity.refreshPqCodebooks(corpus, "vec_id", "embedding", gdir,
      pqK = 2, retain = 0)
    assert(new java.io.File(s"$gdir/v3/_PQLOCAL").exists(),
      "refresh keeps per-cell codebooks")
    assert(serve(gdir) === exact, "refreshed index serves the exact ranking")
  }

  test("procrustesRotation: orthogonal output, recovers an orthogonal input exactly") {
    // an orthogonal M has SVD U = M, V = I → R = M
    val theta = 0.7
    val g = Array.tabulate(4, 4)((i, j) => if (i == j) 1.0 else 0.0)
    g(0)(0) = math.cos(theta); g(0)(2) = -math.sin(theta)
    g(2)(0) = math.sin(theta); g(2)(2) = math.cos(theta)
    val r = Similarity.procrustesRotation(g)
    (0 until 4).foreach(i => (0 until 4).foreach(j =>
      assert(math.abs(r(i)(j) - g(i)(j)) < 1e-9, s"r($i)($j)")))
    // a generic (non-orthogonal) M still yields an orthogonal R
    val m = Array.tabulate(4, 4)((i, j) => math.sin(i * 3 + j + 1.0) * (j + 1))
    val r2 = Similarity.procrustesRotation(m)
    (0 until 4).foreach { i =>
      (0 until 4).foreach { j =>
        val dot = (0 until 4).map(t => r2(t)(i) * r2(t)(j)).sum
        assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
          s"RᵀR($i)($j) = $dot")
      }
    }
  }

  test("OPQ rotation: trained rotation un-mixes cross-subspace structure — lower qerr at identical bytes; append/fold/refresh carry the flavor") {
    import spark.implicits._
    // ground truth: 8 independent ±1 bits (subspace-aligned at sub = 2,
    // so k = 4 codes per 2-dim subspace would encode EXACTLY) — observed
    // through a fixed mixing rotation Q of 45° Givens turns across every
    // subspace boundary (dims 1↔2, 3↔4, 5↔6). In the observed space each
    // subspace sees mixtures of four bits → k = 4 cannot cover; an OPQ
    // rotation that (approximately) inverts Q restores the product
    // structure the codes can represent.
    val d = 8
    val q = {
      val m = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
      Seq(1, 3, 5).foreach { a =>
        val g = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
        val c = math.sqrt(0.5)
        g(a)(a) = c; g(a)(a + 1) = -c; g(a + 1)(a) = c; g(a + 1)(a + 1) = c
        // m = g · m
        val nm = Array.tabulate(d, d) { (i, j) =>
          (0 until d).map(t => g(i)(t) * m(t)(j)).sum
        }
        (0 until d).foreach(i => (0 until d).foreach(j => m(i)(j) = nm(i)(j)))
      }
      m
    }
    val corpus = (0L until 256L).map { id =>
      val s = Array.tabulate(d)(j => if (((id >> j) & 1L) == 1L) 1.0 else -1.0)
      val v = Array.tabulate(d)(i =>
        (0 until d).map(j => q(i)(j) * s(j)).sum.toFloat)
      (id, v)
    }.toDF("vec_id", "embedding")
    val cents = Seq((0L, Array.tabulate(d)(i => if (i == 0) 1.0f else 0.1f)))
      .toDF("cell", "_cv")
    val rot = Similarity.trainOpqRotation(corpus, "vec_id", "embedding",
      m = 4, k = 4, iters = 40, maxTrainRows = 256).localCheckpoint()
    val idDir = java.nio.file.Files.createTempDirectory("graft_opq_id").toString
    val rotDir = java.nio.file.Files.createTempDirectory("graft_opq_r").toString
    Similarity.saveIvfIndexPQ(corpus, "vec_id", "embedding", idDir,
      nlist = 1, pqM = 4, pqK = 4, centroids = Some(cents))
    Similarity.saveIvfIndexPQ(corpus, "vec_id", "embedding", rotDir,
      nlist = 1, pqM = 4, pqK = 4, centroids = Some(cents),
      rotation = Some(rot))
    def meanErr(dd: String) = Similarity.pqIndexStats(spark, dd)
      .filter(col("source") === "base").head.getDouble(2)
    val (eId, eRot) = (meanErr(idDir), meanErr(rotDir))
    assert(eRot < eId * 0.5,
      s"trained rotation must at least halve the mixed-space error: " +
        s"identity=$eId rotated=$eRot")
    // append-grown ≡ full save through the rotated encode path
    val gdir = java.nio.file.Files.createTempDirectory("graft_opq_g").toString
    Similarity.saveIvfIndexPQ(corpus.filter(col("vec_id") < 128),
      "vec_id", "embedding", gdir, nlist = 1, pqM = 4, pqK = 4,
      centroids = Some(cents), rotation = Some(rot))
    Similarity.appendIvfIndex(corpus.filter(col("vec_id") >= 128),
      "vec_id", "embedding", gdir, Some("b1"))
    val qs = corpus.filter(col("vec_id") < 8)
    def serve(dd: String) = Similarity.ivfTopKPQ(qs, dd, "vec_id",
        "embedding", 3, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .toSet
    // the appended half encodes against the SAME stored codebooks AND
    // rotation — but the full-save trains codebooks on all 256 rows, so
    // compare against a same-corpus save with the same explicit
    // codebooks instead: reuse gdir's own stored codebooks
    val storedCbs = spark.read.parquet(s"$gdir/v1/codebooks")
      .localCheckpoint()
    val fdir = java.nio.file.Files.createTempDirectory("graft_opq_f").toString
    Similarity.saveIvfIndexPQ(corpus, "vec_id", "embedding", fdir,
      nlist = 1, pqM = 4, pqK = 4, centroids = Some(cents),
      codebooks = Some(storedCbs), rotation = Some(rot))
    assert(serve(gdir) === serve(fdir),
      "append-grown rotated index serves the explicit-codebook full save")
    // compaction and refresh carry the rotation artifacts
    Similarity.compactIvfIndex(spark, gdir)
    assert(new java.io.File(s"$gdir/v2/_PQROT").exists() &&
      new java.io.File(s"$gdir/v2/rotation").exists(), "flavor carried")
    assert(serve(gdir) === serve(fdir), "across the fold")
    Similarity.refreshPqCodebooks(corpus.filter(col("vec_id") < 128)
        .unionByName(corpus.filter(col("vec_id") >= 128)),
      "vec_id", "embedding", gdir, pqK = 4, retain = 0)
    assert(new java.io.File(s"$gdir/v3/_PQROT").exists(),
      "refresh keeps the rotated encoding space")
    // full-width refine is exact regardless of the proposal space
    val n = 256
    val exact = Similarity.cosineTopK(qs, corpus, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Similarity.ivfTopKPQRefined(qs, gdir, corpus, "vec_id",
        "embedding", 3, 1, refineFactor = n / 3 + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(refined === exact)
  }

  test("per-cell + rotation compose: all three flavor markers, exact encode through the rotated per-cell space, append parity") {
    import spark.implicits._
    def vec(i: Long) = {
      val c = (i % 4).toInt
      val a = new Array[Float](8)
      a(c * 2) = 10f
      a(1) = (if ((i / 4) % 2 == 0) 1f else -1f) * (c + 1)
      a
    }
    val corpus = (0L until 200L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    val cents = (0L until 4L).map { c =>
      val a = new Array[Float](8); a((c * 2).toInt) = 10f; (c, a)
    }.toDF("cell", "_cv")
    // the dimension-reversal permutation: exactly orthogonal, and it
    // moves each cell's ±(c+1) fine component to a different subspace —
    // per-cell k=2 codebooks must still encode exactly in that space
    val rot = spark.range(8).select(col("id").cast("int").as("i"),
      transform(sequence(lit(0), lit(7)), j =>
        when(j === lit(7) - col("id").cast("int"), lit(1.0f))
          .otherwise(lit(0.0f))).as("_rv"))
    val dir = java.nio.file.Files.createTempDirectory("graft_pqlr").toString
    Similarity.saveIvfIndexPQ(corpus.filter(col("vec_id") < 100),
      "vec_id", "embedding", dir, nlist = 4, pqM = 4, pqK = 2,
      centroids = Some(cents), perCell = true, rotation = Some(rot))
    Seq("_PQ", "_PQRES", "_PQLOCAL", "_PQROT").foreach(m =>
      assert(new java.io.File(s"$dir/v1/$m").exists(), s"marker $m"))
    Similarity.appendIvfIndex(corpus.filter(col("vec_id") >= 100),
      "vec_id", "embedding", dir, Some("b1"))
    val st = Similarity.pqIndexStats(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(st.keySet === Set("base", "deltab1") && st.values.forall(_ < 1e-3),
      s"rotated per-cell codes stay exact on both units: $st")
    // zero error ⇒ raw ADC through the rotated per-(query, cell) LUT is
    // the exact ranking
    val q = corpus.filter(col("vec_id") < 8)
    val exact = Similarity.cosineTopK(q, corpus, "vec_id", "embedding", 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .toSet
    val raw = Similarity.ivfTopKPQ(q, dir, "vec_id", "embedding", 3, 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .toSet
    assert(raw === exact)
  }

  test("trainPqCodebooksLocal: deterministic across runs, dense codes per (cell, m), capped per-cell sample") {
    import spark.implicits._
    def vec(i: Long) = {
      val c = (i % 4).toInt
      val a = new Array[Float](8)
      a(c * 2) = 10f
      // sign from i/4, NOT i%2: the cell id is i%4, so an i%2 sign would
      // correlate with the cell and leave half the cells single-signed
      a(1) = (if ((i / 4) % 2 == 0) 1f else -1f) * (c + 1)
      a
    }
    val corpus = (0L until 400L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    val cents = (0L until 4L).map { c =>
      val a = new Array[Float](8); a((c * 2).toInt) = 10f; (c, a)
    }.toDF("cell", "_cv")
    val cells = Similarity.assignCells(corpus, cents, "vec_id", "embedding", 1)
      .withColumnRenamed("vec_id", "neighbor_id")
    val res = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("_ov"))
      .join(cells, "neighbor_id")
      .join(cents.withColumnRenamed("_cv", "_ccv"), "cell")
      .withColumn("_rv", zip_with(col("_ov"), col("_ccv"), (a, b) => a - b))
      .select(col("neighbor_id"), col("_rv"), col("cell"))
      .localCheckpoint()
    def train() = Similarity.trainPqCodebooksLocal(res, "neighbor_id",
        "_rv", m = 4, k = 2, maxTrainPerCell = 50).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getSeq[Float](3).toList)).sortBy(t => (t._1, t._2, t._3))
    val a = train(); val b = train()
    assert(a.toList === b.toList, "bit-identical across runs")
    // dense codes per (cell, m) starting at 0; each cell's subspace 0
    // has exactly 2 distinct residuals → k_m = 2 there
    val grouped = a.groupBy(t => (t._1, t._2))
    assert(grouped.keySet.size === 16, "4 cells × 4 subspaces")
    grouped.foreach { case ((cell, m), rows) =>
      assert(rows.map(_._3).toList === (0 until rows.length).toList,
        s"codes dense for cell=$cell m=$m")
    }
    // the two distinct ±(cell+1) residuals are recovered exactly (Lloyd
    // means of two singleton-alphabet clusters): every subspace-0
    // codebook for cell c is {±(c+1)} at component 1
    (0 until 4).foreach { c =>
      val cb = grouped((c, 0)).map(_._4(1)).toSet
      assert(cb === Set((c + 1).toFloat, -(c + 1).toFloat),
        s"cell $c subspace 0 alphabet: $cb")
    }
  }

  test("per-cell PQ: a cell empty at save time gets the zero-codebook fallback — later appends into it encode and serve") {
    import spark.implicits._
    def vec(i: Long) = {
      val c = (i % 4).toInt
      val a = new Array[Float](8)
      a(c * 2) = 10f
      a(1) = (if ((i / 4) % 2 == 0) 1f else -1f) * (c + 1)
      a
    }
    val corpus = (0L until 200L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    val cents = (0L until 4L).map { c =>
      val a = new Array[Float](8); a((c * 2).toInt) = 10f; (c, a)
    }.toDF("cell", "_cv")
    val dir = java.nio.file.Files.createTempDirectory("graft_pqle").toString
    // save WITHOUT cell 3's rows: its codebook is the zero fallback
    Similarity.saveIvfIndexPQ(corpus.filter(col("vec_id") % 4 =!= 3),
      "vec_id", "embedding", dir, nlist = 4, pqM = 4, pqK = 2,
      centroids = Some(cents), perCell = true)
    val storedCells = spark.read.parquet(s"$dir/v1/codebooks")
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(storedCells === Set(0, 1, 2, 3),
      "every centroid cell has a stored codebook")
    // the delivery lands in the empty cell, encodes (code 0, qerr 1 —
    // coarse-only proposal), and the cell SERVES
    Similarity.appendIvfIndex(corpus.filter(col("vec_id") % 4 === 3),
      "vec_id", "embedding", dir, Some("b1"))
    val st = Similarity.pqIndexStats(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // zero codes reconstruct nothing of the residual: qerr = ‖r‖/‖v‖ =
    // 4/√116 ≈ 0.3714 for every cell-3 vector — the drift diagnostic
    // fires exactly where the fallback paid
    assert(st("base") < 1e-3 && st("deltab1") > 0.37 && st("deltab1") < 0.38,
      s"zero-codebook encodes at the residual-norm error: $st")
    val q = corpus.filter(col("vec_id") === 3)
    val raw = Similarity.ivfTopKPQ(q, dir, "vec_id", "embedding", 3, 1)
      .collect()
    assert(raw.nonEmpty && raw.forall(_.getLong(1) % 4 === 3),
      "the once-empty cell serves its appended rows")
    // refine recovers exact ranks over the coarse-only proposals
    val exact = Similarity.cosineTopK(q, corpus.filter(col("vec_id") % 4 === 3),
        "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Similarity.ivfTopKPQRefined(q, dir, corpus, "vec_id",
        "embedding", 3, 1, refineFactor = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(refined === exact)
  }

  test("legacy PQ base without _qerr: serving unions, stats report null, appends stamp") {
    import spark.implicits._
    val cents = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
    val dir = java.nio.file.Files.createTempDirectory("graft_pqleg").toString
    Similarity.saveIvfIndexPQ(embs.filter(col("vec_id") % 2 === 0), "vec_id",
      "embedding", dir, nlist = 8, pqM = 8, pqK = 16, centroids = Some(cents))
    // simulate a pre-_qerr base: rewrite the base corpus without the column
    val base = s"$dir/v1/corpus"
    val legacy = spark.read.parquet(base).drop("_qerr").localCheckpoint()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    legacy.write.partitionBy("cell").parquet(base)
    Similarity.appendIvfIndex(embs.filter(col("vec_id") % 2 =!= 0), "vec_id",
      "embedding", dir, Some("b1"))
    // mixed schema serves (allowMissingColumns union), new delta is stamped
    val q = embs.filter(col("vec_id") < 10)
    assert(Similarity.ivfTopKPQ(q, dir, "vec_id", "embedding", 5, 3)
      .count() > 0)
    val st = Similarity.pqIndexStats(spark, dir).collect()
      .map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(st("base").isEmpty, "legacy base reports null mean_qerr")
    assert(st("deltab1").nonEmpty, "post-upgrade delta carries the stamp")
  }

  test("empty-seeded PQ index: explicit centroids + codebooks, appends encode") {
    import spark.implicits._
    val cents = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
    val cbs = Similarity.trainPqCodebooks(embs, "embedding", 8, 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpqe").toString
    Similarity.saveIvfIndexPQ(embs.filter(lit(false)), "vec_id", "embedding",
      dir, nlist = 8, centroids = Some(cents), codebooks = Some(cbs))
    val q = embs.filter(col("vec_id") < 10)
    assert(Similarity.ivfTopKPQ(q, dir, "vec_id", "embedding", 5, 8)
      .count() === 0L, "empty-seeded PQ index serves empty")
    Similarity.appendIvfIndex(embs, "vec_id", "embedding", dir, Some("b1"))
    val fdir = java.nio.file.Files.createTempDirectory("graft_ivfpqef").toString
    Similarity.saveIvfIndexPQ(embs, "vec_id", "embedding", fdir, nlist = 8,
      centroids = Some(cents), codebooks = Some(cbs))
    def rows(d: String) = Similarity.ivfTopKPQ(q, d, "vec_id", "embedding",
        5, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(dir) === rows(fdir),
      "appends onto the empty seed serve the full-save result")
  }

  test("stale refine store: fallback rows flagged refined=false and ranked after exact rescores") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfqs").toString
    val cents = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
    Similarity.saveIvfIndexQuantized(embs, "vec_id", "embedding", dir,
      nlist = 8, centroids = Some(cents))
    val q = embs.filter(col("vec_id") < 10)
    // refine store covering fewer rows than k — exact rescores rank
    // first (absent candidates can never displace them), so fallback
    // rows only surface to FILL the k; with 3 refinable ids and k = 5
    // every query must show both kinds, flagged
    val stale = embs.filter(col("vec_id") < 3)
    val out = Similarity.ivfTopKQuantizedRefined(q, dir, stale,
        "vec_id", "embedding", k = 5, nprobe = 8,
        refineFactor = embs.count().toInt / 5 + 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.exists(!_._4), "odd-id neighbors must surface as fallback")
    assert(out.exists(_._4))
    // within every query's k, no fallback row ranks above an exact one
    out.groupBy(_._1).foreach { case (qid, rows) =>
      val ordered = rows.sortBy(r => (!r._4, -r._3, r._2))
      assert(ordered.map(_._4).dropWhile(identity).forall(!_),
        s"query $qid mixes fallback rows into the exact prefix")
    }
    // full-coverage refine flags every row refined=true
    val fullCov = Similarity.ivfTopKQuantizedRefined(q, dir, embs,
        "vec_id", "embedding", k = 5, nprobe = 8,
        refineFactor = embs.count().toInt / 5 + 1)
      .collect().map(_.getBoolean(3))
    assert(fullCov.nonEmpty && fullCov.forall(identity))
  }

  test("legacy quantized version without marker: schema sniff migrates it; appends still quantize") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfql").toString
    val cents = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
    val half1 = embs.filter(col("vec_id") % 2 === 0)
    val half2 = embs.filter(col("vec_id") % 2 =!= 0)
    Similarity.saveIvfIndexQuantized(half1, "vec_id", "embedding", dir,
      nlist = 8, centroids = Some(cents))
    // simulate a pre-marker release's index: delete the flavor marker
    val marker = new java.io.File(s"$dir/v1/_QUANTIZED")
    assert(marker.delete(), "fixture must start marker-less")
    // the append must NOT land float rows on the SQ8 corpus — the sniff
    // recognizes _cq, migrates the marker, and quantizes the delivery
    Similarity.appendIvfIndex(half2, "vec_id", "embedding", dir, Some("b1"))
    assert(marker.exists(), "read-repair must restore the marker")
    val q = embs.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fullDir = java.nio.file.Files.createTempDirectory("graft_ivfqf").toString
    Similarity.saveIvfIndexQuantized(embs, "vec_id", "embedding", fullDir,
      nlist = 8, centroids = Some(cents))
    assert(pairs(Similarity.ivfTopKQuantized(q, dir, "vec_id", "embedding", 5, 3))
      === pairs(Similarity.ivfTopKQuantized(q, fullDir, "vec_id", "embedding", 5, 3)),
      "legacy append-grown index must serve the full-save result")
  }

  test("empty-seeded quantized index: marker (not schema) records the flavor, appends quantize") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfqe").toString
    val cents = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
      .localCheckpoint(true)
    // zero rows + external centroids: no readable corpus schema — the
    // case where schema inference would misread the index as float and a
    // committed float delta would brick every later quantized read
    Similarity.saveIvfIndexQuantized(embs.limit(0), "vec_id", "embedding",
      dir, nlist = 8, centroids = Some(cents))
    Similarity.appendIvfIndex(embs, "vec_id", "embedding", dir, Some("b0"))
    val fdir = java.nio.file.Files.createTempDirectory("graft_ivfqf").toString
    Similarity.saveIvfIndexQuantized(embs, "vec_id", "embedding", fdir,
      nlist = 8, centroids = Some(cents))
    val q = embs.filter(col("vec_id") < 50)
    def full(d: String) = Similarity.ivfTopKQuantized(q, d, "vec_id",
        "embedding", k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full(dir) === full(fdir),
      "grown-from-empty must serve exactly the full quantized save")
  }

  test("save paths honor retain: the previous committed version survives one rebuild, swept by the next") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfsret").toString
    def versions = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("v")).sorted.toSeq
    val vid = col("vec_id")
    Similarity.saveIvfIndex(embs.filter(vid % 2 === 0), "vec_id", "embedding",
      dir, nlist = 8)
    // rebuild with retain=1: the version a concurrent query batch may
    // still be scanning survives until the NEXT save
    Similarity.saveIvfIndex(embs, "vec_id", "embedding", dir, nlist = 8,
      retain = 1)
    assert(versions === Seq("v1", "v2"), s"retain=1 must keep v1: $versions")
    // serving resolves the newest committed version
    val q = embs.filter(vid % 37 === 0)
    val v2Rows = Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding", 5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Similarity.ivfCentroids(spark, dir).localCheckpoint(true)
    val live = Similarity.ivfTopK(q, embs, cents, "vec_id", "embedding", 5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(v2Rows === live, "serve-newest must hold with retained versions")
    Similarity.saveIvfIndex(embs, "vec_id", "embedding", dir, nlist = 8,
      retain = 1)
    assert(versions === Seq("v2", "v3"), s"next save must sweep v1: $versions")
    // quantized save path: same contract
    val qdir = java.nio.file.Files.createTempDirectory("graft_ivfqret").toString
    def qversions = new java.io.File(qdir).listFiles().map(_.getName)
      .filter(_.startsWith("v")).sorted.toSeq
    Similarity.saveIvfIndexQuantized(embs, "vec_id", "embedding", qdir, nlist = 8)
    Similarity.saveIvfIndexQuantized(embs, "vec_id", "embedding", qdir,
      nlist = 8, retain = 1)
    assert(qversions === Seq("v1", "v2"))
    Similarity.saveIvfIndexQuantized(embs, "vec_id", "embedding", qdir,
      nlist = 8, retain = 1)
    assert(qversions === Seq("v2", "v3"))
  }

  test("compaction retain=1 keeps exactly one previous committed version until the next fold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfret").toString
    val vid = col("vec_id")
    def versions = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("v")).sorted.toSeq
    Similarity.saveIvfIndex(embs.filter(vid % 3 === 0), "vec_id", "embedding",
      dir, nlist = 8)
    Similarity.appendIvfIndex(embs.filter(vid % 3 === 1), "vec_id", "embedding", dir)
    Similarity.compactIvfIndex(spark, dir, retain = 1)
    assert(versions === Seq("v1", "v2"),
      "the pre-fold version must survive for in-flight readers")
    // serving resolves the newest committed version regardless
    val q = embs.filter(vid % 37 === 0)
    val cents = Similarity.ivfCentroids(spark, dir).localCheckpoint(true)
    val grown = embs.filter(vid % 3 === 0).union(embs.filter(vid % 3 === 1))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding", 5, 3))
      === rows(Similarity.ivfTopK(q, grown, cents, "vec_id", "embedding", 5, 3)))
    // the next fold retains v2 and sweeps v1
    Similarity.appendIvfIndex(embs.filter(vid % 3 === 2), "vec_id", "embedding", dir)
    Similarity.compactIvfIndex(spark, dir, retain = 1)
    assert(versions === Seq("v2", "v3"))
  }

  test("k-means-trained centroids: deterministic, and recall not worse than the naive picker") {
    val q = embs.filter(col("vec_id") < 50)
    val naive = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
    val trained = Similarity.trainCentroids(embs, "embedding", 8)
    assert(trained.count() === 8)
    // deterministic under the fixed seed
    val again = Similarity.trainCentroids(embs, "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    trained.collect().foreach(r =>
      assert(again(r.getLong(0)) === r.getSeq[Float](1)))
    val exact = Similarity.cosineTopK(q, embs, "vec_id", "embedding", 5)
    def recall(cents: org.apache.spark.sql.DataFrame) =
      Similarity.recallAgainst(exact,
        Similarity.ivfTopK(q, embs, cents, "vec_id", "embedding", 5, 3), 5)
        .head.getDouble(1)
    val rNaive = recall(naive)
    val rTrained = recall(trained)
    assert(rTrained >= rNaive - 0.05,
      s"trained centroids recall $rTrained far below naive $rNaive")
  }

  test("blocked near-dup pairs equal brute-force all-pairs (exact, no collect)") {
    import spark.implicits._
    val got = Similarity.cosineNearDupPairs(embs, "vec_id", "embedding", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = embs.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, v, math.sqrt(Similarity.dotKernel(v, v))) }
    val brute = (for {
      (i, vi, ni) <- all; (j, vj, nj) <- all if i < j
      if Similarity.dotKernel(vi, vj) / (ni * nj) >= 0.35
    } yield (i, j)).toSet
    assert(brute.nonEmpty, "fixture should contain qualifying pairs")
    assert(got === brute, s"missed=${brute.diff(got)} spurious=${got.diff(brute)}")
    // explicit block counts partition identically
    val g4 = Similarity.cosineNearDupPairs(embs, "vec_id", "embedding", 0.35, numBlocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g4 === brute)
  }

  test("hyperplane-LSH near-dup recalls the full pair set on planted clusters") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val dim = 64
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(Similarity.dotKernel(v, v)).toFloat
      v.map(_ / n)
    }
    def randv() = unit(Array.fill(dim)(rng.nextGaussian().toFloat))
    // 20 clusters of 5 (intra-cos ≈ 0.97) over 200 background vectors
    val centers = Array.fill(20)(randv())
    val rows = centers.zipWithIndex.flatMap { case (c, k) =>
      (0 until 5).map { m =>
        val noisy = c.zip(Array.fill(dim)((rng.nextGaussian() * 0.02).toFloat))
          .map { case (a, b) => a + b }
        ((k * 5 + m).toLong, unit(noisy))
      }
    } ++ (0 until 200).map(i => ((100 + i).toLong, randv()))
    val df = rows.toSeq.toDF("vec_id", "embedding")
    val brute = (for {
      (i, vi) <- rows; (j, vj) <- rows if i < j
      if Similarity.dotKernel(vi, vj) >= 0.9
    } yield (i, j)).toSet
    assert(brute.size >= 100, s"fixture too sparse: ${brute.size}")
    val lsh = Similarity.lshNearDupPairs(df, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === brute, s"missed=${brute.diff(lsh)} spurious=${lsh.diff(brute)}")
  }

  test("zero-norm vectors are excluded from top-k and cell assignment, not ranked NaN-first") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0f, 1f)),
      (9L, Array(0f, 0f))) // zero-norm artifact
      .toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(rows.filter(col("vec_id") === 0),
      rows, "vec_id", "embedding", 2).collect()
    assert(top.map(_.getLong(1)).toSet === Set(1L, 2L),
      "the zero vector must not displace real neighbors")
    assert(top.forall(r => !r.getDouble(2).isNaN))
    val cells = Similarity.assignCells(rows,
      rows.filter(col("vec_id") < 2).select(col("vec_id").as("cell"),
        col("embedding").as("_cv")), "vec_id", "embedding", 1).collect()
    assert(!cells.map(_.getLong(0)).contains(9L),
      "zero vector gets no (arbitrary) IVF cell")
  }

  test("NaN-component and null rows are dropped, not ranked or crashed on") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0f, 1f)),
      (7L, Array(Float.NaN, 1f))) // NaN component → NaN norm
      .toDF("vec_id", "embedding")
      // a null-embedding row rides along (failed encode)
      .unionByName(Seq(8L).toDF("vec_id")
        .withColumn("embedding", lit(null).cast("array<float>")))
    val top = Similarity.cosineTopK(rows.filter(col("vec_id") === 0),
      rows, "vec_id", "embedding", 2).collect()
    assert(top.map(_.getLong(1)).toSet === Set(1L, 2L),
      "a NaN-norm corpus vector must not displace real neighbors")
    assert(top.forall(r => !r.getDouble(2).isNaN))
    // null text/id rows: kernels drop them like the column paths do
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
      .unionByName(Seq(3L).toDF("doc_id").withColumn("text", lit(null).cast("string")))
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 2, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    assert(Dedup.simhash(docs, "doc_id", "text").count() === 2)
    // assignCells: a NaN-norm vector must not claim a cell (Spark orders
    // NaN greatest, so a bare `> 0` norm filter would rank it into cell 0
    // and poison every query probing that cell)
    val cents = Similarity.trainCentroids(rows.filter(col("vec_id") < 3),
      "embedding", k = 2)
    val cells = Similarity.assignCells(rows, cents, "vec_id", "embedding", 1)
      .collect().map(_.getLong(0)).toSet
    assert(!cells.contains(7L) && !cells.contains(8L),
      "NaN/null-norm vectors must not be assigned to cells")
    // lshNearDupPairs: two NaN-component embeddings collide in every band
    // (identical all-zero sign bits) — the verify stage must NOT emit the
    // pair with a NaN cosine
    val nanPair = Seq((7L, Array(Float.NaN, 1f)), (9L, Array(Float.NaN, 2f)),
      (0L, Array(1f, 0f)), (1L, Array(0.99f, 0.14f)))
      .toDF("vec_id", "embedding")
    val lsh = Similarity.lshNearDupPairs(nanPair, "vec_id", "embedding",
      minCos = 0.9).collect()
    assert(lsh.forall(r => !r.getDouble(2).isNaN),
      "NaN cosine must never satisfy the >= minCos contract")
    assert(lsh.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 1L)))
  }

  test("trainCentroids ignores zero-norm vectors (no NaN-cosine cell collapse)") {
    import spark.implicits._
    val rows = (0L to 19L).map { i =>
      val a = if (i % 2 == 0) Array(1f + i / 20f, 0.1f * i) else Array(0.1f * i, 1f + i / 20f)
      (i, a)
    }.toDF("vec_id", "embedding")
      .unionByName((100L to 140L).map(i => (i, Array(0f, 0f))).toDF("vec_id", "embedding"))
      // NaN-component vector: Spark orders NaN > 0.0, so a bare norm > 0
      // filter would let it through and poison the k-means centroids
      .unionByName(Seq((200L, Array(Float.NaN, 1f))).toDF("vec_id", "embedding"))
    val cents = Similarity.trainCentroids(rows, "embedding", k = 2, seed = 7L)
    assert(cents.collect().forall(r =>
      r.getSeq[Float](1).forall(f => !f.isNaN)), "no NaN centroid")
    val assigned = Similarity.assignCells(rows, cents, "vec_id", "embedding", 1)
    val cellsUsed = assigned.select("cell").distinct().count()
    assert(cellsUsed === 2,
      "zero vectors dominating the sample must not collapse assignment to one cell")
  }

  test("cosineTopK fails fast when the query side exceeds the broadcast cap") {
    val q = embs.filter(col("vec_id") < 50)
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineTopK(q, embs, "vec_id", "embedding", 5, maxBroadcastQueries = 10)
    }
    assert(e.getMessage.contains("maxBroadcastQueries"))
  }

  test("connectedComponents: chains, merges, and survivor selection") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, singleton 20 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("i", "j")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    val corpus = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).map(i => (i, s"doc$i"))
      .toDF("doc_id", "text")
    val reps = Dedup.withRepresentatives(corpus, "doc_id", pairs)
    val survivors = reps.filter(col("doc_id") === col("rep_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(1L, 10L, 20L))
  }

  test("connectedComponentsStar ≡ label propagation on random graphs") {
    import spark.implicits._
    import scala.util.Random
    for (seed <- Seq(5, 19, 77)) {
      val rnd = new Random(seed)
      val n = 60
      // random sparse graph + a planted chain and a planted clique
      val randomEdges = (0 until 70).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(p => p._1 != p._2)
      val chain = (100L to 120L).sliding(2).map(s => (s(0), s(1))).toSeq
      val clique = for (a <- 200L to 204L; b <- 200L until a) yield (a, b)
      val pairs = (randomEdges ++ chain ++ clique).toDF("i", "j")
      def asMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // both solvers, under BOTH the driver union-find cutover (default,
      // graph is far below the bound) and the forced distributed loops
      val star = asMap(Dedup.connectedComponentsStar(pairs))
      val label = asMap(Dedup.connectedComponents(pairs))
      assert(star === label, s"seed=$seed")
      spark.conf.set("spark.graft.cc.driverMaxEdges", "0")
      try {
        assert(asMap(Dedup.connectedComponentsStar(pairs)) === star,
          s"seed=$seed: distributed star must equal the driver cutover")
        assert(asMap(Dedup.connectedComponents(pairs)) === label,
          s"seed=$seed: distributed label-prop must equal the driver cutover")
      } finally spark.conf.unset("spark.graft.cc.driverMaxEdges")
    }
  }

  test("connectedComponentsStar converges in O(log n) rounds on a chain beyond label-prop reach") {
    import spark.implicits._
    // a 400-node chain: label propagation needs ~400 rounds (fails loudly
    // at maxIter=15); star contraction closes it in ≤15
    val chain = (0L until 400L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("i", "j")
    // force the DISTRIBUTED loops: the round-cap semantics under test are
    // the above-the-bound tier (the driver cutover solves any chain)
    spark.conf.set("spark.graft.cc.driverMaxEdges", "0")
    try {
      intercept[IllegalArgumentException] {
        Dedup.connectedComponents(chain, maxIter = 15)
      }
      val comp = Dedup.connectedComponentsStar(chain, maxIter = 15).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comp.size === 400 && comp.values.forall(_ == 0L))
      // the tiered withRepresentatives path takes the same chain end-to-end:
      // label propagation blows its round cap, star contraction finishes
      import spark.implicits._
      val corpus = (0L until 400L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
      val reps = Dedup.withRepresentatives(corpus, "doc_id", chain)
        .filter(col("doc_id") === col("rep_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(reps === Set(0L))
    } finally spark.conf.unset("spark.graft.cc.driverMaxEdges")
  }

  test("cosine is symmetric, 1 on self, deterministic") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(3f, 2f, 1f)))
      .toDF("id", "v")
    val c = df.as("a").crossJoin(df.as("b"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(c((1L, 1L)) - 1.0) < 1e-12)
    assert(c((1L, 2L)) === c((2L, 1L)))
    assert(math.abs(c((1L, 2L)) - 10.0 / 14.0) < 1e-12)
  }

  test("native DotProduct expression: bit-identical to HOF and kernel, codegen'd") {
    import spark.implicits._
    val df = embs.limit(200).select(col("vec_id"),
      Similarity.dot(col("embedding"), col("embedding")).as("hof"),
      Similarity.dotNative(col("embedding"), col("embedding")).as("native"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"vec ${r.getLong(0)}")
    }
    val kernelCheck = embs.limit(50).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val nativeVals = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    kernelCheck.foreach { case (id, v) =>
      assert(java.lang.Double.doubleToLongBits(Similarity.dotKernel(v, v)) ===
        java.lang.Double.doubleToLongBits(nativeVals(id)))
    }
    // the native expression stays inside whole-stage codegen (the HOF column
    // above would break codegen for the shared projection, so check alone)
    val nativeOnly = embs.select(
      Similarity.dotNative(col("embedding"), col("embedding")).as("native"))
    val plan = nativeOnly.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"native-only projection must codegen:\n$plan")
  }

  test("DotProduct null semantics equal the HOF form: length mismatch and null element → NULL") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(Some(1f), Some(2f)), Seq(Some(3f), Some(4f))),   // normal
      (2L, Seq(Some(1f), Some(2f)), Seq(Some(3f))),             // length mismatch
      (3L, Seq(Some(1f), None), Seq(Some(3f), Some(4f)))        // null element
    ).toDF("id", "a", "b")
      .withColumn("a", col("a").cast("array<float>"))
      .withColumn("b", col("b").cast("array<float>"))
    val out = df.select(col("id"),
        Similarity.dot(col("a"), col("b")).as("hof"),
        Similarity.dotNative(col("a"), col("b")).as("native"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L) === (Some(11.0), Some(11.0)))
    assert(out(2L)._1 === out(2L)._2, "mismatch must agree with HOF")
    assert(out(2L)._2 === None)
    assert(out(3L)._1 === out(3L)._2, "null element must agree with HOF")
    assert(out(3L)._2 === None)
  }

  test("winnowing sketch: deterministic, shift-invariant overlap for shared content") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "PREFIX PREFIX " + a // same content, shifted
    val sa = TextStats.winnow(a, 8, 4).toSet
    val sb = TextStats.winnow(b, 8, 4).toSet
    assert(TextStats.winnow(a, 8, 4) === TextStats.winnow(a, 8, 4))
    val overlap = sa.intersect(sb).size.toDouble / sa.size
    assert(overlap > 0.8, s"shared-content overlap $overlap too low")
    assert(TextStats.winnow("ab", 8, 4).isEmpty, "short text yields empty sketch")
  }

  test("multimodal resize and frame-sample: deterministic shapes, bounded memory plumbing") {
    val media = Multimodal.withBinaryPayload(docs.limit(10), "doc_id", "text")
    val resized = Multimodal.resize(media, 8, 4).collect()
    assert(resized.length === 10)
    assert(resized.forall(_.payload.length === 32))
    // deterministic: same input → same bytes
    val again = Multimodal.resize(media, 8, 4).collect()
      .map(r => r.doc_id -> r.payload.toSeq).toMap
    resized.foreach(r => assert(again(r.doc_id) === r.payload.toSeq))

    val frames = Multimodal.frameSample(media, frameBytes = 16, everyN = 2).collect()
    val texts = docs.limit(10).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    frames.groupBy(_.doc_id).foreach { case (id, fs) =>
      val bytes = texts(id).getBytes("UTF-8")
      assert(fs.length === (bytes.length / 16 + 1) / 2)
      fs.foreach { f =>
        assert(f.offset === f.frame_idx * 16)
        assert(f.frame.toSeq === bytes.slice(f.offset.toInt, f.offset.toInt + 16).toSeq)
      }
    }
  }

  test("dHash payload dedup: near-identical payloads pair and cluster, distinct payloads stay apart") {
    import spark.implicits._
    // 130 ascii bytes → samples at even offsets 0,2,…,128; the tweak at
    // offset 70 lands ON sample 35, flipping at most bits 34/35 —
    // near-identical payloads must stay within the Hamming-3 floor
    val base = (0 until 130).map(i => ('a' + i % 26).toChar).mkString
    val tweaked = base.updated(70, 'z')
    val other = (0 until 130).map(i => ('A' + (i * 7) % 26).toChar).mkString
    val fix = Seq(1L -> base, 2L -> tweaked, 3L -> other, 4L -> base)
      .toDF("doc_id", "text")
    val media = Multimodal.withBinaryPayload(fix, "doc_id", "text")
    val pairs = Multimodal.dHashPairs(media, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys === Set((1L, 2L), (1L, 4L), (2L, 4L)),
      s"near-identical trio pairs, unrelated payload does not: $pairs")
    assert(pairs.collectFirst { case (1L, 4L, h) => h }.contains(0L),
      "byte-identical payloads are Hamming 0 (the collapse-before-band path)")
    assert(pairs.collectFirst { case (1L, 2L, h) => h }.exists(_ <= 2L),
      "a one-byte tweak moves at most two adjacent-comparison bits")
    // clustering through the shared CC machinery: one 3-member cluster
    val clusters = Multimodal.dHashClusters(media, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clusters === Set((1L, 3L)))
    // real-table smoke: signatures are defined for every non-empty doc
    // (short docs sample with repeats rather than erroring)
    val sig = Multimodal.dHash(
      Multimodal.withBinaryPayload(docs, "doc_id", "text"))
    assert(sig.count() === docs.filter(col("text").isNotNull &&
      length(col("text")) >= 1).count())
  }

  test("frame-tier near-dup: a perturbed-copy video pairs by its shared frames; unrelated video stays apart") {
    import spark.implicits._
    // 4 frames of 64 bytes of SEEDED-RANDOM bytes: ramp-like fixtures
    // are adversarial here (near-monotone frames give mostly-1 bit
    // patterns whose mutual Hamming is tiny), random frames sit ~32
    // bits apart so only genuine copies pair
    val rndA = new scala.util.Random(42)
    val vidA = Array.fill[Byte](256)(rndA.nextInt(256).toByte)
    val vidB = { val b = vidA.clone(); b(130) = (b(130) ^ 0x7f).toByte; b } // frame 2
    val rndC = new scala.util.Random(7)
    val vidC = Array.fill[Byte](256)(rndC.nextInt(256).toByte)
    val media = Seq(1L -> vidA, 2L -> vidB, 3L -> vidC)
      .toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("raw").as("format")))
    val pairs = Multimodal.frameDupPairs(media, frameBytes = 64, everyN = 1,
        maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(pairs.map(p => (p._1, p._2)) === List((1L, 2L)),
      s"only the perturbed copy pairs: $pairs")
    // frames 0, 1, 3 are byte-identical (Hamming 0); the perturbed byte
    // sits in frame 2, which may or may not stay under the distance
    // floor — the SHARED-frame count is ≥ 3 either way
    assert(pairs.head._3 >= 3L, s"shared unperturbed frames: ${pairs.head}")
    val clusters = Multimodal.frameDupClusters(media, frameBytes = 64,
        everyN = 1, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clusters === Set((1L, 2L)))
    // minFrames floors the shared-segment mass
    assert(Multimodal.frameDupPairs(media, frameBytes = 64, everyN = 1,
      maxDist = 3, minFrames = 5L).count() === 0L)
    // the composite-frame-id contract is asserted, not silently corrupted
    val bad = Seq((1L << 40, vidA)).toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("raw").as("format")))
    val ex = intercept[Exception] {
      Multimodal.frameDupPairs(bad, 64, 1, 3).collect()
    }
    assert(ex.getMessage != null)
  }

  test("multimodal: stub extractor is deterministic and plumbing preserves bytes") {
    val media = Multimodal.withBinaryPayload(docs.limit(20), "doc_id", "text")
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length === 20)
    val texts = docs.limit(20).collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap
    feats.foreach { f =>
      val t = texts(f.doc_id)
      assert(f.n_bytes === t.getBytes("UTF-8").length.toLong)
      assert(f.first_byte === (t.getBytes("UTF-8")(0) & 0xff).toLong)
      assert(f.features sameElements Multimodal.extract(t.getBytes("UTF-8")))
    }
  }

  test("semDedup: within-cell pairs at the threshold, cross-cell near-pairs out of contract, min-id survivors, block-split invariance") {
    import spark.implicits._
    // two orthogonal coarse directions; cell 0 holds a three-member
    // near-dup chain plus one distinct vector, and ids 20/21 form a
    // near-identical pair the quantizer SPLITS across cells — SemDeDup's
    // defining approximation says that pair must NOT merge
    val vecs = Seq(
      1L  -> Array(1f, 0.10f, 0f, 0f),
      2L  -> Array(1f, 0.11f, 0f, 0f),
      4L  -> Array(1f, 0.12f, 0f, 0f),
      7L  -> Array(1f, -0.5f, 0f, 0f),   // cell 0, far from the chain
      20L -> Array(1f, 0.99f, 0f, 0f),   // cell 0 (1.00 > 0.99)
      21L -> Array(0.99f, 1f, 0f, 0f),   // cell 1 — cos(20,21) ≈ 0.99995
      30L -> Array(0f, 1f, 0f, 0f),      // cell 1, alone
      99L -> Array(0f, 0f, 0f, 0f)       // zero norm: unscorable, survives
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0f, 1f, 0f, 0f)
    ).toDF("cell", "_cv")
    val pairs = Similarity.semDedupPairs(vecs, cents, "vec_id", "embedding", 0.99)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (1L, 4L), (2L, 4L)),
      "only the within-cell chain pairs; the split 20/21 pair must be absent")
    val kept = Similarity.semDedup(vecs, cents, "vec_id", "embedding", 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 7L, 20L, 21L, 30L, 99L),
      "chain keeps min id; split pair and the unscorable vector all survive")
    // block-triangle split must not change the pair set (per-task memory
    // knob only): force many blocks per cell, and the tiny-block path
    val forced = Similarity.semDedupPairs(vecs, cents, "vec_id", "embedding",
        0.99, numBlocksPerCell = 3)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(forced === pairs)
    val tiny = Similarity.semDedupPairs(vecs, cents, "vec_id", "embedding",
        0.99, maxRowsPerBlock = 1)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tiny === pairs)
  }

  test("semDedup on the real embeddings: pairs are the cell-restricted subset of the global exact pairs") {
    val cents = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
    val semPairs = Similarity.semDedupPairs(embs, cents, "vec_id", "embedding", 0.35)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val global = Similarity.cosineNearDupPairs(embs, "vec_id", "embedding", 0.35)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cellOf = Similarity.assignCells(embs, cents, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(semPairs.nonEmpty, "corpus should hold same-cell near pairs at 0.35")
    assert(semPairs === global.filter { case (i, j) =>
        cellOf.get(i).exists(c => cellOf.get(j).contains(c)) },
      "semDedup pairs = global exact pairs restricted to shared cells")
    // survivors: input minus non-min component members, row count preserved
    val kept = Similarity.semDedup(embs, cents, "vec_id", "embedding", 0.35)
    assert(kept.columns.toSeq === embs.columns.toSeq, "original schema out")
    assert(kept.count() < embs.count(), "something must dedup at 0.35")
  }

  test("winnowSketch/winnowPairs: shared substrings pair, the " +
      "over-represented rule drops boilerplate, sketch ≡ the driver kernel") {
    val spark2 = spark
    import spark2.implicits._
    val shared = "identical long shared passage of text here"
    val boiler = "common boilerplate footer all docs carry"
    val fix = Seq(
      (1L, s"alpha $shared tail one $boiler"),
      (2L, s"beta prefix $shared different end $boiler"),
      (3L, s"completely unrelated content zed $boiler")) ++
      (4L to 12L).map(i => (i, s"filler doc number unique$i $boiler"))
    val df = fix.toDF("doc_id", "text")
    // the compiled kernel ≡ the reference kernel on 2000 randomized
    // strings (ORDER included — first-occurrence dedup, the ≤-window
    // single-min arm, sub-k empties, mixed case, unicode)
    locally {
      import org.apache.spark.unsafe.types.UTF8String
      val frags = Seq("the cat", "...", "ABCdef", "é中😀", " ", "",
        "repeat repeat repeat", "x", "1234567890", "shared passage here")
      val rnd = new scala.util.Random(41)
      (0 until 2000).foreach { _ =>
        val s = (0 until rnd.nextInt(6))
          .map(_ => frags(rnd.nextInt(frags.length))).mkString(" ")
        val k = 1 + rnd.nextInt(9)
        val win = 1 + rnd.nextInt(6)
        val got = graft.expressions.WinnowSketchExpr
          .compute(UTF8String.fromString(s), k, win)
        assert(got.toLongArray().toSeq === TextStats.winnow(s, k, win),
          s"on <$s> k=$k w=$win")
      }
    }
    // the sketch column ≡ the property-tested driver kernel, per doc
    val viaCol = Dedup.winnowSketch(df, "doc_id", "text", 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    fix.foreach { case (id, t) =>
      assert(viaCol.getOrElse(id, Set.empty[Long]) ===
        TextStats.winnow(t, 8, 4).toSet, s"sketch of doc $id")
    }
    // (1, 2) share a 43-char passage (≥ k + window − 1 ⇒ guaranteed
    // shared fingerprints); the boilerplate is in 12 docs > maxBucket 8
    // so its fingerprints drop — doc 3 (boilerplate-only overlap)
    // pairs with nobody
    val pairs = Dedup.winnowPairs(df, "doc_id", "text", 8, 4,
        minShared = 2L, maxBucket = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "the shared-passage pair must survive")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "boilerplate-only overlap must not pair")
    // without the cap the boilerplate pairs everything with everything
    val uncapped = Dedup.winnowPairs(df, "doc_id", "text", 8, 4,
      minShared = 2L, maxBucket = 1000000L).count()
    assert(uncapped > pairs.size.toLong, "the cap must prune pairs")
    // sub-k text sketches to no rows
    assert(Dedup.winnowSketch(Seq((9L, "tiny")).toDF("doc_id", "text"),
      "doc_id", "text", 8, 4).count() === 0L)
    intercept[IllegalArgumentException] {
      Dedup.winnowPairs(df, "doc_id", "text", 8, 4, minShared = 0L)
    }
  }

  test("kmeansLloyd hand golden: assignment, half-away means, empty-cell carry") {
    import spark.implicits._
    // 1-D micro view: seeds at 0.0 and 1.0; points 0.1, 0.2, 0.9 → cell 0
    // gets {0.1, 0.2} (mean 150000), cell 1 gets {0.9} (mean 900000)
    val vecs = Seq(Array(0.1f), Array(0.2f), Array(0.9f)).toDF("v")
    val seeds = Seq((0L, Array(0.0f)), (1L, Array(1.0f))).toDF("cell", "_cv")
    val out = Similarity.kmeansLloyd(vecs, "v", seeds, iters = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sortBy(x => (x._1, x._2))
    assert(out.toSeq === Seq((0L, 0, 150000L, 2L), (1L, 0, 900000L, 1L)))
    // second iteration re-assigns against the new centroids (0.15/0.9):
    // same partition here, so convergence — centroids unchanged
    val out2 = Similarity.kmeansLloyd(vecs, "v", seeds, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(out2.toSeq === Seq((0L, 150000L), (1L, 900000L)))
    // distance tie → LOWEST cell id: point 0.5 equidistant from 0 and 1
    val tie = Similarity.kmeansLloyd(Seq(Array(0.5f)).toDF("v"), "v",
        seeds, iters = 1).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(tie.toSeq === Seq((0L, 500000L, 1L), (1L, 1000000L, 0L)),
      "tie must assign to cell 0 and leave empty cell 1's seed centroid")
    // half-AWAY mean on a negative sum: {-0.1, -0.2} → -150000 (HALF_UP
    // away from zero, not toward)
    val neg = Similarity.kmeansLloyd(
        Seq(Array(-0.1f), Array(-0.2f)).toDF("v"), "v",
        Seq((0L, Array(0.0f))).toDF("cell", "_cv"), iters = 1)
      .collect().map(_.getLong(2))
    assert(neg.toSeq === Seq(-150000L))
  }

  test("kmeansAssign: argmin vs trained centroids, count consistency, tie rule") {
    import spark.implicits._
    val seeds = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
    val cent = Similarity.kmeansLloyd(embs, "embedding", seeds, iters = 3)
    // assigning against the FINAL centroids with the trainer's own
    // argmin reproduces the trainer's reported counts after one more
    // no-op iteration (iters+1 from the same seeds ends on the same
    // assignment step kmeansAssign replays)
    val assignCounts = Similarity
      .kmeansAssign(embs, "vec_id", "embedding", cent)
      .groupBy("cell").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val trainerCounts = Similarity
      .kmeansLloyd(embs, "embedding", seeds, iters = 4)
      .filter(col("j") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(trainerCounts.forall { case (c, n) =>
      assignCounts.getOrElse(c, 0L) == n })
    // tie → lowest cell; wrong-dimension rows drop
    val toyCent = Seq((0L, 0, 0L), (1L, 0, 1000000L))
      .toDF("cell", "j", "c_micro")
    val toy = Seq((10L, Array(0.5f)), (11L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "v")
    val got = Similarity.kmeansAssign(toy, "vec_id", "v", toyCent)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((10L, 0L)))
  }

  test("kmeansLloyd is partitioning-invariant and matches on the corpus") {
    val seeds = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansLloyd(df, "embedding", seeds, iters = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3))).toSet
    val a = run(embs)
    val b = run(embs.repartition(7))
    assert(a === b && a.nonEmpty,
      "integer sums are exact in any order — repartitioning must not move a bit")
  }
}
