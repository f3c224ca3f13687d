package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** BPE tokenizer tier: merge-pass kernel, hand-computed training goldens
  * (including the deterministic tie-break), encode ≡ training state, and
  * the stop-early / degenerate contracts. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = Tables.documents(spark, TestSpark.sfDir)
  import spark.implicits._

  test("applyMerge: left-to-right non-overlapping single pass") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a") ===
      Seq("aa", "aa"))
    assert(Bpe.applyMerge(Seq("b", "a", "a"), "a", "a") === Seq("b", "aa"))
    // a merged symbol never re-merges within the same pass
    assert(Bpe.applyMerge(Seq("a", "b", "b"), "a", "b") === Seq("ab", "b"))
    assert(Bpe.applyMerge(Seq("x"), "a", "b") === Seq("x"))
    assert(Bpe.applyMerge(Seq.empty, "a", "b") === Seq.empty)
  }

  test("train: hand-computed 6-merge golden with count and string tie-breaks") {
    val fix = Seq(1L -> "the cat sat", 2L -> "the cat", 3L -> "that hat")
      .toDF("doc_id", "text")
    // word freqs: the 2, cat 2, sat 1, that 1, hat 1
    // pair counts round 1: at 5, th 3, he 2, ca 2, ha 2, sa 1 → (a,t)
    // round 3 ties (c,at) with (th,e) at 2 — 'c' < 'th' wins
    // round 5 ties (h,at)/(s,at)/(th,at) at 1 — 'h' < 's' < 'th'
    val out = Bpe.train(fix, "doc_id", "text", 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out === Seq(
      (1, "a", "t", 5L), (2, "t", "h", 3L), (3, "c", "at", 2L),
      (4, "th", "e", 2L), (5, "h", "at", 1L), (6, "s", "at", 1L)))
  }

  test("train: stops early when no pair reaches minPairCount") {
    val fix = Seq(1L -> "ab ab").toDF("doc_id", "text")
    val out = Bpe.train(fix, "doc_id", "text", 5).collect()
    // after (a,b) every word is one symbol — no pairs remain
    assert(out.length === 1)
    assert((out(0).getString(1), out(0).getString(2), out(0).getLong(3)) ===
      (("a", "b", 2L)))
    val floored = Bpe.train(Seq(1L -> "ab cd").toDF("doc_id", "text"),
      "doc_id", "text", 5, minPairCount = 2L).collect()
    assert(floored.isEmpty, "all pairs below the floor → empty merge table")
  }

  test("encode: in-vocab words reproduce training state; unseen words encode correctly") {
    val fix = Seq(1L -> "the cat sat", 2L -> "the cat", 3L -> "that hat")
      .toDF("doc_id", "text")
    val merges = Bpe.train(fix, "doc_id", "text", 6)
    // after 6 merges: the→[the], cat→[cat], sat→[sat], that→[th,at],
    // hat→[hat] (merge 5 = (h,at))
    val enc = Bpe.encode(fix, "doc_id", "text", merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(enc(1L)._1 === 3L) // the cat sat
    assert(enc(2L)._1 === 2L)
    assert(enc(3L)._1 === 3L) // th at hat
    // an UNSEEN word rides the same merges: cats → c,a,t,s → (a,t) →
    // c,at,s → (c,at) → cat,s
    val novel = Bpe.encode(Seq(9L -> "cats").toDF("doc_id", "text"),
      "doc_id", "text", merges).collect()(0)
    assert(novel.getLong(1) === 2L)
    // fingerprint = md5 of the space-joined token stream
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("cat s".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(novel.getString(2) === md)
  }

  test("encode: token-less documents keep a (0, md5('')) row") {
    val merges = Bpe.train(Seq(1L -> "ab").toDF("doc_id", "text"),
      "doc_id", "text", 1)
    val out = Bpe.encode(Seq(1L -> "", 2L -> " ").toDF("doc_id", "text"),
      "doc_id", "text", merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert(out(1L) === ((0L, emptyMd5)))
    assert(out(2L) === ((0L, emptyMd5)))
  }

  test("train and encode are partition-invariant (cluster-layout independence)") {
    val merges = Bpe.train(docs, "doc_id", "text", 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val merges7 = Bpe.train(docs.repartition(7), "doc_id", "text", 4)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(merges === merges7,
      "pair counts are aggregates and the argmax tie-break is total — " +
        "the merge table must not depend on partitioning")
    val m = Bpe.train(docs, "doc_id", "text", 4)
    val enc = Bpe.encode(docs, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val enc7 = Bpe.encode(docs.repartition(7), "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(enc === enc7)
  }

  // --- batched training ≡ the sequential loop (the production-vocab
  // scale path; selection exactness is the whole contract) ---

  private def table(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    .sortBy(_._1).toSeq

  test("batched train: reproduces the 6-merge golden (both tie-break axes)") {
    val fix = Seq(1L -> "the cat sat", 2L -> "the cat", 3L -> "that hat")
      .toDF("doc_id", "text")
    assert(table(Bpe.train(fix, "doc_id", "text", 6, maxBatch = 8,
        driverTypeCap = 0L)) ===
      table(Bpe.train(fix, "doc_id", "text", 6, driverTypeCap = 0L)))
  }

  test("batched train: self-pair cuts the batch (created pairs outrank the tail)") {
    // (a,a):200 dominates; merging it creates (aa,a):100 which MUST win
    // round 2 over (c,d):50 — a batch that pre-committed (c,d) alongside
    // (a,a) would order the table wrong
    val fix = Seq(1L -> (("aaa " * 100) + ("cd " * 50)).trim)
      .toDF("doc_id", "text")
    val seq = table(Bpe.train(fix, "doc_id", "text", 3, driverTypeCap = 0L))
    assert(seq.map(m => (m._2, m._3, m._4)) ===
      Seq(("a", "a", 200L), ("aa", "a", 100L), ("c", "d", 50L)))
    assert(table(Bpe.train(fix, "doc_id", "text", 3, maxBatch = 8,
      driverTypeCap = 0L)) === seq)
    assert(table(Bpe.train(fix, "doc_id", "text", 3)) === seq,
      "kernel path must agree on the self-pair corpus")
  }

  test("batched train: conflict cut + strict truncation at a count tie") {
    // pairs (a,b):120, (x,a):120, (c,d):90 — (x,a) conflicts with (a,b)
    // at the SAME count, so the batch must shrink to the argmax alone;
    // merging (a,b) creates (x,ab):120 which outranks (c,d)
    val fix = Seq(1L -> (("xab " * 120) + ("cd " * 90)).trim)
      .toDF("doc_id", "text")
    val seq = table(Bpe.train(fix, "doc_id", "text", 3, driverTypeCap = 0L))
    assert(seq.map(m => (m._2, m._3, m._4)) ===
      Seq(("a", "b", 120L), ("x", "ab", 120L), ("c", "d", 90L)))
    assert(table(Bpe.train(fix, "doc_id", "text", 3, maxBatch = 8,
      driverTypeCap = 0L)) === seq)
    assert(table(Bpe.train(fix, "doc_id", "text", 3)) === seq,
      "kernel path must agree on the conflict-cut corpus")
  }

  test("batched train: randomized corpora over a tiny alphabet match the sequential loop") {
    // 4-letter alphabet × short words ⇒ dense self-pairs, conflicts, and
    // exact count ties — the regimes where naive batching diverges
    val rnd = new scala.util.Random(20260815L)
    (1 to 4).foreach { trial =>
      val words = Seq.fill(160) {
        val len = 1 + rnd.nextInt(6)
        (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      }
      val fix = Seq(1L -> words.mkString(" ")).toDF("doc_id", "text")
      val seq = table(Bpe.train(fix, "doc_id", "text", 12, driverTypeCap = 0L))
      val bat = table(Bpe.train(fix, "doc_id", "text", 12, maxBatch = 16,
        driverTypeCap = 0L))
      assert(bat === seq, s"trial $trial: batched diverged from sequential")
      val ker = table(Bpe.train(fix, "doc_id", "text", 12))
      assert(ker === seq, s"trial $trial: kernel diverged from sequential")
    }
  }

  test("batched train: real-corpus merge table is identical at maxBatch 64") {
    assert(table(Bpe.train(docs, "doc_id", "text", 10, maxBatch = 64,
        driverTypeCap = 0L)) ===
      table(Bpe.train(docs, "doc_id", "text", 10, driverTypeCap = 0L)))
  }

  test("kernel train: real-corpus merge table is identical to the distributed loop") {
    assert(table(Bpe.train(docs, "doc_id", "text", 10)) ===
      table(Bpe.train(docs, "doc_id", "text", 10, driverTypeCap = 0L)))
  }

  test("corpus: encode emits one row per doc; subword count ≤ character count") {
    val merges = Bpe.train(docs, "doc_id", "text", 4)
    assert(merges.count() === 4L)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
    assert(enc.count() === docs.count())
    val joined = enc.join(docs.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars")), "doc_id")
    assert(joined.filter(col("n_bpe_tokens") > col("n_chars")).count() === 0L)
  }
}
