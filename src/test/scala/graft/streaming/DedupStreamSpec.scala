package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.llm.Dedup

/** Ingest-time near-duplicate dedup: the checkpointed poller must equal
  * the batch pipeline ([[graft.llm.Dedup.minhashRepresentatives]]) on
  * bridge-free corpora regardless of how arrival chunks the data, stay
  * idempotent under re-polls and micro-batch replays, and pin the one
  * documented deviation (no cross-batch cluster merges).
  *
  * All hashing is deterministic (FNV/mixed minhash, no RNG), so banding
  * outcomes — and with them every assertion here — are fixed by the
  * fixture texts, not by luck.
  */
class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 8 bands of r = 2: at the fixture's within-cluster Jaccard (≈ 0.86)
  // banding recall is ~1 − 3e-6 per pair, and any cross-cluster banding
  // false positive is rejected by exact-Jaccard verification — so every
  // assertion below is structurally solid, not banding-lucky. (All
  // hashing is seeded; a given fixture is deterministic either way.)
  private val p = DedupStream.Params(n = 3, numHashes = 16, bands = 8,
    minJaccard = 0.8)

  /** A cluster member: 42 cluster-tagged words, variant k ≠ 0 replaces
    * position 20 — every pair of members differs in exactly that one slot,
    * so all pairwise shingle Jaccards are 37/43 ≈ 0.86 (clique). Tags keep
    * different clusters at Jaccard 0. */
  private def member(tag: String, k: Int): String =
    (0 until 42).map { i =>
      if (i == 20 && k > 0) s"${tag}_var$k" else s"${tag}_w$i"
    }.mkString(" ")

  /** 16-doc corpus in 3 arrival chunks; ids increase with arrival so the
    * batch min-id rep equals the stream first-arrival rep. No
    * cross-cluster bridges → stream ≡ batch exactly. */
  private lazy val chunks: Seq[Seq[(Long, String)]] = Seq(
    Seq(
      1L -> member("a", 0), 2L -> member("a", 1), 3L -> member("a", 2),
      4L -> member("b", 0),
      5L -> "completely unrelated singleton text number five",
      6L -> "xy zz", // < n tokens: no shingles → always its own rep
      7L -> member("a", 0), // exact dup in-chunk
      8L -> "xy zz"), // tiny dup IN-batch: still its own rep (batch parity)
    Seq(
      11L -> member("a", 3), // near-dup cross-chunk
      12L -> member("a", 0), // exact dup cross-chunk
      13L -> member("b", 1),
      14L -> member("c", 0),
      15L -> "xy zz", // tiny dup cross-chunk: still its own rep
      16L -> "another unrelated singleton appears here"),
    Seq(
      21L -> member("c", 1),
      22L -> member("a", 4),
      23L -> "ab cd")) // distinct tiny doc: own rep

  private def allDocs = chunks.flatten

  private def writeChunk(dir: String, k: Int): Unit =
    chunks(k).toDF("doc_id", "text").write.parquet(s"$dir/chunk$k")

  private def batchExpected = Dedup.minhashRepresentatives(
      allDocs.toDF("doc_id", "text"), "doc_id", "text",
      p.n, p.numHashes, p.bands, p.minJaccard)
    .select("doc_id", "rep_id").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def streamed(work: String) =
    DedupStream.assignments(spark, work).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental polls ≡ batch on a bridge-free corpus; idempotent re-poll") {
    val base = java.nio.file.Files.createTempDirectory("graft_dstream").toString
    val landing = s"$base/landing"; val work = s"$base/work"
    new java.io.File(landing).mkdirs()
    (0 until 3).foreach { k =>
      writeChunk(landing, k)
      DedupStream.pollNearDedup(spark, landing, work, p)
    }
    val got = streamed(work)
    assert(got === batchExpected, "stream ≡ batch (doc_id, rep_id)")
    // sanity on the fixture's intent: the expected partition really has
    // the planted shape (a-clique under 1; every tiny "xy zz" copy its
    // own rep — the batch no-shingles semantics)
    assert(batchExpected === Set(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 11L -> 1L, 12L -> 1L, 22L -> 1L,
      4L -> 4L, 13L -> 4L,
      5L -> 5L, 6L -> 6L, 8L -> 8L, 15L -> 15L, 16L -> 16L,
      14L -> 14L, 21L -> 14L, 23L -> 23L))
    // re-poll with no new files: nothing changes
    DedupStream.pollNearDedup(spark, landing, work, p)
    assert(streamed(work) === got)
    // state growth contract: 13 distinct contents, stored once each —
    // EXCEPT the tiny "xy zz", whose cross-batch copy is a new cluster
    // (batch semantics) and re-stores under its own rep → 14 rows; the
    // bandable member("a", 0), delivered in ALL THREE batches, must
    // appear exactly once (popular-boilerplate re-delivery adds no state)
    val contents = spark.read.parquet(s"$work/contents/b0",
      s"$work/contents/b1", s"$work/contents/b2")
    assert(contents.count() === 14L)
    val a0hash = Seq(member("a", 0)).toDF("t")
      .select(sha2(col("t"), 256)).head().getString(0)
    assert(contents.filter(col("_ch") === a0hash).count() === 1L)
  }

  test("single poll over everything ≡ chunked polls (chunking-invariant)") {
    val base = java.nio.file.Files.createTempDirectory("graft_dstream1").toString
    val landing = s"$base/landing"; val work = s"$base/work"
    new java.io.File(landing).mkdirs()
    (0 until 3).foreach(writeChunk(landing, _))
    DedupStream.pollNearDedup(spark, landing, work, p)
    assert(streamed(work) === batchExpected)
  }

  test("micro-batch replay is bit-identical and blind to its own half-commit") {
    val base = java.nio.file.Files.createTempDirectory("graft_dstream2").toString
    val work = s"$base/work"
    val b0 = chunks(0).toDF("doc_id", "text")
    val b1 = chunks(1).toDF("doc_id", "text")
    DedupStream.processBatch(spark, b0, work, p, 0L)
    DedupStream.processBatch(spark, b1, work, p, 1L)
    val firstAssign = streamed(work)
    val firstContents = spark.read.parquet(s"$work/contents/b1")
      .collect().map(_.toString).sorted.toSeq
    // crash-replay of batch 1: state from b1 exists on disk, but the
    // replay must read only b0 state and overwrite b1 identically
    DedupStream.processBatch(spark, b1, work, p, 1L)
    assert(streamed(work) === firstAssign)
    val replayContents = spark.read.parquet(s"$work/contents/b1")
      .collect().map(_.toString).sorted.toSeq
    assert(replayContents === firstContents)
  }

  test("bridge contract: no cross-batch merge, min-rep rule, batch diverges") {
    // A and B: differ in positions 5 and 10 → Jaccard 34/46 ≈ 0.74 < 0.8
    // (distinct clusters). X matches A at position 5's replacement and B at
    // position 10's original → 1 word from each → Jaccard ≈ 0.86 to BOTH.
    def word(i: Int) = s"z_w$i"
    val a = (0 until 42).map(word).mkString(" ")
    val b = (0 until 42).map(i =>
      if (i == 5) "z_b5" else if (i == 10) "z_b10" else word(i)).mkString(" ")
    val x = (0 until 42).map(i =>
      if (i == 5) "z_b5" else word(i)).mkString(" ")
    val base = java.nio.file.Files.createTempDirectory("graft_dstream3").toString
    val work = s"$base/work"
    DedupStream.processBatch(spark, Seq(100L -> a, 200L -> b)
      .toDF("doc_id", "text"), work, p, 0L)
    DedupStream.processBatch(spark, Seq(300L -> x)
      .toDF("doc_id", "text"), work, p, 1L)
    // stream: A and B stay distinct clusters; X attaches to min rep (100)
    assert(streamed(work) === Set(100L -> 100L, 200L -> 200L, 300L -> 100L))
    // batch over the same corpus MERGES all three through the bridge — the
    // documented deviation this contract pins
    val batched = Dedup.minhashRepresentatives(
        Seq(100L -> a, 200L -> b, 300L -> x).toDF("doc_id", "text"),
        "doc_id", "text", p.n, p.numHashes, p.bands, p.minJaccard)
      .select("doc_id", "rep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batched === Set(100L -> 100L, 200L -> 100L, 300L -> 100L))
  }

  test("compaction folds state dirs into a snapshot; answers and state content unchanged") {
    val pc = p.copy(compactEvery = 2)
    val baseA = java.nio.file.Files.createTempDirectory("graft_dcomp_a").toString
    val baseB = java.nio.file.Files.createTempDirectory("graft_dcomp_b").toString
    val batches = chunks.map(_.toDF("doc_id", "text")) :+
      Seq(31L -> member("a", 5), 32L -> member("d", 0)).toDF("doc_id", "text")
    batches.zipWithIndex.foreach { case (b, i) =>
      DedupStream.processBatch(spark, b, s"$baseA/work", p, i.toLong) // never compacts
      DedupStream.processBatch(spark, b, s"$baseB/work", pc, i.toLong) // folds at 2
    }
    def dirNames(work: String, sub: String) =
      new java.io.File(s"$work/$sub").listFiles().map(_.getName)
        .filterNot(_.startsWith(".")).sorted.toSeq
    // batch 2 folded b0,b1 into snap1; b2, b3 arrived after
    Seq("contents", "index", "assign").foreach { sub =>
      assert(dirNames(s"$baseB/work", sub) === Seq("b2", "b3", "snap1"),
        s"$sub dirs after one fold")
    }
    // assignments identical to the never-compacted run
    assert(streamed(s"$baseB/work") === streamed(s"$baseA/work"))
    // full state tables identical as bags of rows
    def stateRows(work: String) = DedupStream.contents(spark, work)
      .collect().map(_.toString).sorted.toSeq
    assert(stateRows(s"$baseB/work") === stateRows(s"$baseA/work"))
  }

  test("crash-replay across a compaction is bit-identical") {
    val pc = p.copy(compactEvery = 2)
    val ref = java.nio.file.Files.createTempDirectory("graft_dcomp_ref").toString
    val crash = java.nio.file.Files.createTempDirectory("graft_dcomp_cr").toString
    val b0 = chunks(0).toDF("doc_id", "text")
    val b1 = chunks(1).toDF("doc_id", "text")
    val b2 = chunks(2).toDF("doc_id", "text")
    // reference run: batches 0,1,2 — batch 2 compacts then processes
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      DedupStream.processBatch(spark, b, ref, pc, i.toLong) }
    // crashed run: batch 2's first attempt dies AFTER compaction but
    // BEFORE its state writes; the replay re-enters processBatch(2)
    DedupStream.processBatch(spark, b0, crash, pc, 0L)
    DedupStream.processBatch(spark, b1, crash, pc, 1L)
    DedupStream.compactState(spark, crash, 2L) // the half-finished attempt
    DedupStream.processBatch(spark, b2, crash, pc, 2L) // replay
    assert(streamed(crash) === streamed(ref))
    def rows(work: String, sub: String) =
      spark.read.parquet(s"$work/$sub/snap1", s"$work/$sub/b2")
        .collect().map(_.toString).sorted.toSeq
    Seq("contents", "index", "assign").foreach { sub =>
      assert(rows(crash, sub) === rows(ref, sub), s"$sub state after replay")
    }
    // and a SECOND full replay of batch 2 (crash after state write,
    // before checkpoint commit) stays bit-identical
    DedupStream.processBatch(spark, b2, crash, pc, 2L)
    assert(streamed(crash) === streamed(ref))
    Seq("contents", "index", "assign").foreach { sub =>
      assert(rows(crash, sub) === rows(ref, sub), s"$sub state after second replay")
    }
  }

  test("dir count stays bounded over 50 polls (probe)") {
    val pc = p.copy(compactEvery = 4)
    val base = java.nio.file.Files.createTempDirectory("graft_dcomp50").toString
    val work = s"$base/work"
    var maxDirs = 0
    (0 until 50).foreach { i =>
      val docs = Seq(1000L + i * 2 -> member(s"t$i", 0),
        1001L + i * 2 -> member(s"t$i", 1)).toDF("doc_id", "text")
      DedupStream.processBatch(spark, docs, work, pc, i.toLong)
      val n = new java.io.File(s"$work/contents").listFiles()
        .count(f => !f.getName.startsWith("."))
      maxDirs = math.max(maxDirs, n)
    }
    // worst case right before a fold: compactEvery fresh b-dirs + 1 snapshot
    assert(maxDirs <= pc.compactEvery + 1, s"dir count grew to $maxDirs")
    // every pair still clustered right through all the folds
    val got = streamed(work)
    assert(got.size === 100)
    (0 until 50).foreach { i =>
      assert(got.contains(1000L + i * 2 -> (1000L + i * 2)))
      assert(got.contains(1001L + i * 2 -> (1000L + i * 2)))
    }
  }

  test("repairMerges: stream + repair ≡ batch on a bridge-heavy corpus") {
    // three bridge chains, delivered so every merge is cross-batch:
    // chain k: A_k ↔ B_k distinct clusters until bridge X_k arrives later
    def word(c: String, i: Int) = s"${c}_w$i"
    def aDoc(c: String) = (0 until 42).map(word(c, _)).mkString(" ")
    def bDoc(c: String) = (0 until 42).map(i =>
      if (i == 5) s"${c}_b5" else if (i == 10) s"${c}_b10" else word(c, i))
      .mkString(" ")
    def xDoc(c: String) = (0 until 42).map(i =>
      if (i == 5) s"${c}_b5" else word(c, i)).mkString(" ")
    val corpus = Seq(
      100L -> aDoc("u"), 200L -> bDoc("u"),
      300L -> aDoc("v"), 400L -> bDoc("v"),
      500L -> "lone singleton document here",
      600L -> "xy zz",
      // batch 2: bridges for u and v, plus fresh cluster w
      700L -> xDoc("u"), 750L -> xDoc("v"), 800L -> aDoc("w"),
      900L -> "xy zz", // tiny cross-batch copy: stays own rep through repair
      // batch 3: bridge for w arrives as TWO exact copies
      1000L -> bDoc("w"), 1100L -> xDoc("w"), 1200L -> xDoc("w"))
    val batches = Seq(corpus.take(6), corpus.slice(6, 10), corpus.drop(10))
    val base = java.nio.file.Files.createTempDirectory("graft_drepair").toString
    val work = s"$base/work"
    batches.zipWithIndex.foreach { case (b, i) =>
      DedupStream.processBatch(spark, b.toDF("doc_id", "text"), work, p, i.toLong) }
    val batchWant = Dedup.minhashRepresentatives(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        p.n, p.numHashes, p.bands, p.minJaccard)
      .select("doc_id", "rep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // pre-repair: bridges did NOT merge (the documented deviation)
    val pre = streamed(work)
    assert(pre !== batchWant)
    assert(pre.contains(200L -> 200L) && pre.contains(400L -> 400L))
    DedupStream.repairMerges(spark, work, p)
    assert(streamed(work) === batchWant, "stream + repair ≡ batch")
    // the merged reps really collapsed the chains
    assert(batchWant.contains(200L -> 100L) && batchWant.contains(400L -> 300L)
      && batchWant.contains(1000L -> 800L) && batchWant.contains(1200L -> 800L))
    // tiny docs stayed their own reps through the repair
    assert(streamed(work).contains(600L -> 600L))
    assert(streamed(work).contains(900L -> 900L))
    // idempotent: a second repair changes nothing
    DedupStream.repairMerges(spark, work, p)
    assert(streamed(work) === batchWant)
    // and the stream CONTINUES correctly on repaired state: an exact copy
    // of a merged-away doc attaches to the component's final rep
    DedupStream.processBatch(spark, Seq(1300L -> bDoc("u"))
      .toDF("doc_id", "text"), work, p, 3L)
    assert(streamed(work).contains(1300L -> 100L))
  }

  test("repairMerges folds only checkpoint-committed batches, sparing a crashed half-commit") {
    val base = java.nio.file.Files.createTempDirectory("graft_drepair_fr").toString
    val landing = s"$base/landing"; val work = s"$base/work"
    new java.io.File(landing).mkdirs()
    (0 until 2).foreach { k =>
      writeChunk(landing, k)
      DedupStream.pollNearDedup(spark, landing, work, p)
    }
    val committed = streamed(work)
    // simulate a poller killed mid-batch: state dirs written for a batch
    // id the checkpoint never committed (commits cover batches 0 and 1)
    Seq("contents", "index", "assign").foreach { sub =>
      spark.read.parquet(s"$work/$sub/b0").limit(0)
        .write.parquet(s"$work/$sub/b5")
    }
    DedupStream.repairMerges(spark, work, p)
    // the repaired snapshot stops at the committed frontier and the
    // uncommitted half-commit SURVIVES for its replay to overwrite
    Seq("contents", "index", "assign").foreach { sub =>
      val names = new java.io.File(s"$work/$sub").listFiles()
        .map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq
      assert(names.contains("b5"), s"$sub: uncommitted dir must survive repair")
      assert(!names.exists(n => n.startsWith("snap5")),
        s"$sub: snapshot must not reach the uncommitted id: $names")
    }
    assert(streamed(work) === committed)
    // the replay (the next poll re-delivers batch 2 as the stream's own
    // id) still reads complete state and lands correctly
    writeChunk(landing, 2)
    DedupStream.pollNearDedup(spark, landing, work, p)
    assert(streamed(work).size === allDocs.length)
  }

  test("repairMerges adopts a later-arriving smaller doc id as rep, like batch") {
    val base = java.nio.file.Files.createTempDirectory("graft_drepair2").toString
    val work = s"$base/work"
    val big = member("m", 0)
    DedupStream.processBatch(spark, Seq(900L -> big).toDF("doc_id", "text"),
      work, p, 0L)
    DedupStream.processBatch(spark, Seq(50L -> big).toDF("doc_id", "text"),
      work, p, 1L)
    // stream keeps the first-arrival rep; batch would pick min id 50
    assert(streamed(work) === Set(900L -> 900L, 50L -> 900L))
    DedupStream.repairMerges(spark, work, p)
    assert(streamed(work) === Set(900L -> 50L, 50L -> 50L))
  }

  test("repairMerges composes with compaction state (snapshots + batch dirs)") {
    val pc = p.copy(compactEvery = 2)
    val base = java.nio.file.Files.createTempDirectory("graft_drepair3").toString
    val work = s"$base/work"
    def word(i: Int) = s"r_w$i"
    val a = (0 until 42).map(word).mkString(" ")
    val b = (0 until 42).map(i =>
      if (i == 5) "r_b5" else if (i == 10) "r_b10" else word(i)).mkString(" ")
    val x = (0 until 42).map(i => if (i == 5) "r_b5" else word(i)).mkString(" ")
    val all = Seq(10L -> a, 20L -> b, 30L -> member("z", 0), 40L -> x)
    // 3 batches → batch 2 compacts b0,b1 into snap1, then bridge lands in b2
    DedupStream.processBatch(spark, all.take(2).toDF("doc_id", "text"), work, pc, 0L)
    DedupStream.processBatch(spark, Seq(all(2)).toDF("doc_id", "text"), work, pc, 1L)
    DedupStream.processBatch(spark, Seq(all(3)).toDF("doc_id", "text"), work, pc, 2L)
    DedupStream.repairMerges(spark, work, pc)
    val want = Dedup.minhashRepresentatives(all.toDF("doc_id", "text"),
        "doc_id", "text", p.n, p.numHashes, p.bands, p.minJaccard)
      .select("doc_id", "rep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed(work) === want)
    assert(want.contains(20L -> 10L), "bridge must have merged")
  }

  test("later exact copies of a bridge doc resolve to the rep its docs got") {
    // bridge X (assigned rep 100 above) re-delivered exactly: the state
    // append under the FINAL rep makes the copy resolve to 100, not to a
    // stale pre-bridge rep
    def word(i: Int) = s"q_w$i"
    val a = (0 until 42).map(word).mkString(" ")
    val x = (0 until 42).map(i =>
      if (i == 5) "q_x5" else word(i)).mkString(" ")
    val base = java.nio.file.Files.createTempDirectory("graft_dstream4").toString
    val work = s"$base/work"
    DedupStream.processBatch(spark, Seq(10L -> a).toDF("doc_id", "text"),
      work, p, 0L)
    DedupStream.processBatch(spark, Seq(20L -> x).toDF("doc_id", "text"),
      work, p, 1L)
    DedupStream.processBatch(spark, Seq(30L -> x).toDF("doc_id", "text"),
      work, p, 2L)
    assert(streamed(work) === Set(10L -> 10L, 20L -> 10L, 30L -> 10L))
  }
}
