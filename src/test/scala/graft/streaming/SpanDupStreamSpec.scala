package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.llm.Dedup

/** The span-dup ingest poller must score every delivery against the
  * accumulated corpus exactly as batch [[Dedup.spanDupStats]] would —
  * on bridge-free deliveries (no window crosses the minDocs threshold
  * via a LATER delivery) the accumulated streamed stats equal one batch
  * pass over the full corpus, across compaction boundaries and crash
  * replays. */
class SpanDupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val p = SpanDupStream.Params(spanTokens = 5, minDocs = 2,
    compactEvery = 2)
  private val boiler = "one two three four five"

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
    .toMap

  test("streamed stats ≡ batch spanDupStats on bridge-free deliveries, across fold and replay") {
    val root = java.nio.file.Files.createTempDirectory("graft_spanstream").toString
    val landing = s"$root/landing"; val work = s"$root/work"
    new java.io.File(landing).mkdirs()
    // delivery 0: the boilerplate duplicated WITHIN the delivery + control
    val d0 = Seq(
      1L -> s"aa bb cc $boiler dd ee",
      2L -> s"zz yy $boiler xx ww vv",
      3L -> "qq rr ss tt uu pp oo nn").toDF("doc_id", "text")
    // delivery 1: reuses the boiler (already ≥ minDocs — bridge-free:
    // surrounding tokens are globally unique, so only the exact boiler
    // window is shared) + a fresh control
    val d1 = Seq(
      11L -> s"mm n2 $boiler jj k2 ll",
      12L -> "u1 u2 u3 u4 u5 u6 u7 u8").toDF("doc_id", "text")
    // delivery 2: same shape — crosses the compactEvery=2 fold
    val d2 = Seq(
      21L -> s"p1 p2 $boiler p3 p4 p5",
      22L -> "v1 v2 v3 v4 v5 v6 v7 v8").toDF("doc_id", "text")

    d0.write.parquet(s"$landing/d0")
    SpanDupStream.pollSpanDup(spark, landing, work, p)
    val afterOne = rows(SpanDupStream.stats(spark, work))
    assert(afterOne === rows(Dedup.spanDupStats(d0, "doc_id", "text", 5)),
      "delivery scored against itself ≡ batch over the same corpus")

    d1.write.parquet(s"$landing/d1")
    SpanDupStream.pollSpanDup(spark, landing, work, p)
    val corpus01 = d0.union(d1)
    assert(rows(SpanDupStream.stats(spark, work)) ===
      rows(Dedup.spanDupStats(corpus01, "doc_id", "text", 5)),
      "bridge-free second delivery: accumulated stream ≡ batch over both")

    // delivery 2 triggers the fold (batchId 2, compactEvery 2)
    d2.write.parquet(s"$landing/d2")
    SpanDupStream.pollSpanDup(spark, landing, work, p)
    val full = corpus01.union(d2)
    val streamed = rows(SpanDupStream.stats(spark, work))
    assert(streamed === rows(Dedup.spanDupStats(full, "doc_id", "text", 5)),
      "across the compaction boundary")
    val winDirs = new java.io.File(s"$work/wins").listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(winDirs === Seq("b2", "snap1"),
      s"fold must leave snapshot + live batch dir only: $winDirs")

    // crash replay of the last batch rewrites bit-identically
    SpanDupStream.processBatch(spark, d2, work, p, 2L)
    assert(rows(SpanDupStream.stats(spark, work)) === streamed,
      "replayed batch converges")

    // empty re-poll is a no-op
    SpanDupStream.pollSpanDup(spark, landing, work, p)
    assert(rows(SpanDupStream.stats(spark, work)) === streamed)

    // the documented deviation, demonstrated: a LATER delivery that pushes
    // an old doc's window over the threshold flags only the NEW doc
    val d3 = Seq(31L -> "g1 g2 qq rr ss tt uu g3").toDF("doc_id", "text")
    d3.write.parquet(s"$landing/d3")
    SpanDupStream.pollSpanDup(spark, landing, work, p)
    val after = rows(SpanDupStream.stats(spark, work))
    assert(after(31L)._2 > 0L, "the new doc sees the stored occurrence")
    assert(after(3L)._2 === 0L,
      "the already-scored doc is not retroactively re-flagged (by contract)")

    // rescoreStats closes the deviation: stream + rescore ≡ batch over
    // the full corpus — doc 3's window set, pushed over the threshold by
    // d3, is now flagged
    SpanDupStream.rescoreStats(spark, landing, work, p)
    val repaired = rows(SpanDupStream.stats(spark, work))
    val batchAll = rows(Dedup.spanDupStats(full.union(d3),
      "doc_id", "text", 5))
    assert(repaired === batchAll, "stream + rescore ≡ batch")
    assert(repaired(3L)._2 > 0L, "the late-crossed doc is re-flagged")
    // repaired snapshot flavor committed; idempotent re-run no-ops
    val statDirs = new java.io.File(s"$work/stats").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq
    assert(statDirs.exists(_.endsWith("r")),
      s"repaired snapshot flavor expected: $statDirs")
    SpanDupStream.rescoreStats(spark, landing, work, p)
    assert(rows(SpanDupStream.stats(spark, work)) === repaired)
    // the poller continues past the repair: a post-repair delivery is
    // scored against the accumulated state as usual
    val d4 = Seq(41L -> s"h1 h2 $boiler h3 h4 h5").toDF("doc_id", "text")
    d4.write.parquet(s"$landing/d4")
    SpanDupStream.pollSpanDup(spark, landing, work, p)
    val cont = rows(SpanDupStream.stats(spark, work))
    assert(cont(41L)._2 === 1L, "post-repair poll scores against state")
    assert(cont(3L) === repaired(3L), "repaired rows survive the next poll")
  }
}
