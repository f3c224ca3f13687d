package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Hot-window skew at scale (SURVEY §8): one VIRAL 5-token boilerplate
  * span planted in EVERY document — the license-header shape span-level
  * dedup exists to catch, and the worst case for any per-window
  * computation without partial aggregation: all N (window, doc) rows of
  * the viral key must meet somewhere. [[Dedup.spanDupStats]]'s
  * complement plan (capped non-dup collect, no join and no window
  * function on the window key) gives the viral key nothing to stall:
  * every aggregate is partial-agg-friendly and per-key state is
  * bounded. The probe measures it against the pre-fix window-function
  * form (`count over (partition by window)`, reproduced inline as the
  * comparison arm), which must funnel the whole key into a single
  * WindowExec task.
  *
  * The straggler signature measured is MAX SHUFFLE-READ ROWS PER TASK —
  * scale-invariant and immune to local CPU-contention noise, unlike
  * task wall time: the window form necessarily shows a task consuming
  * ≥ N rows (the whole viral key), the shipped form stays bounded near
  * a fair share. Wall times are reported alongside.
  *
  * Docs are 6 tokens (the viral span + one globally-unique filler), so
  * the viral key holds N of the 2N window rows — HALF the shuffle on
  * one key. Asserts: every doc scores exactly (2 windows, 1 dup
  * window) under BOTH forms; the window form's max-rows task reads the
  * full viral key (≥ N); the shipped form's stays ≤ a third of that.
  * `SPARK_GRAFT_VIRAL_DOCS` scales (default 2 000 000 → 4 M window
  * rows, 2 M on the viral key). */
object SpanSkewProbe {

  private final class MaxShuffleRows extends SparkListener {
    @volatile var maxRows = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null && t.taskMetrics.shuffleReadMetrics != null)
        maxRows = math.max(maxRows,
          t.taskMetrics.shuffleReadMetrics.recordsRead)
  }

  /** The pre-fix spanDupStats shape — per-window distinct-doc count as
    * an unbounded window function. Kept ONLY as the probe's comparison
    * arm; [[Dedup.spanDupStats]] is the shipped operator. */
  private def windowFormStats(docs: DataFrame, spanTokens: Int,
      minDocs: Int): DataFrame = {
    val tok = split(col("text"), " ")
    val m = size(tok) - (spanTokens - 1)
    val idxs = when(m < 1, array().cast("array<int>"))
      .otherwise(sequence(lit(1), m))
    val winKey = transform(idxs,
      p => xxhash64(concat_ws(" ", slice(tok, p, lit(spanTokens)))))
    docs.select(col("doc_id"), explode(winKey).as("_w"))
      .groupBy("_w", "doc_id").agg(count(lit(1)).as("_c"))
      .withColumn("_nd", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("_w")))
      .groupBy("doc_id").agg(
        sum("_c").as("n_windows"),
        sum(when(col("_nd") >= minDocs, col("_c")).otherwise(lit(0L)))
          .as("n_dup_windows"))
  }

  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_VIRAL_DOCS", "2000000").toLong

    val boiler = "this notice is boiler plate"
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        concat_ws(" ", lit(boiler), concat(lit("u"), col("id").cast("string")))
          .as("text"))
      .localCheckpoint()

    def timed(df: => DataFrame): (Long, Long, Double, Long) = {
      val lsn = new MaxShuffleRows
      spark.sparkContext.addSparkListener(lsn)
      val t0 = System.nanoTime()
      val agg = df.agg(count(lit(1)), sum(when(
        col("n_windows") === 2L && col("n_dup_windows") === 1L, 0L)
        .otherwise(1L))).head
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously; give the bus a beat
      Thread.sleep(1000)
      spark.sparkContext.removeSparkListener(lsn)
      (agg.getLong(0), agg.getLong(1), wall, lsn.maxRows)
    }

    val (sRows, sBad, sWall, sMax) =
      timed(Dedup.spanDupStats(docs, "doc_id", "text", 5))
    // minDocs = 3 rides the CAPPED TYPED AGGREGATE (CountByKeyCapped)
    // instead of the codegen'd min/max fast path — the viral key must
    // overflow its per-task buffer, not funnel; expected per-doc counts
    // are unchanged (viral window in N ≥ 3 docs, unique window in 1 < 3)
    val (s3Rows, s3Bad, s3Wall, s3Max) =
      timed(Dedup.spanDupStats(docs, "doc_id", "text", 5, minDocs = 3))
    val (wRows, wBad, wWall, wMax) = timed(windowFormStats(docs, 5, 2))

    // removal rides CollectByKeyCapped (doc → positions) — the path
    // d9/removeDupSpans always uses; the viral span covers tokens 1–5,
    // so every doc keeps exactly its unique 6th token
    def timedRm(): (Long, Long, Double, Long) = {
      val lsn = new MaxShuffleRows
      spark.sparkContext.addSparkListener(lsn)
      val t0 = System.nanoTime()
      val agg = Dedup.removeDupSpans(docs, "doc_id", "text", 5)
        .agg(count(lit(1)), sum(when(
          col("n_removed") === 5L &&
          col("clean_text") === concat(lit("u"), col("doc_id").cast("string")),
          0L).otherwise(1L))).head
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      spark.sparkContext.removeSparkListener(lsn)
      (agg.getLong(0), agg.getLong(1), wall, lsn.maxRows)
    }
    val (rRows, rBad, rWall, rMax) = timedRm()

    val ok = sRows == n && sBad == 0 && wRows == n && wBad == 0 &&
      s3Rows == n && s3Bad == 0 && rRows == n && rBad == 0 &&
      wMax >= n && sMax <= wMax / 3 && s3Max <= wMax / 3 && rMax <= wMax / 3
    println(f"SPAN_SKEW docs=$n " +
      f"shippedWall=$sWall%.1fs shippedMaxTaskRows=$sMax " +
      f"typedWall=$s3Wall%.1fs typedMaxTaskRows=$s3Max " +
      f"rmWall=$rWall%.1fs rmMaxTaskRows=$rMax " +
      f"winWall=$wWall%.1fs winMaxTaskRows=$wMax " +
      s"shippedBad=$sBad typedBad=$s3Bad rmBad=$rBad winBad=$wBad " +
      s"${if (ok) "OK" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
