package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.behavior.Detectors
import graft.behavior.Detectors.{Roi, TubeParams, TubeTestEvent}

/** End-to-end INCREMENTAL tube-test detection — [[FightStream]]'s
  * medallion design applied to the reference's second detector
  * (`social_behavior_detection/social_behaviour_detection.py:100-390`),
  * in TWO stages: tube tests have no forward-fill and no empty-frame
  * bridging, so no stateful stage is needed at all.
  *
  *   1. bronze→silver: the shared per-frame-slot pivot + features
  *      ([[Poll.silverFeatures]] — the same expression tree as the batch
  *      wide table) with the shared batch start condition
  *      ([[Detectors.tubeStartCond]]) folded into an `isCand` flag;
  *   2. silver→gold: `session_window` over candidate frames with the
  *      SUPER gap = max(maxFrameGap, search window). No batch candidate
  *      session can cross a super boundary (super gap ≥ maxFrameGap), a
  *      closed span's search window cannot reach the next span's
  *      candidates (super gap ≥ window), and session closure implies the
  *      watermark passed the whole search window, so every span frame is
  *      final. Per closed span — in `foreachBatch` — the EXACT batch tail
  *      [[Detectors.tubeTail]] runs over the silver sink slice, densified
  *      to the batch spine shape: interior camera-gap slots become
  *      all-NaN rows, and the spine clips at the sink's last real frame.
  *      Trailing all-NaN frames are verdict no-ops (no cleanup vote, no
  *      end-condition hit, NaN movement samples are nanmean-skipped — see
  *      [[graft.behavior.Kernels.greedyCleanup]]/`tubeVerdict`), so the
  *      clip is exact whether the epoch ended at the last real frame or
  *      continues beyond the frontier.
  *
  * Frontier markers, the poll/discovery contract, and exactly-once event
  * emission (idempotent per-micro-batch event dirs) are identical to
  * [[FightStream]]. The ROI gate is static configuration and evaluates
  * inside the silver plan, exactly where batch evaluates it.
  */
object TubeStream {

  /** Silver rows: one per observed frame slot — tube-test feature columns
    * (NaN = missing), the batch start condition as `isCand`, and the
    * frontier-marker flag. */
  case class TubeSilver(frame: Long, tsUs: Long,
      c0x: Double, c0y: Double, c1x: Double, c1y: Double,
      o0: Double, o1: Double, e2: Double, e3: Double, cdist: Double,
      isCand: Boolean, isMarker: Boolean)

  private val silverSchema = org.apache.spark.sql.Encoders.product[TubeSilver].schema
  private val eventSchema = org.apache.spark.sql.Encoders.product[TubeTestEvent].schema

  /** Stage 1 plan: pose stream → per-frame-slot features + candidate flag. */
  def silverQuery(pose: DataFrame, parts: Map[String, String], p: TubeParams,
      t0us: Long, ids: Seq[String], roi: Option[Roi]): DataFrame = {
    import Detectors.nn
    Poll.silverFeatures(pose, parts, p.fps, t0us, ids).select(
      col("frame"), col("tsUs"),
      nn(col("m0_centroid_x")).as("c0x"), nn(col("m0_centroid_y")).as("c0y"),
      nn(col("m1_centroid_x")).as("c1x"), nn(col("m1_centroid_y")).as("c1y"),
      nn(col("o0")).as("o0"), nn(col("o1")).as("o1"),
      nn(col("e2")).as("e2"), nn(col("e3")).as("e3"),
      nn(col("cdist")).as("cdist"),
      coalesce(Detectors.tubeStartCond(p, roi), lit(false)).as("isCand"),
      (col("nReal") === 0).as("isMarker"))
  }

  /** The candidate-run super gap in frames: dominates the batch candidate
    * sessionization gap AND the search window. */
  private def superGap(p: TubeParams): Long =
    math.max(p.maxFrameGap, math.ceil(p.fps * p.searchWindowSeconds).toLong)

  /** Stage 2a plan: candidate frames → closed super-session spans
    * (minF, maxF). */
  def goldSessions(silver: DataFrame, p: TubeParams, t0us: Long): DataFrame = {
    val durUs = Poll.frameDurUs(p.fps)
    // merge iff frame diff <= superGap, like the batch cumulative-sum form
    // (session_window splits at >= gap, so +0.5 frame)
    val gapUs = math.round((superGap(p) + 0.5) * durUs.toDouble)
    silver
      .withColumn("tFrame", timestamp_micros(lit(t0us) + col("frame") * durUs))
      .withWatermark("tFrame", "0 seconds")
      // the never-true watermark-column disjunct keeps this filter ABOVE
      // the EventTimeWatermark node (see FightStream.goldSessions): markers
      // and non-candidate slots must still advance the watermark, or open
      // sessions never close
      .filter(col("isCand") || unix_micros(col("tFrame")) < lit(Long.MinValue + 1))
      // constant epoch key: streaming session_window requires a non-window
      // grouping key (and a multi-epoch deployment keys by epoch here)
      .withColumn("_ek", lit(""))
      .groupBy(col("_ek"), session_window(col("tFrame"), s"$gapUs microseconds"))
      .agg(min(col("frame")).as("minF"), max(col("frame")).as("maxF"))
      .select(col("minF"), col("maxF"))
  }

  /** Stage 2b (foreachBatch body): closed candidate spans → the EXACT
    * batch tail ([[Detectors.tubeTail]] — same candidate sessionization,
    * min-size filter, kernel span [firstF, lastF + window) and winner
    * resolution as `detectTubeTests`) over the silver sink densified to
    * the batch spine shape. */
  def eventsFromSpans(spark: SparkSession, spans: Array[(Long, Long)],
      silverDir: String, p: TubeParams, t0us: Long,
      ids: Seq[String]): Dataset[TubeTestEvent] = {
    import spark.implicits._
    val sorted = ids.sorted
    require(sorted.length == 2, s"expected exactly 2 identities, got ${sorted.length}")
    val durUs = Poll.frameDurUs(p.fps)
    val window = math.ceil(p.fps * p.searchWindowSeconds).toLong
    val real = spark.read.schema(silverSchema).parquet(silverDir)
      .filter(!col("isMarker"))
    // batch spine end = the sink's last real frame (parquet footer min/max
    // scan): span frames beyond it would be rows the batch spine does not
    // have — and trailing all-NaN rows are verdict no-ops anyway
    val spineEnd = real.agg(max("frame")).head().getLong(0)
    val lo = spans.map(_._1).min
    val hi = math.min(spans.map(_._2).max + (window - 1), spineEnd)
    // densify each span to the batch spine: one grid row per frame in
    // [minF, min(maxF + window − 1, spineEnd)], all-NaN where the sink has
    // no slot. Spans are event-scale (bounded by the candidate run + the
    // search window), so a per-span sequence() is safe — and span ranges
    // are provably disjoint (consecutive spans > superGap ≥ window apart),
    // so no dedup pass is needed on the exploded grid.
    val grid = spans.toSeq.toDF("_lo", "_hi")
      .select(explode(sequence(col("_lo"),
        least(col("_hi") + (window - 1), lit(spineEnd)))).as("frame"))
    val slice = real.filter(col("frame") >= lo && col("frame") <= hi)
    def nnc(c: String) = coalesce(col(c), lit(Double.NaN)).as(c)
    val flagged = grid.join(slice, Seq("frame"), "left")
      .select(col("frame"),
        coalesce(col("tsUs"), lit(t0us) + col("frame") * durUs).as("tsUs"),
        nnc("c0x"), nnc("c0y"), nnc("c1x"), nnc("c1y"),
        nnc("o0"), nnc("o1"), nnc("e2"), nnc("e3"), nnc("cdist"),
        coalesce(col("isCand"), lit(false)).as("isCand"))
      .withColumn(Detectors.G, lit(""))
    Detectors.tubeTail(flagged, p)
      .map(t => TubeTestEvent(t.start_ts, t.end_ts, sorted(t.winner_idx)))
  }

  /** One incremental poll (the reference's 30-minute loop body): ingest all
    * pose chunk files under `poseDir` with event time < `upToUs`, advance
    * both stages, and append newly-closed tube-test events under
    * `workDir/events`. Re-running with no new data is a no-op
    * (checkpoints); events are emitted exactly once. The poll/frontier
    * contract is [[FightStream.pollFights]]'s; the emission horizon is
    * `lastF + superGap + 2` frames past a candidate run's end. */
  def pollTubeTests(spark: SparkSession, poseDir: String, workDir: String,
      parts: Map[String, String], p: TubeParams, t0us: Long,
      ids: Seq[String], upToUs: Long, roi: Option[Roi] = None): Unit = {
    val durUs = Poll.frameDurUs(p.fps)
    val markerDir = s"$workDir/markers"
    val silverDir = s"$workDir/silver"
    val eventsDir = s"$workDir/events"
    Seq(markerDir, silverDir, eventsDir).foreach(Poll.ensureDir(spark, _))
    Poll.writeMarkers(spark, markerDir, upToUs, durUs)
    val pose = spark.readStream.schema(Poll.poseSchema).parquet(poseDir)
      .unionByName(spark.readStream.schema(Poll.poseSchema).parquet(markerDir))
    Poll.drain(silverQuery(pose, parts, p, t0us, ids, roi),
      silverDir, s"$workDir/ckpt_silver")
    val silver = spark.readStream.schema(silverSchema).parquet(silverDir)
    // gold: closed spans → exact batch tail over the densified silver
    // slice, written per micro-batch under an id-keyed subdir — overwrite
    // of the same subdir makes checkpoint replays idempotent
    def goldOnce(): Unit =
      goldSessions(silver, p, t0us).writeStream
        .option("checkpointLocation", s"$workDir/ckpt_gold")
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val spans = batch.select("minF", "maxF").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          if (spans.nonEmpty)
            eventsFromSpans(batch.sparkSession, spans, silverDir, p, t0us, ids)
              .toDF()
              .write.mode("overwrite").parquet(s"$eventsDir/b$batchId")
          ()
        }
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    goldOnce(); goldOnce()
  }

  /** Events emitted so far (batch read of the per-micro-batch gold dirs). */
  def tubeEvents(spark: SparkSession, workDir: String): Dataset[TubeTestEvent] = {
    import spark.implicits._
    val dirs = Poll.eventParquetDirs(spark, workDir)
    if (dirs.isEmpty) spark.emptyDataset[TubeTestEvent]
    else spark.read.schema(eventSchema).parquet(dirs: _*).as[TubeTestEvent]
  }
}
