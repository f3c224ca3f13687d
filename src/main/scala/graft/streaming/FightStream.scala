package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._
import graft.behavior.{Detectors, Kernels}
import graft.behavior.Detectors.{FightEvent, FightParams}
import graft.functions.Cols

/** End-to-end INCREMENTAL fight detection — the reference's operational
  * mode (`combine_pose_id_automated.py:149-185`: a 30-minute polling loop
  * over newly-landed chunk files), rebuilt on Structured Streaming as a
  * three-stage medallion pipeline, each stage one streaming query with its
  * own checkpoint (exactly-once file tracking replaces the reference's
  * processed-set bookkeeping):
  *
  *   1. bronze→silver: per-frame wide pivot (time-window aggregation on the
  *      frame slot) + columnar features — [[Detectors.withFeatures]], the
  *      same expression tree the batch detector uses;
  *   2. silver→filled: `flatMapGroupsWithState` forward-fill of the
  *      centroid distance ACROSS micro-batches (the cross-chunk carry the
  *      reference loses at its per-chunk job boundaries) + candidate /
  *      bridge flags;
  *   3. filled→gold: `session_window` assembly of candidate∪bridge frames,
  *      then the [[Kernels.fightVerdict]] kernel on each CLOSED session
  *      (append mode: each event is emitted exactly once, when the
  *      watermark passes the session's gap horizon).
  *
  * End-of-data flush: a poll writes two marker rows at the frontier
  * `upToUs` into a side channel unioned with the pose source. Markers
  * advance the event-time watermark (flushing every frame slot strictly
  * before the frontier through all three stages) without contributing pose
  * data — the reference's "watch until period end + slack" in watermark
  * form. The poll contract is the file-discovery contract: `upToUs` must
  * not exceed the earliest event time that could still arrive.
  *
  * Deviations from batch [[Detectors.detectFights]] (documented, exact on
  * streams without mid-event detection dropouts): the kernel sees the
  * session's candidate∪bridge frames (batch attaches every spine frame in
  * [firstF−1, lastF], including the leading cleanup-seed frame and any
  * non-candidate interior frames); sessionization is single-phase at
  * `maxFrameGapWEmptyFrames` (batch pre-clusters candidates at
  * `maxFrameGap` with a min-size filter before bridging); the blob-speed
  * condition is not wired (condition 3 = always true, as with
  * `blob = None` in batch); dense-spine empty frames exist only where the
  * stream delivered rows for the slot.
  *
  * Scale: stage 1 and 3 are keyed stateful aggregations (parallel across
  * frame slots / sessions); stage 2's sequential carry is inherently
  * serial PER EPOCH — one group key per epoch stream, so a multi-epoch
  * deployment runs one carry chain per epoch in parallel, state one double
  * per key. Multiple silver files per poll land in ONE micro-batch
  * (AvailableNow, no maxFilesPerTrigger) and are ordered inside the
  * stateful closure, so shuffle-randomized file layout cannot reorder the
  * carry.
  */
object FightStream {

  /** Silver rows: one per observed frame slot, reference feature columns
    * (NaN = missing, exactly like the batch wide table). */
  case class SilverRow(frame: Long, tsUs: Long,
      c0x: Double, c0y: Double, c1x: Double, c1y: Double,
      cdist: Double, nh0: Double, nh1: Double, is0: Double, is1: Double,
      isEmpty: Boolean)

  /** Filled rows: silver + forward-filled centroid distance folded into the
    * candidate (`isFight`) and empty-frame bridge (`isBridge`) flags. */
  case class FilledRow(frame: Long, tsUs: Long,
      c0x: Double, c0y: Double, c1x: Double, c1y: Double,
      isFight: Boolean, isBridge: Boolean)

  /** One frame inside a closed session (gold-stage kernel input). */
  case class SessRow(frame: Long, tsUs: Long,
      c0x: Double, c0y: Double, c1x: Double, c1y: Double, isFight: Boolean)

  private def frameDurUs(fps: Double): Long = {
    val d = math.round(1e6 / fps)
    require(math.abs(d * fps - 1e6) < 1e-6,
      s"fps must divide 1e6 microseconds evenly (reference 50 fps), got $fps")
    d
  }

  val poseSchema: StructType = StructType(Seq(
    StructField("time", TimestampType), StructField("identity", StringType),
    StructField("part", StringType), StructField("x", DoubleType),
    StructField("y", DoubleType)))

  /** Stage 1 plan: pose stream → per-frame-slot wide pivot + features.
    * The watermark rides the frame-slot event time, so marker rows (null
    * identity/part) advance it while aggregating to all-null (empty)
    * frames. */
  def silverQuery(pose: DataFrame, parts: Map[String, String], fps: Double,
      t0us: Long, ids: Seq[String]): DataFrame = {
    val sorted = ids.sorted
    require(sorted.length == 2, s"expected exactly 2 identities, got ${sorted.length}")
    val durUs = frameDurUs(fps)
    val withT = pose
      .withColumn("frame", Cols.frameId(col("time"), lit(t0us), fps))
      .withColumn("tFrame", timestamp_micros(lit(t0us) + col("frame") * durUs))
      .withWatermark("tFrame", "0 seconds")
      .withColumn("mouse", Detectors.mouseCol(lit(sorted.head)))
      .withColumn("lpart", Detectors.lpartCol(parts))
      // batch wideFramesG filters to the skeleton parts BEFORE aggregating,
      // so the slot tsUs must too: a non-skeleton row (spine1, tail_tip …)
      // landing earliest in a slot must not shift event timestamps. Marker
      // rows (null identity) stay — they only advance the watermark.
      .filter(col("identity").isNull || col("lpart").isNotNull)
    // tsUs excludes marker rows (null identity): a marker landing in a live
    // slot must not replace the slot's real min pose timestamp (event
    // start/end times come from tsUs); marker-only slots synthesize the
    // slot-grid time, like the batch dense spine does for empty frames
    val allAggs = Seq(min(col("frame")).as("frame"),
      min(when(col("identity").isNotNull, unix_micros(col("time")))).as("tsUs0")) ++
      Detectors.pivotAggs
    val wide = Detectors.expandPivot(withT
      .groupBy(window(col("tFrame"), s"$durUs microseconds"))
      .agg(allAggs.head, allAggs.tail: _*)
      .drop("window"))
      .withColumn("tsUs", coalesce(col("tsUs0"), lit(t0us) + col("frame") * durUs))
      .drop("tsUs0")
    import Detectors.nn
    Detectors.withFeatures(wide).select(
      col("frame"), col("tsUs"),
      nn(col("m0_centroid_x")).as("c0x"), nn(col("m0_centroid_y")).as("c0y"),
      nn(col("m1_centroid_x")).as("c1x"), nn(col("m1_centroid_y")).as("c1y"),
      nn(col("cdist")).as("cdist"),
      nn(col("nh0")).as("nh0"), nn(col("nh1")).as("nh1"),
      nn(col("is0")).as("is0"), nn(col("is1")).as("is1"),
      col("isEmpty"))
  }

  /** Stage 2 plan: forward-fill `cdist` across frames AND micro-batches
    * (state = last non-NaN value), then fold the fight conditions into
    * flags. One carry chain per stream (key per epoch at deployment
    * scale). */
  def fillAndFlag(silver: Dataset[SilverRow], p: FightParams): Dataset[FilledRow] = {
    val spark = silver.sparkSession
    import spark.implicits._
    silver.groupByKey(_ => "")
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[SilverRow], state: GroupState[Double]) =>
          var last: Double = if (state.exists) state.get else Double.NaN
          val out = it.toArray.sortBy(_.frame).map { r =>
            val cd = if (!r.cdist.isNaN) r.cdist else last
            if (!r.cdist.isNaN) last = r.cdist
            val cond1 = cd < p.maxDistance
            // Scala NaN > t is FALSE — the same NaN-drops-the-frame
            // semantics as the batch core's gtNanFalse (numpy parity)
            val cond2 = r.nh0 > p.maxNoseHeadDistance ||
              r.nh1 > p.maxNoseHeadDistance ||
              r.is0 > p.maxInterspinalDistance ||
              r.is1 > p.maxInterspinalDistance
            FilledRow(r.frame, r.tsUs, r.c0x, r.c0y, r.c1x, r.c1y,
              isFight = cond1 && cond2, isBridge = cond1 && r.isEmpty)
          }
          if (!last.isNaN) state.update(last)
          out.iterator
      }
  }

  /** Stage 3 plan: session-window assembly of candidate∪bridge frames and
    * the per-closed-session fight kernel. The watermark node sits BEFORE
    * the candidate filter so every frame (markers included) advances it. */
  def goldEvents(filled: DataFrame, p: FightParams, t0us: Long): Dataset[FightEvent] = {
    val spark = filled.sparkSession
    import spark.implicits._
    val durUs = frameDurUs(p.fps)
    // merge iff frame diff <= maxFrameGapWEmptyFrames, like the batch
    // cumulative-sum form (session_window splits at >= gap, so +0.5 frame)
    val gapUs = math.round((p.maxFrameGapWEmptyFrames + 0.5) * durUs.toDouble)
    val sessions = filled
      .withColumn("tFrame", timestamp_micros(lit(t0us) + col("frame") * durUs))
      .withWatermark("tFrame", "0 seconds")
      // The never-true third disjunct REFERENCES THE WATERMARK COLUMN, which
      // is the one thing PushPredicateThroughNonJoin refuses to push below
      // an EventTimeWatermark node. Without it the candidate filter is
      // pushed under the watermark exec, which then only ever sees candidate
      // rows — frontier markers and trailing empty frames are dropped before
      // the max-event-time stat, the watermark freezes at the last
      // candidate, and open sessions never close. (Verified: a plain filter
      // froze the watermark at the fight's final frame; a rand() guard gets
      // optimized away.)
      .filter(col("isFight") || col("isBridge") ||
        unix_micros(col("tFrame")) < lit(Long.MinValue + 1))
      // constant epoch key: streaming session_window requires a non-window
      // grouping key (and a multi-epoch deployment keys by epoch here)
      .withColumn("_ek", lit(""))
      .groupBy(col("_ek"), session_window(col("tFrame"), s"$gapUs microseconds"))
      .agg(collect_list(struct(col("frame"), col("tsUs"),
        col("c0x"), col("c0y"), col("c1x"), col("c1y"),
        col("isFight"))).as("rows"))
      .select(col("rows").as[Seq[SessRow]])
    sessions.flatMap { raw =>
      val rs = raw.sortBy(_.frame).toArray
      val nCand = rs.count(_.isFight).toLong
      if (nCand <= p.minNumFrames || rs.length < 2) Iterator.empty
      else {
        // batch kernel body = [firstF−1, lastF) incl. the cleanup seed
        // frame; the stream session lacks the seed → body = [firstF, lastF)
        val body = rs.dropRight(1)
        val verdict = Kernels.fightVerdict(
          body.map(_.c0x), body.map(_.c0y), body.map(_.c1x), body.map(_.c1y),
          p.fps, p.cm2px, p.minCentroidSpeed, p.minBothCentroidSpeed)
        verdict.iterator.flatMap { case (ex, ey) =>
          val startUs = rs.head.tsUs
          val endUs = rs.last.tsUs
          val dur = (endUs - startUs) / 1e6
          if (dur > 1.0)
            Iterator(FightEvent(new java.sql.Timestamp(startUs / 1000),
              new java.sql.Timestamp(endUs / 1000), dur, ex, ey))
          else Iterator.empty
        }
      }
    }
  }

  private val silverSchema = org.apache.spark.sql.Encoders.product[SilverRow].schema
  private val filledSchema = org.apache.spark.sql.Encoders.product[FilledRow].schema
  private val eventSchema = org.apache.spark.sql.Encoders.product[FightEvent].schema

  private def drain(df: DataFrame, outPath: String, checkpoint: String): Unit = {
    def once(): Unit =
      df.writeStream.format("parquet")
        .option("path", outPath).option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // second pass: stateful append sinks evict with the watermark advanced
    // by the FIRST pass's data, so a no-data flush run emits what the data
    // run closed — without it, emission would lag one poll behind
    once(); once()
  }

  private def ensureDir(path: String): Unit =
    new java.io.File(path).mkdirs()

  /** One incremental poll (the reference's 30-minute loop body): ingest all
    * pose chunk files under `poseDir` with event time < `upToUs`, advance
    * every stage, and append newly-closed fight events under
    * `workDir/events`. Re-running with no new data is a no-op (checkpoints);
    * events are emitted exactly once.
    *
    * `upToUs` is the discovery frontier: all data strictly before it must
    * already be in `poseDir` (later-arriving rows below the frontier would
    * be dropped as late). Events are only emitted once the frontier passes
    * their session's gap horizon — on the final poll of an epoch pass
    * `epochEndUs + (maxFrameGapWEmptyFrames + 2) frames` or more.
    *
    * Memory contract: each poll's silver rows pass through ONE stateful
    * task ([[fillAndFlag]]'s sequential carry), so a poll must be bounded —
    * at the reference cadence (30 min at 50 fps ≈ 90 k slots) that is a few
    * MB. Catching up over a LONG backlog (days of pose data) must be split
    * into multiple polls with stepped `upToUs`, not one giant poll;
    * `maxFilesPerTrigger` is no substitute because file discovery order
    * within one backlog batch does not follow frame order.
    */
  def pollFights(spark: SparkSession, poseDir: String, workDir: String,
      parts: Map[String, String], p: FightParams, t0us: Long,
      ids: Seq[String], upToUs: Long): Unit = {
    import spark.implicits._
    val durUs = frameDurUs(p.fps)
    val markerDir = s"$workDir/markers"
    val silverDir = s"$workDir/silver"
    val filledDir = s"$workDir/filled"
    val eventsDir = s"$workDir/events"
    Seq(markerDir, silverDir, filledDir, eventsDir).foreach(ensureDir)
    // frontier markers at (upTo − 1 frame, upTo): the pair advances the
    // watermark to exactly upTo, flushing every frame slot STRICTLY before
    // the frontier — the slot containing upTo stays pending, so rows for it
    // arriving in a later poll are merged, not dropped as late
    val markers = Seq(upToUs - durUs, upToUs).map { us =>
      // full µs precision: Timestamp(ms) alone truncates up to 999 µs, which
      // can round the marker's frame id one slot low and leave the last
      // pre-frontier slot unflushed this poll
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      Row(t, null, null, null, null)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(markers, 1), poseSchema)
      .write.mode("append").parquet(markerDir)
    val pose = spark.readStream.schema(poseSchema).parquet(poseDir)
      .unionByName(spark.readStream.schema(poseSchema).parquet(markerDir))
    drain(silverQuery(pose, parts, p.fps, t0us, ids),
      silverDir, s"$workDir/ckpt_silver")
    val silver = spark.readStream.schema(silverSchema).parquet(silverDir)
      .as[SilverRow]
    drain(fillAndFlag(silver, p).toDF(), filledDir, s"$workDir/ckpt_filled")
    val filled = spark.readStream.schema(filledSchema).parquet(filledDir)
    drain(goldEvents(filled, p, t0us).toDF(), eventsDir, s"$workDir/ckpt_gold")
  }

  /** Events emitted so far (batch read of the gold sink). */
  def fightEvents(spark: SparkSession, workDir: String): Dataset[FightEvent] = {
    import spark.implicits._
    spark.read.schema(eventSchema).parquet(s"$workDir/events").as[FightEvent]
  }
}
