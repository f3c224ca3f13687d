package graft.behavior

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols
import graft.operators.{Fill, Sessionize}

/** Behavior detectors — the reference's signature analytics queries
  * (`social_behavior_detection/social_behaviour_detection.py`: tube tests
  * `:100-390`, fights `:394-762`), re-expressed Spark-first:
  *
  *   dense frame spine (sequence+explode) → wide per-frame pivot →
  *   columnar feature derivation (whole-stage codegen) → boolean candidate
  *   conjunction → cumulative-sum sessionization → per-event typed kernel
  *   (`groupByKey.flatMapGroups` over [[Kernels]]) → event table.
  *
  * The expensive sequential kernel only sees frames of *candidate events*
  * (the reference's documented two-phase design,
  * `tube_test_detection_logic.md:35`), so its cost is proportional to event
  * frames, not stream frames; events parallelize across the cluster.
  *
  * Scope note: one invocation processes ONE epoch (the reference's unit of
  * work — an epoch is one continuous recording). Per-frame feature stages
  * are fully partition-parallel; only the *candidate frame ids* (sparse,
  * orders of magnitude smaller than the stream) pass through an
  * unpartitioned sessionization window. Multi-epoch corpora shard by epoch
  * around this API, which also preserves the reference's session-boundary
  * semantics at epoch edges.
  */
object Detectors {

  case class FightParams(
      fps: Double = 50.0, cm2px: Double = 5.4,
      maxDistance: Double = 20, maxNoseHeadDistance: Double = 7,
      maxInterspinalDistance: Double = 10, minBlobSpeed: Double = 3,
      maxFrameGap: Long = 200, minNumFrames: Long = 5,
      maxFrameGapWEmptyFrames: Long = 100,
      minCentroidSpeed: Double = 20, minBothCentroidSpeed: Double = 15)

  case class TubeParams(
      fps: Double = 50.0, angleTolerance: Double = 45,
      maxDistanceStart: Double = 50, maxFrameGap: Long = 20,
      minTubeTestStartFrames: Long = 15, searchWindowSeconds: Double = 1,
      minDistance: Double = 30, maxDistanceEnd: Double = 60,
      movementThreshold: Double = 2)

  case class FightEvent(start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp,
      duration_sec: Double, end_x: Double, end_y: Double)
  case class TubeTestEvent(start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp,
      winner_identity: String)

  /** Per-event kernel input row (shared by both detectors; tube-only fields
    * ride as NaN for fights). */
  case class EvRow(ev: Long, frame: Long, tsUs: Long,
      c0x: Double, c0y: Double, c1x: Double, c1y: Double,
      o0: Double, o1: Double, e2: Double, e3: Double, cdist: Double,
      isCand: Boolean, firstF: Long, lastF: Long)

  private def nn(c: Column): Column = coalesce(c, lit(Double.NaN))

  /** Long pose table → dense wide frame table.
    *
    * Input columns: `time, identity, part, x, y`; exactly 2 identities.
    * `parts` maps logical names (nose/head/centroid/tail_base) to physical
    * part names (the reference's skeleton aliasing,
    * `social_behaviour_detection.py:57-71`).
    *
    * Output: one row per frame id in [0, maxFrame] (dense spine — the
    * reference's tensor shape), with per-mouse per-part coordinates, real or
    * synthesized timestamp, and feature columns.
    */
  def wideFrames(pose: DataFrame, parts: Map[String, String], fps: Double): DataFrame = {
    val spark = pose.sparkSession
    val logical = Seq("nose", "head", "centroid", "tail_base")
    val physToLog = logical.map(l => parts(l) -> l).toMap
    // identity codes: bounded 2-value domain → collect + broadcast literal
    val ids = pose.select("identity").distinct().collect().map(_.getString(0)).sorted
    require(ids.length == 2, s"expected exactly 2 identities, got ${ids.length}")
    val idCode = when(col("identity") === ids(0), 0).otherwise(1)
    val filtered = pose
      .filter(col("part").isin(parts.values.toSeq: _*))
      .withColumn("mouse", idCode)
      .withColumn("lpart",
        physToLog.foldLeft(lit(null).cast("string")) { case (acc, (phys, log)) =>
          when(col("part") === phys, log).otherwise(acc)
        })
    // frame id from stream start at fixed fps (P4)
    val bounds = pose.agg(min(unix_micros(col("time"))).as("t0us"))
    val framed = filtered.crossJoin(broadcast(bounds))
      .withColumn("frame", Cols.frameId(col("time"), col("t0us"), fps))
    val aggs = for (m <- 0 to 1; l <- logical; c <- Seq("x", "y")) yield
      min(when(col("mouse") === m && col("lpart") === l, col(c)))
        .as(s"m${m}_${l}_$c")
    val wide = framed.groupBy("frame")
      .agg(min(unix_micros(col("time"))).as("tsUs"), aggs: _*)
    // dense spine: every frame id in [0, max] exists (empty frames = NaNs),
    // matching the reference's dense tensor semantics
    val spine = wide.agg(max("frame").as("maxF"))
      .select(explode(sequence(lit(0L), col("maxF"))).as("frame"))
    spine.join(wide, Seq("frame"), "left")
      .crossJoin(broadcast(bounds))
      .withColumn("tsUs", coalesce(col("tsUs"),
        col("t0us") + round(col("frame") * 1e6 / fps).cast("long")))
      .drop("t0us")
  }

  private def d(m: Int, p: String, c: String): Column = nn(col(s"m${m}_${p}_$c"))
  private def edist(m1: Int, p1: String, m2: Int, p2: String): Column =
    sqrt((d(m1, p1, "x") - d(m2, p2, "x")) * (d(m1, p1, "x") - d(m2, p2, "x")) +
      (d(m1, p1, "y") - d(m2, p2, "y")) * (d(m1, p1, "y") - d(m2, p2, "y")))

  /** Orientation of mouse m in degrees [0,360): tail_base→nose vector with
    * screen-y flipped, falling back to tail_base→head when the nose is
    * missing (`social_behaviour_detection.py:194-208`). */
  private def orientation(m: Int): Column = {
    def ang(tip: String): Column = {
      val a = degrees(atan2(-(d(m, tip, "y") - d(m, "tail_base", "y")),
        d(m, tip, "x") - d(m, "tail_base", "x")))
      when(a < 0, a + 360.0).otherwise(a)
    }
    when(isnan(ang("nose")), ang("head")).otherwise(ang("nose"))
  }

  /** Feature columns shared by both detectors. */
  def withFeatures(wide: DataFrame): DataFrame = wide
    .withColumn("cdist", edist(0, "centroid", 1, "centroid"))
    .withColumn("o0", orientation(0))
    .withColumn("o1", orientation(1))
    .withColumn("e_headhead", edist(0, "head", 1, "head"))
    .withColumn("e_tailtail", edist(0, "tail_base", 1, "tail_base"))
    .withColumn("e2", edist(0, "tail_base", 1, "head"))
    .withColumn("e3", edist(1, "tail_base", 0, "head"))
    .withColumn("rel0", edist(0, "tail_base", 0, "head"))
    .withColumn("rel1", edist(0, "tail_base", 1, "head"))
    .withColumn("nh0", edist(0, "nose", 0, "head"))
    .withColumn("nh1", edist(1, "nose", 1, "head"))
    .withColumn("is0", (edist(0, "head", 0, "centroid") + edist(0, "centroid", 0, "tail_base")) / 2.0)
    .withColumn("is1", (edist(1, "head", 1, "centroid") + edist(1, "centroid", 1, "tail_base")) / 2.0)
    .withColumn("isEmpty",
      (0 to 1).flatMap(m => Seq("nose", "head", "centroid", "tail_base")
        .flatMap(p => Seq(d(m, p, "x").isNaN, d(m, p, "y").isNaN))).reduce(_ && _))

  /** Candidate-event assembly shared by both detectors: sessionize candidate
    * frames, enforce min size, and emit (ev, firstF, lastF). */
  private def events(cand: DataFrame, gap: Long, minFrames: Long): DataFrame = {
    val sessed = Sessionize.sessionize(cand, "frame", Nil, gap)
    sessed.groupBy("session_id").agg(
        min("frame").as("firstF"), max("frame").as("lastF"),
        count(lit(1)).as("nF"))
      .filter(col("nF") > minFrames)
      .select(col("session_id").as("ev"), col("firstF"), col("lastF"))
  }

  /** Attach all spine frames in [firstF+lo, lastF+hi] to each event
    * (events are few → broadcast range join). */
  private def attachSpan(feat: DataFrame, evs: DataFrame, lo: Long, hi: Long,
      candFrames: DataFrame): Dataset[EvRow] = {
    val spark = feat.sparkSession
    import spark.implicits._
    feat.join(broadcast(evs),
        col("frame") >= col("firstF") + lo && col("frame") <= col("lastF") + hi)
      .join(candFrames.select(col("frame"), lit(true).as("isCand")), Seq("frame"), "left")
      .select(col("ev"), col("frame"), col("tsUs"),
        nn(col("m0_centroid_x")).as("c0x"), nn(col("m0_centroid_y")).as("c0y"),
        nn(col("m1_centroid_x")).as("c1x"), nn(col("m1_centroid_y")).as("c1y"),
        nn(col("o0")).as("o0"), nn(col("o1")).as("o1"),
        nn(col("e2")).as("e2"), nn(col("e3")).as("e3"),
        nn(col("cdist")).as("cdist"),
        coalesce(col("isCand"), lit(false)).as("isCand"),
        col("firstF"), col("lastF"))
      .as[EvRow]
  }

  private def usToTs(us: Long) = new java.sql.Timestamp(us / 1000)

  /** Fight detection end-to-end (reference `detect_fights`,
    * `social_behaviour_detection.py:394-762`).
    *
    * @param pose  long pose table (time, identity, part, x, y)
    * @param blob  optional blob-position stream (time, x, y) for the speed
    *              condition; None skips condition 3
    */
  def detectFights(pose: DataFrame, blob: Option[DataFrame],
      parts: Map[String, String], p: FightParams): Dataset[FightEvent] = {
    val spark = pose.sparkSession
    import spark.implicits._
    val feat0 = withFeatures(wideFrames(pose, parts, p.fps))
    // blob speed: dt-anomaly drop (T5), px→cm/s, 10-frame "same" smoothing
    val feat = blob match {
      case Some(b) =>
        val sp = blobSpeed(b, p.fps, p.cm2px)
        feat0.join(sp, Seq("frame"), "left")
      case None => feat0.withColumn("blob_speed", lit(Double.MaxValue))
    }
    val ff = Fill.ffill(feat.withColumn("cdist_ff",
      when(col("cdist").isNaN, lit(null)).otherwise(col("cdist"))), Seq("cdist_ff"), "frame")
    val cond1 = col("cdist_ff") < p.maxDistance
    val cond2 = col("nh0") > p.maxNoseHeadDistance || col("nh1") > p.maxNoseHeadDistance ||
      col("is0") > p.maxInterspinalDistance || col("is1") > p.maxInterspinalDistance
    val cond3 = col("blob_speed") > p.minBlobSpeed
    val flagged = ff.withColumn("isFight", cond1 && cond2 && cond3)
      .withColumn("isBridge", cond1 && col("isEmpty"))
    // two-phase sessionization with empty-frame bridges (G3)
    val cand = flagged.filter(col("isFight")).select("frame")
    val sess1 = Sessionize.sessionize(cand, "frame", Nil, p.maxFrameGap)
    val kept1 = Sessionize.filterMinSize(sess1, Nil, "session_id", p.minNumFrames + 1)
      .select("frame")
    val union = kept1.withColumn("isCand", lit(true))
      .unionByName(flagged.filter(col("isBridge")).select("frame")
        .withColumn("isCand", lit(false)))
      .dropDuplicates("frame")
    val regrouped = Sessionize.regroupWithBridges(union, "frame", Nil,
      p.maxFrameGapWEmptyFrames, "isCand")
    val evs = Sessionize.filterMinSize(regrouped, Nil, "session_id", p.minNumFrames + 1)
      .groupBy("session_id")
      .agg(min("frame").as("firstF"), max("frame").as("lastF"))
      .select(col("session_id").as("ev"), col("firstF"), col("lastF"))
    // kernel over [firstF−1, lastF]; cleanup arrays exclude the last frame
    val rows = attachSpan(ff, evs, -1L, 0L, kept1)
    rows.groupByKey(_.ev).flatMapGroups { (_, it) =>
      val rs = it.toArray.sortBy(_.frame)
      if (rs.length < 3) Iterator.empty
      else {
        val body = rs.dropRight(1) // reference trims [start−1, end)
        val verdict = Kernels.fightVerdict(
          body.map(_.c0x), body.map(_.c0y), body.map(_.c1x), body.map(_.c1y),
          p.fps, p.cm2px, p.minCentroidSpeed, p.minBothCentroidSpeed)
        verdict.iterator.flatMap { case (ex, ey) =>
          // event timestamps use [firstF, lastF] (the span holds one extra
          // leading frame for the cleanup seed)
          val startUs = rs.find(_.frame == rs.head.firstF).map(_.tsUs).getOrElse(rs.head.tsUs)
          val endUs = rs.last.tsUs
          val dur = (endUs - startUs) / 1e6
          if (dur > 1.0) Iterator(FightEvent(usToTs(startUs), usToTs(endUs), dur, ex, ey))
          else Iterator.empty
        }
      }
    }
  }

  /** Blob-position stream → per-frame smoothed speed (cm/s): W1 lag-diff,
    * dt<10 ms anomaly drop (T5), 10-frame "same"-mode moving average (W4).
    * Reference `social_behaviour_detection.py:579-601`. */
  def blobSpeed(blob: DataFrame, fps: Double, cm2px: Double): DataFrame = {
    val bounds = blob.agg(min(unix_micros(col("time"))).as("t0us"))
    val w = Window.orderBy("time")
    val stepped = blob.na.drop(Seq("x", "y"))
      .withColumn("pt", lag(unix_micros(col("time")), 1).over(w))
      .withColumn("px", lag(col("x"), 1).over(w))
      .withColumn("py", lag(col("y"), 1).over(w))
      .withColumn("dtMs", (unix_micros(col("time")) - col("pt")) / lit(1000.0))
      .filter(col("dtMs") >= 10.0) // drop duplicate/abnormal samples
      .withColumn("speed",
        hypot(col("x") - col("px"), col("y") - col("py")) / col("dtMs") / cm2px * 1000.0)
    val smoothW = Window.orderBy("frame").rowsBetween(-5, 4)
    stepped.crossJoin(broadcast(bounds))
      .withColumn("frame", Cols.frameId(col("time"), col("t0us"), fps))
      .withColumn("blob_speed", sum(col("speed")).over(smoothW) / 10.0)
      .select("frame", "blob_speed")
  }

  /** Tube-test detection end-to-end (reference `detect_tube_tests`,
    * `social_behaviour_detection.py:100-390`). ROI filtering (annulus +
    * exclusion zones) is applied when `roi` is given:
    * (centerX, centerY, innerR, outerR). */
  def detectTubeTests(pose: DataFrame, parts: Map[String, String], p: TubeParams,
      roi: Option[(Double, Double, Double, Double)] = None): Dataset[TubeTestEvent] = {
    val spark = pose.sparkSession
    import spark.implicits._
    val ids = pose.select("identity").distinct().collect().map(_.getString(0)).sorted
    require(ids.length == 2, s"expected exactly 2 identities, got ${ids.length}")
    val feat = withFeatures(wideFrames(pose, parts, p.fps))
    val adj1 = pmod(col("o1") + 180.0, lit(360.0))
    val roiOk: Column = roi match {
      case Some((cx, cy, ri, ro)) =>
        Cols.inAnnulus(nn(col("m0_centroid_x")), nn(col("m0_centroid_y")),
          lit(cx), lit(cy), lit(ri), lit(ro)) &&
          Cols.inAnnulus(nn(col("m1_centroid_x")), nn(col("m1_centroid_y")),
            lit(cx), lit(cy), lit(ri), lit(ro))
      case None => lit(true)
    }
    val startCond = abs(col("o0") - adj1) <= p.angleTolerance &&
      col("cdist") < p.maxDistanceStart &&
      col("rel1") > col("rel0") &&
      col("e_tailtail") > col("e_headhead") && roiOk
    val cand = feat.filter(startCond).select("frame")
    val evs = events(cand, p.maxFrameGap, p.minTubeTestStartFrames)
    val window = math.ceil(p.fps * p.searchWindowSeconds).toLong
    // span [firstF, lastF + window)
    val rows = attachSpan(feat, evs, 0L, window - 1, cand)
    rows.groupByKey(_.ev).flatMapGroups { (_, it) =>
      val rs = it.toArray.sortBy(_.frame)
      if (rs.isEmpty) Iterator.empty
      else {
        val lastStartRel = (rs.head.lastF - rs.head.firstF).toInt
        val verdict = Kernels.tubeVerdict(
          rs.map(_.c0x), rs.map(_.c0y), rs.map(_.c1x), rs.map(_.c1y),
          rs.map(_.o0), rs.map(_.o1), rs.map(_.e2), rs.map(_.e3),
          rs.map(_.cdist), rs.map(_.isCand), lastStartRel,
          p.angleTolerance, p.minDistance, p.maxDistanceEnd, p.movementThreshold)
        verdict.iterator.map { case (endRel, winnerIdx) =>
          TubeTestEvent(usToTs(rs.head.tsUs), usToTs(rs(endRel).tsUs), ids(winnerIdx))
        }
      }
    }
  }
}
