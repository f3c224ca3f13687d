package graft.combine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols
import graft.operators.{Assignment, BandJoin}

/** The reference's primary ETL — combining pose and identity streams
  * (`pose_id_combine/step2_combining_SLEAP_predictions/combine_pose_id_chunk.py:201-331`)
  * — as a reusable Spark pipeline:
  *
  *   quad-camera identity streams → homography projection to arena-top
  *   coordinates → union → anchor filter → fps grid (sequence+explode) →
  *   tolerance band join of both streams onto grid ticks → per-tick optimal
  *   assignment (cost = −identity_likelihood, gated on pixel distance) →
  *   update-join writeback onto the full pose stream → drop unmatched.
  *
  * Where the reference parallelizes per minute with joblib
  * (`combine_pose_id_chunk.py:145-161`), this pipeline shuffles on the grid
  * tick — the same parallelism without the manual minute bucketing, and it
  * scales with the cluster rather than one node's cores.
  */
object Combine {

  /** @param fps          camera rate; grid period = 1/fps, tolerance = 1/(4·fps)
    * @param maxDistance  feasibility gate in projected px (reference 40 px)
    */
  case class Params(fps: Double = 50.0, maxDistance: Double = 40.0)

  /** Project per-camera identity streams into arena-top coordinates with
    * each camera's 3×3 homography and union them (reference `:261-274`).
    * Streams carry (time, identity, identity_likelihood, part, x, y).
    */
  def projectAndUnion(quadStreams: Seq[(DataFrame, Seq[Double])],
      anchorPart: String = "anchor"): DataFrame =
    quadStreams.map { case (df, h) =>
      df.filter(col("part").contains(anchorPart))
        .withColumn("x_top", Cols.homographyX(h, col("x"), col("y")))
        .withColumn("y_top", Cols.homographyY(h, col("x"), col("y")))
        .drop("x", "y")
    }.reduce(_.unionByName(_))

  /** Fixed-frequency grid ticks spanning the pose stream (reference
    * `:309-314`), derived with one aggregation — no driver-side scalar scan,
    * and chunked two-level explode so no single task materializes a
    * multi-week grid (60 M ticks for a 2-week epoch at 50 fps).
    */
  def ticks(pose: DataFrame, fps: Double): DataFrame = {
    val periodUs = math.round(1e6 / fps)
    val step = periodUs * (1L << 18)
    val par = pose.sparkSession.sparkContext.defaultParallelism
    val tUs = Cols.micros(pose, "time")
    pose.agg(min(tUs).as("t0"), max(tUs).as("t1"))
      .select(col("t1"), explode(sequence(col("t0"), col("t1"), lit(step))).as("c0"))
      .repartition(par, col("c0"))
      .select(explode(sequence(col("c0"),
        least(col("c0") + (step - periodUs), col("t1")), lit(periodUs))).as("tick_us"))
      .select(timestamp_micros(col("tick_us")).as("tick"))
  }

  /** Combine one chunk: overwrite pose anchors' identities with the
    * optimally-assigned identity detections, then keep only matched poses
    * (reference `:309-331` + P8 drop at `:319`).
    *
    * @param pose  pose stream: (time, pose_id, part, x, y) — `pose_id`
    *              identifies a pose instance (all parts of one animal at one
    *              timestamp); anchor rows have `part` containing `anchorPart`
    * @param ids   projected identity stream: (time, identity,
    *              identity_likelihood: map[string,double], x_top, y_top)
    * @return pose columns + (identity, identity_likelihood) for matched
    *         pose instances
    */
  def combineChunk(poseRaw: DataFrame, idsRaw: DataFrame, p: Params,
      anchorPart: String = "anchor"): DataFrame = {
    // chunk parquet written by the reference's own pipeline is
    // pandas-default NTZ (`combine_pose_id_chunk.py:324-331`) — normalize
    // at the entry so band-join micros and grid ticks line up
    val pose = Cols.normalizeNtz(poseRaw)
    val ids = Cols.normalizeNtz(idsRaw)
    val tolUs = math.round(1e6 / (4 * p.fps))
    val grid = ticks(pose, p.fps)
    // anchors of each pose instance onto their grid tick (±tol band)
    val anchors = pose.filter(col("part").contains(anchorPart))
      .select(col("time").as("p_time"), col("pose_id"),
        col("x").as("px"), col("y").as("py"))
    val pj = BandJoin.bandJoin(grid, anchors, "tick", "p_time", Nil, -tolUs, tolUs)
    // identity detections onto their tick
    val idj = BandJoin.bandJoin(grid,
      ids.select(col("time").as("i_time"), col("identity"),
        col("identity_likelihood"), col("x_top"), col("y_top")),
      "tick", "i_time", Nil, -tolUs, tolUs)
    // candidate pairs: distance-gated, cost = −likelihood[predicted id]
    // (reference `:83-134`); infeasible pairs keep the entities visible to
    // the J4 singleton epilogue via +∞ cost
    val dist = Cols.euclidean(col("px"), col("py"), col("x_top"), col("y_top"))
    val pairs = pj.join(idj, "tick")
      .withColumn("cost",
        when(dist <= p.maxDistance,
          -coalesce(element_at(col("identity_likelihood"), col("identity")), lit(0.0)))
          .otherwise(lit(Double.PositiveInfinity)))
    val matched = Assignment.assign(pairs, Seq("tick"), "pose_id", "identity",
      "cost", inferSingletons = true)
    // J5 update-join writeback: all parts of a matched pose instance get the
    // assigned identity + the matched detection's likelihood map; unmatched
    // instances drop (P8). Inferred J4 singleton pairs have no verified
    // detection pairing → null map, as the reference writes a
    // NaN-likelihood map (`combine_pose_id_chunk.py:141`).
    // The matched detection is recovered from the CANDIDATE PAIR rows (not
    // the raw detection table): joining matched back to `pairs` on
    // (tick, pose_id, identity) with pair-cost == matched-cost selects
    // exactly the feasible detections the solver's min-cost cell came from —
    // an infeasible (dist > maxDistance) duplicate carries cost +∞ and can
    // never equal a finite matched cost, so its likelihood map cannot leak
    // in even when its likelihood VALUE is bit-equal. Bit-equal feasible
    // duplicates share a deterministic position tiebreak.
    val cand = pairs.select(col("tick"), col("pose_id"), col("identity"),
      col("cost").as("_pc"), col("identity_likelihood"), col("x_top"), col("y_top"))
    val withLik = matched
      .join(cand, Seq("tick", "pose_id", "identity"), "left")
      .withColumn("_costOk", col("cost").isNotNull && col("_pc") === col("cost"))
      .groupBy("tick", "identity", "pose_id", "cost")
      .agg(max_by(when(col("_costOk"), col("identity_likelihood")),
        struct(col("_costOk"), col("x_top"), col("y_top"))).as("_mlik0"))
      .select(col("pose_id"), col("identity").as("_mid"),
        when(col("cost").isNotNull, col("_mlik0")).as("_mlik"))
    pose
      .join(withLik, Seq("pose_id"))
      .withColumn("identity", col("_mid"))
      .withColumn("identity_likelihood", col("_mlik"))
      .drop("_mid", "_mlik")
  }
}
