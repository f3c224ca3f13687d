package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Quadrant-camera selection for composite videos — the reference's
  * position→FOV analytics (`id_model/step2_composite_videos/
  * generate_composite_quadrant_videos.py:224-339`), re-expressed as pure
  * column math + one per-timestamp aggregation:
  *
  *   1. each quadrant camera's FOV = its image corners pushed through the
  *      camera homography ([[fovCorners]], reference `get_transformed_corners`);
  *   2. per position: `possible_quadrants` = FOVs containing the point
  *      (convex point-in-polygon, `find_quadrants_for_positions`), falling
  *      back to the nearest FOV center when none contains it
  *      (`find_closest_quadrant`);
  *   3. `most_central` = the possible quadrant whose FOV center is nearest
  *      (`find_most_central_quadrant`);
  *   4. per timestamp over both mice (`determine_quadrant_camera`): the
  *      common possible quadrants decide — singleton wins; two-way
  *      most-central ties break DETERMINISTICALLY by a seeded hash of the
  *      timestamp (the reference uses unseeded `random.choice`; an engine
  *      must be replayable — SURVEY §7.4 risk 5); no common quadrant →
  *      each mouse's most-central.
  *
  * Everything until step 4 is codegen'd column arithmetic; step 4 is one
  * `groupBy(time)` aggregation — shuffle on timestamp, no driver loops.
  */
object Quadrants {

  /** FOV corner quadrilateral in arena-top space: image corners through the
    * 3×3 homography (row-major), normalized, ordered TL,TR,BR,BL. */
  def fovCorners(h: Seq[Double], width: Int, height: Int): Seq[(Double, Double)] = {
    val corners = Seq((0.0, 0.0), (0.0, height - 1.0), (width - 1.0, 0.0),
      (width - 1.0, height - 1.0))
    val projected = corners.map { case (x, y) =>
      val w = h(6) * x + h(7) * y + h(8)
      ((h(0) * x + h(1) * y + h(2)) / w, (h(3) * x + h(4) * y + h(5)) / w)
    }
    val sorted = projected.sortBy(p => (p._1, p._2))
    val Seq(topLeft, bottomLeft) = sorted.take(2).sortBy(_._2)
    val Seq(topRight, bottomRight) = sorted.drop(2).sortBy(_._2)
    Seq(topLeft, topRight, bottomRight, bottomLeft)
  }

  def fovCenter(corners: Seq[(Double, Double)]): (Double, Double) =
    (corners.map(_._1).sum / corners.length, corners.map(_._2).sum / corners.length)

  /** Add `possible_quadrants` (array<int> — RAW membership, empty when the
    * point is outside every FOV; the selection cascade intersects this raw
    * set, like the reference) and `most_central_quadrant` (int — nearest
    * FOV center among the possibles, falling back to the globally nearest
    * FOV when the point is outside all of them) to a positions table.
    * `fovs` = one corner quadrilateral per quadrant camera, index = id.
    */
  def withQuadrants(df: DataFrame, xCol: String, yCol: String,
      fovs: Seq[Seq[(Double, Double)]]): DataFrame = {
    require(fovs.nonEmpty, "withQuadrants needs at least one FOV")
    // the staged columns below REPLACE same-named caller columns via
    // withColumns and are dropped at the end — a caller column with one
    // of these names would be silently destroyed; refuse instead
    val stagingNames = fovs.indices.flatMap(i =>
      Seq(s"__q_in$i", s"__q_d$i", s"__q_m$i")) :+ "__q_dmin"
    val clash = df.columns.toSet.intersect(stagingNames.toSet)
    require(clash.isEmpty,
      s"withQuadrants: input columns ${clash.mkString(", ")} collide with " +
        "internal staging names (__q_in*/__q_d*/__q_m*/__q_dmin) — rename " +
        "them before calling")
    // least() demands >= 2 children (AnalysisException otherwise), so a
    // single-FOV rig degenerates to the lone candidate
    def leastOf(cands: Seq[Column]): Column =
      if (cands.size == 1) cands.head else least(cands: _*)
    val x = col(xCol); val y = col(yCol)
    val centers = fovs.map(fovCenter)

    // TWO-STAGE PROJECTION, deliberately: stage 1 lands each polygon test
    // and each squared distance in its OWN column; stage 2 consumes them
    // as plain attribute references. Inlining everything into one
    // projection re-evaluates every polygon test ~10× (no source-level
    // CSE) and — the real killer — the generated Java for the single
    // projection exceeded Janino's 64 KB method limit, so Spark SILENTLY
    // fell back to interpreted evaluation for the whole stage (GeoProbe:
    // 14 s/1M rows; zero WholeStageCodegen spans, "Code grows beyond
    // 64 KB" in the codegen log). CollapseProject will NOT undo this
    // split: each staged alias is non-trivial and referenced more than
    // once, which its cost guard refuses to duplicate. Both projections
    // stay in one codegen stage — no shuffle, no materialization.
    val inCols = fovs.indices.map(i => s"__q_in$i")
    val dCols = fovs.indices.map(i => s"__q_d$i")
    val staged = df.withColumns(
      fovs.indices.map(i => inCols(i) ->
        Cols.inConvexPolygon(x, y, fovs(i))).toMap ++
      fovs.indices.map { i =>
        val (cx, cy) = centers(i)
        dCols(i) -> ((x - cx) * (x - cx) + (y - cy) * (y - cy))
      }.toMap)
    val inside: Seq[Column] = inCols.map(col)
    val d2: Seq[Column] = dCols.map(col)

    // membership array without higher-order functions: flatten over
    // singleton/empty arrays keeps the expression codegen-able, where
    // filter(array(...), isNotNull) is a CodegenFallback lambda
    val possible = flatten(array(fovs.indices.map(i =>
      when(inside(i), array(lit(i))).otherwise(array().cast("array<int>"))
    ): _*))

    // most-central as PURE DOUBLE MATH (no per-row structs): mask each
    // candidate's squared distance to +MaxValue unless the point is inside
    // that FOV — or inside none, in which case all unmask (the globally-
    // nearest fallback) — then take least() of the masked distances and
    // recover the index with a linear first-match CASE chain (ties break
    // to the lower index, exactly the lexicographic (d, q) struct order
    // this replaces; identical masked-distance algebra to the SQL
    // oracle). The struct-least form built and compared 2×|fovs|
    // (double, int) structs per row — measured 10× the cost of the plain
    // column math at sf1.
    val noneInside = !inside.reduce(_ || _)
    // masked distances and their min are staged as columns as well: the
    // first-match chain would otherwise re-evaluate the whole least()
    // per CASE arm (measured 5.4 s vs 0.6 s per 1M rows for the inlined
    // form) — as attributes, each arm is one double compare
    val mCols = fovs.indices.map(i => s"__q_m$i")
    val staged2 = staged.withColumns(
      fovs.indices.map(i => mCols(i) ->
        when(noneInside || inside(i), d2(i)).otherwise(lit(Double.MaxValue))
      ).toMap)
      .withColumn("__q_dmin", leastOf(mCols.map(col)))
    val masked: Seq[Column] = mCols.map(col)
    val dMin = col("__q_dmin")
    val mostCentral = fovs.indices.init.foldRight(lit(fovs.size - 1): Column)(
      (i, rest) => when(masked(i) === dMin, lit(i)).otherwise(rest))
    // missing coordinates (null or NaN) must propagate as null, like the
    // reference's NaN rows — otherwise the nearest-FOV reduce's
    // keep-a-on-null-comparison behavior silently resolves every missing
    // position to quadrant 0 and casts a phantom camera vote
    val coordsOk = x.isNotNull && y.isNotNull && !isnan(x) && !isnan(y)
    staged2.withColumn("possible_quadrants",
        when(coordsOk, possible).otherwise(array().cast("array<int>")))
      // membership COUNT as pure codegen'd math: consumers that only need
      // the count (geo3) never touch the array column, so Catalyst prunes
      // the array expression out of their plan entirely
      .withColumn("n_possible_quadrants",
        when(coordsOk, inside.map(_.cast("int")).reduce(_ + _))
          .otherwise(lit(0)))
      .withColumn("most_central_quadrant",
        when(coordsOk, mostCentral.cast("int")))
      .drop(inCols ++ dCols ++ mCols :+ "__q_dmin": _*)
  }

  /** Per-timestamp selection over both mice (reference
    * `determine_quadrant_camera`). Output: (timeCol, selected_quadrants:
    * array<int>, selected_cameras: array<string>).
    *
    * @param cameraNames quadrant index → camera name
    * @param seed        tie-break seed (two-way most-central ties)
    */
  def selectQuadrant(withQ: DataFrame, timeCol: String,
      cameraNames: Seq[String], seed: Long = 42L): DataFrame = {
    val grouped = withQ.groupBy(col(timeCol))
      .agg(
        // common = quadrants possible for EVERY mouse at the timestamp;
        // fewer than 2 mice → no common (the reference's None)
        aggregate(collect_list(col("possible_quadrants")),
          lit(null).cast("array<int>"),
          (acc, cur) => when(acc.isNull, cur).otherwise(array_intersect(acc, cur)))
          .as("_common0"),
        count(lit(1)).as("_n"),
        collect_list(col("most_central_quadrant")).as("_centrals"))
      .withColumn("_common", when(col("_n") < 2,
        array().cast("array<int>")).otherwise(col("_common0")))
    val centralsDistinct = array_sort(array_distinct(col("_centrals")))
    val inter = array_sort(array_intersect(centralsDistinct, col("_common")))
    // all modes of _centrals, ascending (pandas .mode() semantics)
    def countOf(q: Column): Column = size(filter(col("_centrals"), c => c === q))
    val maxCount = array_max(transform(centralsDistinct, countOf(_)))
    val modes = filter(centralsDistinct, q => countOf(q) === maxCount)
    val pick2 = element_at(inter,
      (pmod(hash(col(timeCol), lit(seed)), lit(2)) + 1).cast("int"))
    val selected =
      when(size(col("_common")) === 0, centralsDistinct)
        .when(size(col("_common")) === 1, col("_common"))
        .when(size(inter) === 1, inter)
        .when(size(inter) === 2, array(pick2))
        .otherwise(modes)
    val camMap = map(cameraNames.zipWithIndex
      .flatMap { case (n, i) => Seq(lit(i), lit(n)) }: _*)
    grouped
      .withColumn("selected_quadrants", selected)
      .withColumn("selected_cameras",
        transform(col("selected_quadrants"), q => element_at(camMap, q)))
      .select(col(timeCol), col("selected_quadrants"), col("selected_cameras"))
  }
}
