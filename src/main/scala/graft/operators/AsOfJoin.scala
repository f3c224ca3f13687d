package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-in-time) join — the engine primitive the reference uses as
  * `pd.merge_asof(direction=..., tolerance=...)` (SURVEY §2.3 J2; reference
  * `id_model/step3_SLEAP_labelling/composite_video_sleap_labelling_and_evaluating.ipynb`
  * cell 1 and `id_model/step2_composite_videos/generate_composite_quadrant_videos.py:112-118`).
  *
  * Spark has no built-in as-of join, so this composes one from a union + two
  * ordered window scans:
  *
  *   1. Tag left rows (probe) and right rows (build), union them on the key
  *      columns + event time.
  *   2. One window sorted ascending per `by` key: `last(right payload,
  *      ignoreNulls)` over `[unboundedPreceding, currentRow]` gives the
  *      *backward* match; the mirror `first(...)` over
  *      `[currentRow, unboundedFollowing]` with the complementary tie order
  *      gives the *forward* match.
  *   3. `nearest` picks whichever matched timestamp is closer (ties →
  *      backward, matching pandas' documented tie rule).
  *
  * Scale notes: cost is one shuffle on `by` + sort — the same cost profile as
  * a sort-merge join, with no quadratic band expansion. Rows at equal
  * timestamps are resolved deterministically: a right row at exactly the left
  * timestamp matches in both directions (pandas `allow_exact_matches=True`
  * default). Requires non-empty `by` for parallelism; an empty `by` degrades
  * to a single sorted partition (documented, intended only for small dims).
  */
object AsOfJoin {
  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction
  case object Nearest extends Direction

  /** @param left        probe side (each left row gets ≤1 match)
    * @param right       build side
    * @param timeCol     name of the event-time column (must exist both sides)
    * @param by          equi-join keys (partitioning keys; required at scale)
    * @param direction   Backward | Forward | Nearest
    * @param tolerance   max |Δt| as a microsecond count; None = unbounded
    * @param rightSuffix suffix applied to right payload columns that clash
    * @return left rows + right payload columns (null where no match / out of
    *         tolerance) + `_asof_time` (matched right timestamp, null if none)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      timeCol: String,
      by: Seq[String],
      direction: Direction = Backward,
      tolerance: Option[Long] = None,
      rightSuffix: String = "_r"): DataFrame = {

    val leftPayload = left.columns.filterNot(c => c == timeCol || by.contains(c)).toSeq
    val rightPayload0 = right.columns.filterNot(c => c == timeCol || by.contains(c)).toSeq
    val rename = rightPayload0.map { c =>
      c -> (if (leftPayload.contains(c) || by.contains(c)) c + rightSuffix else c)
    }.toMap
    val rightPayload = rightPayload0.map(rename)

    val t = "_asof_t"
    val side = "_asof_side" // 0 = right (build), 1 = left (probe)
    val lTagged = left
      .withColumn(t, col(timeCol))
      .withColumn(side, lit(1))
      .withColumn("_rp", lit(null).cast(structType(right, timeCol, by, rename)))
    val rTagged = right
      .select((by.map(col) ++ Seq(col(timeCol).as(t))) :+
        struct(col(timeCol).as("_t") +: rightPayload0.map(c => col(c).as(rename(c))): _*).as("_rp"): _*)
      .withColumn(side, lit(0))
    // align columns for union
    val unionCols = by ++ Seq(t, side) ++ leftPayload ++ Seq(timeCol, "_rp")
    val lAligned = lTagged.select(unionCols.map(col): _*)
    val rAligned = rTagged
      .withColumns(leftPayload.map(c => c -> lit(null).cast(lTagged.schema(c).dataType)).toMap)
      .withColumn(timeCol, lit(null).cast(lTagged.schema(timeCol).dataType))
      .select(unionCols.map(col): _*)
    val unioned = lAligned.unionByName(rAligned)

    val part = if (by.isEmpty) Window.partitionBy(lit(0)) else Window.partitionBy(by.map(col): _*)
    // backward: right rows sort before left at equal time → visible in frame
    val wBack = part.orderBy(col(t).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: right rows sort after left at equal time → visible in frame
    val wFwd = part.orderBy(col(t).asc, col(side).desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val withMatches = direction match {
      case Backward => unioned.withColumn("_m", last(col("_rp"), ignoreNulls = true).over(wBack))
      case Forward  => unioned.withColumn("_m", first(col("_rp"), ignoreNulls = true).over(wFwd))
      case Nearest =>
        unioned
          .withColumn("_mb", last(col("_rp"), ignoreNulls = true).over(wBack))
          .withColumn("_mf", first(col("_rp"), ignoreNulls = true).over(wFwd))
          .withColumn("_m", {
            val db = abs(unixMicros(col(t)) - unixMicros(col("_mb")("_t")))
            val df_ = abs(unixMicros(col("_mf")("_t")) - unixMicros(col(t)))
            when(col("_mb").isNull, col("_mf"))
              .when(col("_mf").isNull, col("_mb"))
              .when(df_ < db, col("_mf"))
              .otherwise(col("_mb")) // ties → backward, as pandas
          })
    }

    val withinTol: Column = tolerance match {
      case Some(tol) =>
        abs(unixMicros(col("_m")("_t")) - unixMicros(col(t))) <= tol
      case None => lit(true)
    }
    val matched = when(col("_m").isNotNull && withinTol, col("_m"))

    withMatches
      .filter(col(side) === 1)
      .withColumn("_mok", matched)
      .select(
        (by.map(col) ++ Seq(col(timeCol)) ++ leftPayload.map(col) ++
          rightPayload.map(c => col("_mok")(c).as(c)) :+
          col("_mok")("_t").as("_asof_time")): _*)
  }

  /** µs-since-epoch of a column that may be timestamp or numeric. */
  private def unixMicros(c: Column): Column = unix_micros(c)

  private def structType(right: DataFrame, timeCol: String, by: Seq[String],
      rename: Map[String, String]) = {
    import org.apache.spark.sql.types._
    StructType(
      StructField("_t", right.schema(timeCol).dataType) +:
        right.schema.fields
          .filterNot(f => f.name == timeCol || by.contains(f.name))
          .map(f => StructField(rename(f.name), f.dataType, nullable = true)).toSeq)
  }
}
