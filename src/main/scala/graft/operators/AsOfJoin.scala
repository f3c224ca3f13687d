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
  * default). With empty `by` AND no `bucketUs`, the join degrades to a
  * single sorted partition (intended only for small dims); pass `bucketUs`
  * to run the KEYLESS as-of over time buckets instead — per-bucket window
  * passes plus a one-row-per-bucket carry summary (the [[Fill.ffillBucketed]]
  * scheme), exactly equal to the global plan and never sorting the stream on
  * one task.
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
      rightSuffix: String = "_r",
      bucketUs: Option[Long] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {

    val leftPayload = left.columns.filterNot(c => c == timeCol || by.contains(c)).toSeq
    val rightPayload0 = right.columns.filterNot(c => c == timeCol || by.contains(c)).toSeq
    val rename = rightPayload0.map { c =>
      c -> (if (leftPayload.contains(c)) c + rightSuffix else c)
    }.toMap
    // fail fast on a second-order clash: right's c renamed to c+suffix while
    // the left ALREADY has a column of that name would emit two identically
    // named output columns (ambiguous downstream)
    rename.foreach { case (from, to) =>
      require(from == to || !left.columns.contains(to),
        s"asof: renaming right column '$from' to '$to' collides with an " +
          s"existing left column — pass a different rightSuffix")
    }
    val rightPayload = rightPayload0.map(rename)
    // …and on a right-side SELF-collision: right holding both c and c+suffix
    // (with only c clashing) would also emit duplicate names
    require(rightPayload.distinct.length == rightPayload.length,
      s"asof: renamed right columns collide among themselves " +
        s"(${rightPayload.mkString(", ")}) — pass a different rightSuffix")
    // deterministic duplicate resolution: extra RIGHT columns appended to
    // every match ordering, so equal right timestamps within a key resolve
    // to the same row on every run (without them, last()/first() pick
    // whichever duplicate the partition sort emitted adjacent)
    val tieCols: Seq[Column] =
      tieBreak.map(c => col("_rp").getField(rename.getOrElse(c, c)).asc)
    def tieKey(rp: Column, base: Column): Column =
      if (tieBreak.isEmpty) base
      else struct(base +: tieBreak.map(c => rp.getField(rename.getOrElse(c, c))): _*)

    // the resolver binds from the LEFT time type and is applied to the
    // UNIONED time column — a right side of a different kind would be
    // silently coerced by the union (an instant right under an NTZ left
    // shifts by the session tz offset), so a cross-kind pair is rejected
    // loudly like the pre-NTZ code rejected NTZ outright
    val lDt = left.schema(timeCol).dataType
    val rDt = right.schema(timeCol).dataType
    require(graft.functions.Cols.timeCategory(lDt) ==
        graft.functions.Cols.timeCategory(rDt),
      s"asof: time columns disagree in kind — left '$timeCol' is " +
        s"${graft.functions.Cols.timeCategory(lDt)} (${lDt.simpleString}), right is " +
        s"${graft.functions.Cols.timeCategory(rDt)} (${rDt.simpleString}); " +
        "normalize one side (Cols.normalizeNtz / a frame-id projection) before joining")
    val unixMicros: Column => Column = timeKeyFn(lDt)

    val t = "_asof_t"
    val side = "_asof_side" // 0 = right (build), 1 = left (probe)
    val lTagged = left
      .withColumn(t, col(timeCol))
      .withColumn(side, lit(1))
      .withColumn("_rp", lit(null).cast(structType(right, timeCol, by, rename)))
    // right rows with a NULL time can never be a meaningful match (pandas
    // merge_asof raises on null merge keys; we skip them) — keeping them
    // would let a null-sorting-first row become a bogus backward match
    val rTagged = right
      .filter(col(timeCol).isNotNull)
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

    // bucketed keyless path: per-bucket window + tiny carry summary; the
    // carry for bucket k is the boundary right row from the nearest earlier
    // (backward) / later (forward) bucket that has one
    def bucketedMatch(df: DataFrame, outCol: String, backward: Boolean): DataFrame = {
      // right rows sort before (backward) / after (forward) left at equal t
      val ord =
        (if (backward) Seq(col(t).asc, col(side).asc)
         else Seq(col(t).asc, col(side).desc)) ++ tieCols
      val w =
        if (backward)
          Window.partitionBy(col("_ab")).orderBy(ord: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        else
          Window.partitionBy(col("_ab")).orderBy(ord: _*)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val local = df.withColumn("_loc",
        if (backward) last(col("_rp"), ignoreNulls = true).over(w)
        else first(col("_rp"), ignoreNulls = true).over(w))
      val summ = df.filter(col(side) === 0).groupBy(col("_ab"))
        .agg((if (backward) max_by(col("_rp"), tieKey(col("_rp"), unixMicros(col(t))))
              else min_by(col("_rp"), tieKey(col("_rp"), unixMicros(col(t))))).as("_bval"))
      val wS = Window.partitionBy(lit(0))
        .orderBy(if (backward) col("_ab").asc else col("_ab").desc)
        .rowsBetween(Window.unboundedPreceding, -1) // tiny: one row per bucket
      val carry = df.select(col("_ab")).distinct()
        .join(summ, Seq("_ab"), "left")
        .withColumn("_cin", last(col("_bval"), ignoreNulls = true).over(wS))
        .select(col("_ab"), col("_cin"))
      // null-safe bucket join: a left row with a NULL time has a null
      // bucket and must SURVIVE (with a null match), not vanish in an
      // inner equi-join
      local.join(broadcast(carry.withColumnRenamed("_ab", "_cab")),
          col("_ab") <=> col("_cab"))
        .drop("_cab")
        .withColumn(outCol, coalesce(col("_loc"), col("_cin")))
        .drop("_loc", "_cin")
    }

    def nearestOf(mb: Column, mf: Column): Column = {
      val db = abs(unixMicros(col(t)) - unixMicros(mb("_t")))
      val df_ = abs(unixMicros(mf("_t")) - unixMicros(col(t)))
      when(mb.isNull, mf)
        .when(mf.isNull, mb)
        .when(df_ < db, mf)
        .otherwise(mb) // ties → backward, as pandas
    }

    val withMatches = bucketUs match {
      case Some(bu) if by.isEmpty =>
        val dfb = unioned.withColumn("_ab",
          floor(unixMicros(col(t)) / lit(bu)).cast("long"))
        val out = direction match {
          case Backward => bucketedMatch(dfb, "_m", backward = true)
          case Forward  => bucketedMatch(dfb, "_m", backward = false)
          case Nearest =>
            bucketedMatch(bucketedMatch(dfb, "_mb", backward = true),
              "_mf", backward = false)
              .withColumn("_m", nearestOf(col("_mb"), col("_mf")))
        }
        out.drop("_ab")
      case _ =>
        val part = if (by.isEmpty) Window.partitionBy(lit(0))
          else Window.partitionBy(by.map(col): _*)
        // backward: right rows sort before left at equal time → in frame
        val wBack = part.orderBy(Seq(col(t).asc, col(side).asc) ++ tieCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // forward: right rows sort after left at equal time → in frame
        val wFwd = part.orderBy(Seq(col(t).asc, col(side).desc) ++ tieCols: _*)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        direction match {
          case Backward =>
            unioned.withColumn("_m", last(col("_rp"), ignoreNulls = true).over(wBack))
          case Forward =>
            unioned.withColumn("_m", first(col("_rp"), ignoreNulls = true).over(wFwd))
          case Nearest =>
            unioned
              .withColumn("_mb", last(col("_rp"), ignoreNulls = true).over(wBack))
              .withColumn("_mf", first(col("_rp"), ignoreNulls = true).over(wFwd))
              .withColumn("_m", nearestOf(col("_mb"), col("_mf")))
        }
    }

    val withinTol: Column = tolerance match {
      case Some(tol) =>
        abs(unixMicros(col("_m")("_t")) - unixMicros(col(t))) <= tol
      case None => lit(true)
    }
    // a NULL-time left row matches nothing in any direction (its position
    // in time is undefined) — without this gate the forward window / the
    // bucket carry would hand it a bogus match
    val matched = when(col(t).isNotNull && col("_m").isNotNull && withinTol, col("_m"))

    withMatches
      .filter(col(side) === 1)
      .withColumn("_mok", matched)
      .select(
        (by.map(col) ++ Seq(col(timeCol)) ++ leftPayload.map(col) ++
          rightPayload.map(c => col("_mok")(c).as(c)) :+
          col("_mok")("_t").as("_asof_time")): _*)
  }

  /** Order key of a time column that may be timestamp (→ µs since epoch),
    * TIMESTAMP_NTZ (→ wall-clock µs — pandas-default parquet), or integral
    * (frame ids — pass through; `tolerance`/`bucketUs` are then in the
    * column's own units). Fractional types are rejected like
    * [[Sessionize.sessionize]] does: a silent cast-to-long would truncate
    * the tolerance/nearest/bucket math while the window sort stays exact.
    * Bound once per join from the left time column's type. */
  private def timeKeyFn(dt: org.apache.spark.sql.types.DataType): Column => Column =
    graft.functions.Cols.micros(_: Column, dt)

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
