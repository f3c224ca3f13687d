package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Null-run filling — SURVEY §2.5 W3/W6/W7.
  *
  * `ffill` reproduces pandas `DataFrame.ffill()` (reference
  * `social_behavior_detection/social_behaviour_detection.py:565`), i.e.
  * carry the last non-null value forward within a `by` group.
  *
  * `boundedFill` reproduces the reference's conservative gap bridge
  * (`id_model/step2_composite_videos/generate_composite_quadrant_videos.py:120-157`):
  * fill a null run only when the run is shorter than `maxRun` rows AND the
  * values on both sides of the run are equal — otherwise leave the run null.
  */
object Fill {
  private def part(by: Seq[String]) =
    if (by.isEmpty) Window.partitionBy(lit(0)) else Window.partitionBy(by.map(col): _*)

  /** Forward-fill `cols` ordered by `orderCol` (+ `tieBreak` for a total
    * order under duplicate timestamps) within `by` groups. */
  def ffill(df: DataFrame, cols: Seq[String], orderCol: String, by: Seq[String] = Nil,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = part(by).orderBy((orderCol +: tieBreak).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Scale-safe forward fill over a numeric order column: exact [[ffill]]
    * semantics with NO single-partition sort. Rows are bucketed by
    * `floor(orderCol / bucketSize)`; each bucket ffills independently
    * (parallel), then a bucket-summary table (one row per bucket — thousands
    * of rows for a multi-week epoch, vs billions of stream rows) computes
    * each bucket's carry-in value with an ordinary cumulative window, and a
    * broadcast join fills each bucket's leading null run. Two shuffles
    * total, both partitioned.
    */
  def ffillBucketed(df: DataFrame, cols: Seq[String], orderCol: String,
      bucketSize: Long, by: Seq[String] = Nil,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    val d0 = df.withColumn("_fb", floor(col(orderCol) / bucketSize))
    val keys = by :+ "_fb"
    // tieBreak makes the order total under duplicate orderCol values — the
    // in-bucket window and the carry summary below use the SAME (order,
    // tieBreak) ranking, so the fill is deterministic and bucket-alignment-
    // independent (without it, duplicate order keys fill with whichever
    // row the partition iterator saw last)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((orderCol +: tieBreak).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = cols.foldLeft(d0)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    // per-bucket last non-null value per column: max of (order, tieBreak…,
    // value) structs over non-null rows — deterministic, one tiny row per
    // bucket, same ranking as the window above
    def summStruct(c: String) = struct(
      (col(orderCol).as("o") +:
        tieBreak.zipWithIndex.map { case (t, i) => col(t).as(s"t$i") }) :+
        col(c).as("v"): _*)
    val summ = d0.groupBy(keys.map(col): _*)
      .agg(max(when(col(cols.head).isNotNull, summStruct(cols.head)))
          .as(s"_s_${cols.head}"),
        cols.tail.map(c => max(when(col(c).isNotNull, summStruct(c)))
          .as(s"_s_$c")): _*)
    // carry-in per bucket = most recent preceding bucket's last non-null
    // tiny table (one row per bucket): a single-partition window is fine here
    val wS = part(by).orderBy(col("_fb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = summ.select((keys.map(col) ++ cols.map(c =>
      last(col(s"_s_$c"), ignoreNulls = true).over(wS).getField("v")
        .as(s"_carry_$c"))): _*)
    // NULL-SAFE key join: a using-join would silently DROP rows whose
    // by-key or bucket (null orderCol) is null, where the plain ffill
    // keeps them as their own window partition — the bucketed form must
    // not lose rows the exact form retains
    val carryR = keys.foldLeft(carry)((d, k) => d.withColumnRenamed(k, s"_ck_$k"))
    val joined = local.join(broadcast(carryR),
        keys.map(k => col(k) <=> col(s"_ck_$k")).reduce(_ && _))
      .drop(keys.map(k => s"_ck_$k"): _*)
    cols.foldLeft(joined)((d, c) =>
        d.withColumn(c, coalesce(col(c), col(s"_carry_$c"))))
      .drop("_fb" +: cols.map(c => s"_carry_$c"): _*)
  }

  /** Scale-safe backward fill: [[ffillBucketed]] over the negated order
    * (exact [[bfill]] semantics, no single-partition sort). `tieBreak`
    * columns are negated along with the order column so duplicates resolve
    * to the same row the plain [[bfill]] picks; numeric tie-breaks only. */
  def bfillBucketed(df: DataFrame, cols: Seq[String], orderCol: String,
      bucketSize: Long, by: Seq[String] = Nil,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val neg = "_neg_" + orderCol
    val negTies = tieBreak.map("_neg_" + _)
    val negated = tieBreak.foldLeft(df.withColumn(neg, -col(orderCol)))(
      (d, t) => d.withColumn("_neg_" + t, -col(t)))
    ffillBucketed(negated, cols, neg, bucketSize, by, tieBreak = negTies)
      .drop(neg +: negTies: _*)
  }

  /** Backward-fill (mirror of ffill). */
  def bfill(df: DataFrame, cols: Seq[String], orderCol: String, by: Seq[String] = Nil,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = part(by).orderBy((orderCol +: tieBreak).map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cols.foldLeft(df)((d, c) => d.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
  }

  /** Fill null runs of length < `maxRun` whose flanking values agree.
    * Output column `filledCol` (default: overwrite `valueCol`).
    *
    * `strict = true` reproduces the reference's compat behavior
    * (`generate_composite_quadrant_videos.py:157`): any null run that
    * CANNOT be filled — too long, flanks disagree, or no leading value —
    * raises at execution instead of staying null. The check runs
    * distributed (a conditional `raise_error` in the fill expression), so
    * the first offending partition fails the job with the gap's order key
    * in the message.
    */
  def boundedFill(
      df: DataFrame,
      valueCol: String,
      orderCol: String,
      by: Seq[String] = Nil,
      maxRun: Long,
      filledColOpt: Option[String] = None,
      strict: Boolean = false,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val filledCol = filledColOpt.getOrElse(valueCol)
    val v = col(valueCol)
    // tieBreak totalizes the order under duplicate keys; without it the
    // flank values (and so fillability) can flip between runs
    val wOrd = part(by).orderBy((orderCol +: tieBreak).map(col): _*)
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = wOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // run id: count of non-null rows seen so far → constant across a null run
    val runId = sum(when(v.isNotNull, 1L).otherwise(0L)).over(wPrev)
    val tagged = df
      .withColumn("_prev_v", last(v, ignoreNulls = true).over(wPrev))
      .withColumn("_next_v", first(v, ignoreNulls = true).over(wNext))
      .withColumn("_run", when(v.isNull, runId))
    val wRun = Window.partitionBy((by.map(col) :+ col("_run")): _*)
    val runLen: Column = count(lit(1)).over(wRun)
    val unfilled: Column =
      if (strict)
        raise_error(format_string(
          s"boundedFill: unfillable null run (>= $maxRun rows, disagreeing " +
            s"flanks, or no leading value) at $orderCol=%s",
          col(orderCol).cast("string")))
          .cast(df.schema(valueCol).dataType)
      else v
    tagged
      .withColumn(filledCol,
        when(v.isNotNull, v)
          .when(col("_run").isNotNull && runLen < maxRun &&
            col("_prev_v").isNotNull && col("_prev_v") === col("_next_v"), col("_prev_v"))
          .otherwise(unfilled))
      .drop("_prev_v", "_next_v", "_run")
  }
}
