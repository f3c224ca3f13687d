package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the reference's signature grouping operator
  * (SURVEY §2.6 G1-G3; reference
  * `social_behavior_detection/social_behaviour_detection.py:265-273,618-642`
  * splits sorted candidate-frame arrays where `diff > max_gap`).
  *
  * Classic cumulative-sum formulation: a row starts a new session when its
  * gap from the previous row (within the same `by` keys) exceeds `gap`;
  * `session_id` = running count of starts. One shuffle on `by`, one sort —
  * embarrassingly parallel across keys. The streaming flavor of the same
  * semantics is `session_window(col, gap)` (see graft.streaming).
  */
object Sessionize {
  /** Add a `session_id` column (0-based per `by` group, ordered by `orderCol`
    * then `tieBreak`).
    *
    * Both internal windows (the lag and the running sum) share ONE ordering
    * expression including the tiebreak columns, so duplicate `orderCol`
    * values cannot be ordered differently by the two window execs — without
    * this, ties are nondeterministic under parallel execution.
    *
    * @param orderCol   numeric or timestamp column defining order and gaps
    * @param gap        max allowed gap (same units as `orderCol` diffs;
    *                   timestamps are compared in microseconds)
    * @param tieBreak   extra order columns making the sort total (e.g. a row id)
    * @param bucketSize when set (and `by` is empty), sessionize WITHOUT a
    *                   single global sort: rows bucket by
    *                   `floor(order/bucketSize)`, each bucket computes its
    *                   local session-start cumsum against a 1-row ghost from
    *                   the previous bucket, and a one-row-per-bucket summary
    *                   pass supplies each bucket's session-id offset — exact
    *                   equality with the global plan. Use when the keyless
    *                   candidate set can be a significant fraction of the
    *                   stream (multi-week epochs); the plain path is fine for
    *                   sparse candidates. CAUTION: the bucketed form
    *                   references its input plan several times — applied to
    *                   an already-deep lineage, analysis time multiplies;
    *                   cache/checkpoint the input first, or sessionize a
    *                   materialized candidate table.
    */
  def sessionize(
      df: DataFrame,
      orderCol: String,
      by: Seq[String],
      gap: Long,
      sessionCol: String = "session_id",
      tieBreak: Seq[String] = Nil,
      bucketSize: Option[Long] = None): DataFrame = {
    // guard the order type via the shared type-aware µs resolver: a
    // fractional column silently truncated to long would corrupt gap
    // comparisons; NTZ resolves to pure wall-clock micros (a session-tz
    // cast would compress/stretch gaps across DST transitions)
    val ord: Column = graft.functions.Cols.micros(df, orderCol)
    bucketSize.foreach(bs => require(bs > 0, s"bucketSize must be positive, got $bs"))
    bucketSize match {
      case Some(bs) if by.isEmpty =>
        val d0 = df.withColumn("_so", ord)
          .withColumn("_sb", floor(col("_so") / bs).cast("long"))
        val g = Buckets.withGhosts(d0, "_sb", "_so", before = 1, after = 0,
          tieBreak = tieBreak)
        val w = Window.partitionBy(col("_sb"))
          .orderBy((col("_so") +: tieBreak.map(col)).map(_.asc): _*)
        val prev = lag(col("_so"), 1).over(w)
        // ghosts contribute ONLY as lag context; only own rows count starts
        val isNew = when(!col("_ghost") &&
          (prev.isNull || (col("_so") - prev) > gap), 1L).otherwise(0L)
        val cum = g.withColumn("_new", isNew)
          .withColumn("_cum", sum(col("_new"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(!col("_ghost"))
        // tiny: one row per bucket → cumulative start-count offsets
        val wS = Window.partitionBy(lit(0)).orderBy(col("_sb"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val off = cum.groupBy("_sb").agg(max("_cum").as("_tot"))
          .withColumn("_off", coalesce(sum(col("_tot")).over(wS), lit(0L)))
          .select("_sb", "_off")
        cum.join(broadcast(off), "_sb")
          .withColumn(sessionCol, col("_cum") + col("_off") - 1)
          .drop("_sb", "_so", "_new", "_cum", "_off", "_ghost")
      case _ =>
        val part = if (by.isEmpty) Window.partitionBy(lit(0))
          else Window.partitionBy(by.map(col): _*)
        val w = part.orderBy(ord +: tieBreak.map(col): _*)
        val prev = lag(ord, 1).over(w)
        val isNew = when(prev.isNull || (ord - prev) > gap, 1L).otherwise(0L)
        df.withColumn(sessionCol,
          sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
    }
  }

  /** Drop sessions with fewer than `minRows` rows (G2; reference
    * `social_behaviour_detection.py:272-273,625`). Implemented as a windowed
    * count, avoiding a groupBy + semi-join round trip.
    */
  def filterMinSize(
      df: DataFrame,
      by: Seq[String],
      sessionCol: String,
      minRows: Long): DataFrame = {
    val w = Window.partitionBy((by :+ sessionCol).map(col): _*)
    df.withColumn("_sess_n", count(lit(1)).over(w))
      .filter(col("_sess_n") >= minRows)
      .drop("_sess_n")
  }

  /** Two-phase regroup (G3; reference `social_behaviour_detection.py:627-642`):
    * union `candidates` with `bridge` rows (e.g. empty frames near fights),
    * re-sessionize with a stricter gap, and keep only sessions that contain
    * at least one original candidate row.
    *
    * @param flagCol boolean column marking original candidate rows
    */
  def regroupWithBridges(
      union: DataFrame,
      orderCol: String,
      by: Seq[String],
      gap: Long,
      flagCol: String,
      sessionCol: String = "session_id",
      tieBreak: Seq[String] = Nil,
      bucketSize: Option[Long] = None): DataFrame = {
    val sessed = sessionize(union, orderCol, by, gap, sessionCol, tieBreak, bucketSize)
    val w = Window.partitionBy((by :+ sessionCol).map(col): _*)
    sessed
      .withColumn("_has_candidate", max(when(col(flagCol), 1).otherwise(0)).over(w))
      .filter(col("_has_candidate") === 1)
      .drop("_has_candidate")
  }
}
