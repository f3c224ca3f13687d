package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucketed-window plumbing: run fixed-extent window functions over an
  * unbounded ordered stream WITHOUT a single global sort task.
  *
  * The scale problem: `Window.orderBy(time)` with no partitioning sorts the
  * whole stream on ONE task — a 2-week 50 fps epoch is ~1.2 B rows. But a
  * window whose frame extends at most `before` rows back and `after` rows
  * forward only ever needs that many rows across a partition edge. So:
  * bucket the stream on a coarse ordered key (hour/day — the bronze layout
  * grain), replicate each bucket's first `after` and last `before` rows into
  * the neighbor bucket as flagged "ghost" rows, evaluate the window
  * per-bucket (parallel), and drop the ghosts. Results equal the global-sort
  * plan exactly, provided every bucket holds ≥ max(before, after) rows
  * (choose bucket duration ≫ window extent; a 1-hour bucket at 50 fps is
  * 180 000 rows vs extents of ≤ 6 here).
  *
  * For UNBOUNDED lookback (ffill-style) see [[Fill.ffillBucketed]], which
  * pairs a per-bucket pass with a bucket-summary carry-in pass instead of
  * ghost rows.
  */
object Buckets {

  /** Add `_ghost` flag and replicate edge rows into neighbor buckets.
    * After computing the windowed columns with
    * `Window.partitionBy(bucketCol).orderBy(orderCol)`, callers must
    * `filter(!col("_ghost"))`.
    *
    * `bucketCol` is REWRITTEN to a dense rank of the observed bucket values
    * (tiny distinct set — one value per hour/day — broadcast back), so
    * ghosts always land in the next bucket that actually EXISTS: a silent
    * gap longer than a bucket cannot break the context chain.
    *
    * @param before rows of backward context each bucket needs (last `before`
    *               rows of bucket b are copied into b+1)
    * @param after  rows of forward context (first `after` rows of bucket b
    *               are copied into b−1)
    * @param by     extra grouping keys: the bucket chain (dense rank + ghost
    *               replication) is computed independently per `by` group, so
    *               one plan serves many shards. Downstream windows must
    *               partition by `by :+ bucketCol`.
    * @param guardSparse when true, any INTERIOR bucket with fewer than
    *               max(before, after) rows RAISES at execution instead of
    *               letting window results silently diverge from the
    *               global-sort plan near that bucket's edges. (A sparse
    *               interior bucket cannot relay its neighbor's context —
    *               ghosts don't chain across two buckets. First/last
    *               buckets are exempt: with no rows beyond them, their own
    *               rows ARE the complete context.)
    */
  def withGhosts(df: DataFrame, bucketCol: String, orderCol: String,
      before: Int, after: Int, tieBreak: Seq[String] = Nil,
      by: Seq[String] = Nil, guardSparse: Boolean = false): DataFrame = {
    // tiny table: one row per occupied (group, bucket)
    val wPart =
      if (by.isEmpty) Window.partitionBy(lit(0)) else Window.partitionBy(by.map(col): _*)
    val wIdx = wPart.orderBy(col(bucketCol))
    val mapping = df.groupBy((by :+ bucketCol).map(col): _*)
      .agg(count(lit(1)).as("_bn"))
      .withColumn("_bidx", row_number().over(wIdx).cast("long"))
      .withColumn("_bmax", max(col("_bidx")).over(
        wPart.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // NULL-SAFE key join: a using-join drops rows with a null bucket
    // (null orderCol upstream) or null by-key, which the plain
    // window-partition path keeps as their own partition — the bucketed
    // form must not silently lose them (groupBy above already treats null
    // as a group, so the mapping row exists)
    val mKeys = by :+ bucketCol
    val mappingR = mKeys.foldLeft(mapping)((d, k) =>
      d.withColumnRenamed(k, s"_mk_$k"))
    val joined = df.join(broadcast(mappingR),
        mKeys.map(k => col(k) <=> col(s"_mk_$k")).reduce(_ && _))
      .drop(mKeys.map(k => s"_mk_$k"): _*)
    val guarded =
      if (!guardSparse) joined
      else {
        val extent = math.max(before, after)
        val bad =
          col("_bn") < extent && col("_bidx") > 1L && col("_bidx") < col("_bmax")
        joined.withColumn("_bidx", when(bad,
          raise_error(format_string(
            s"withGhosts: bucket %s holds only %s rows — fewer than the window " +
              s"extent (before=$before, after=$after); bucketed window results " +
              "would silently diverge from the global plan. Use a coarser bucket.",
            col(bucketCol).cast("string"), col("_bn").cast("string"))).cast("long"))
          .otherwise(col("_bidx")))
      }
    val dense = guarded
      .withColumn(bucketCol, col("_bidx")).drop("_bidx", "_bn", "_bmax")
    val part = (by :+ bucketCol).map(col)
    val wAsc = Window.partitionBy(part: _*)
      .orderBy((col(orderCol) +: tieBreak.map(col)).map(_.asc): _*)
    val wDesc = Window.partitionBy(part: _*)
      .orderBy((col(orderCol) +: tieBreak.map(col)).map(_.desc): _*)
    val tagged = dense
      .withColumn("_rnA", row_number().over(wAsc))
      .withColumn("_rnD", row_number().over(wDesc))
    val own = tagged.withColumn("_ghost", lit(false))
    val toNext =
      if (before > 0)
        Seq(tagged.filter(col("_rnD") <= before)
          .withColumn(bucketCol, col(bucketCol) + 1)
          .withColumn("_ghost", lit(true)))
      else Nil
    val toPrev =
      if (after > 0)
        Seq(tagged.filter(col("_rnA") <= after)
          .withColumn(bucketCol, col(bucketCol) - 1)
          .withColumn("_ghost", lit(true)))
      else Nil
    (Seq(own) ++ toNext ++ toPrev).reduce(_ unionByName _)
      .drop("_rnA", "_rnD")
  }

  /** Dense integer spine 0..maxVal as a DISTRIBUTED table: chunk starts are
    * exploded first and repartitioned, so no single task materializes the
    * whole range (a 2-week epoch is 60 M frames; `explode(sequence(0, maxF))`
    * off a 1-row aggregate would generate them all in one task).
    *
    * Any column of `maxDf` other than `maxCol` (e.g. a shard key) is carried
    * through to every generated row — one input row per group yields that
    * group's own 0..max spine.
    *
    * @param maxDf DataFrame holding the inclusive max in `maxCol`, one row
    *              per desired spine (a 1-row aggregate for a single stream)
    */
  def densifiedRange(maxDf: DataFrame, maxCol: String, outCol: String,
      chunk: Long = 1L << 18): DataFrame = {
    // explicit partition count: AQE would coalesce the (tiny) chunk-start
    // shuffle to 1 partition and re-serialize the whole explode on one task
    val par = maxDf.sparkSession.sparkContext.defaultParallelism
    val carry = maxDf.columns.filterNot(_ == maxCol).toSeq
    maxDf
      .select(carry.map(col) ++ Seq(col(maxCol).as("_maxV"),
        explode(sequence(lit(0L), col(maxCol), lit(chunk))).as("_c0")): _*)
      .repartition(par, (carry :+ "_c0").map(col): _*)
      .select(carry.map(col) :+ explode(sequence(col("_c0"),
        least(col("_c0") + (chunk - 1), col("_maxV")))).as(outCol): _*)
  }
}
