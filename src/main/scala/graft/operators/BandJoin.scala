package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tolerance (band) time join — SURVEY §2.3 J1; reference
  * `pose_id_combine/step2_combining_SLEAP_predictions/combine_pose_id_chunk.py:49,66-68,309-314`
  * selects, for each grid timestamp t, the stream rows with
  * `time ∈ [t+lower, t+upper]`.
  *
  * A naive theta-join (`r.time BETWEEN l.time+lower AND l.time+upper`) plans
  * as BroadcastNestedLoop / cartesian at scale. This implementation converts
  * the band to an equi-join:
  *
  *   - bucket width B = (upper − lower), so each *right* row lands in exactly
  *     one bucket `floor(rt / B)` while each *left* interval
  *     `[lt+lower, lt+upper]` spans at most 2 consecutive buckets;
  *   - explode the left side to its covered bucket ids (≤2 rows);
  *   - equi-join on (by ++ bucket), then apply the exact band predicate.
  *
  * Each qualifying pair appears exactly once (the right row's single bucket),
  * so no dedup pass is needed. Cost: one shuffle keyed by (by, bucket) —
  * hash-partitionable, AQE-skew-splittable, and broadcastable when one side
  * is small. This is the shape that survives 100 TB; the naive form does not.
  */
object BandJoin {
  /** Keep (l, r) pairs with `unix_micros(r.time) − unix_micros(l.time)` in
    * `[lowerUs, upperUs]`, equi-matched on `by`.
    *
    * @param leftTime/rightTime  timestamp column names
    * @param lowerUs/upperUs     band bounds in microseconds (lower ≤ upper)
    * @param rightSuffix         suffix for clashing right column names
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      by: Seq[String] = Nil,
      lowerUs: Long,
      upperUs: Long,
      rightSuffix: String = "_r"): DataFrame = {
    require(lowerUs <= upperUs, s"band [$lowerUs, $upperUs] is empty")
    val width = math.max(upperUs - lowerUs, 1L)

    // type-aware µs resolution: instant timestamp, TIMESTAMP_NTZ
    // (pandas-default parquet), or integral frame-ids all join — but only
    // against the SAME category on the other side (epoch micros vs frame
    // counts vs wall micros silently never land in the band)
    val lDt = left.schema(leftTime).dataType
    val rDt = right.schema(rightTime).dataType
    require(graft.functions.Cols.timeCategory(lDt) ==
        graft.functions.Cols.timeCategory(rDt),
      s"bandJoin: time columns disagree in kind — left '$leftTime' is " +
        s"${graft.functions.Cols.timeCategory(lDt)} (${lDt.simpleString}), right " +
        s"'$rightTime' is ${graft.functions.Cols.timeCategory(rDt)} " +
        s"(${rDt.simpleString}); normalize one side (Cols.normalizeNtz / " +
        "a frame-id projection) before joining")
    val lMicros = graft.functions.Cols.micros(_: Column, lDt)
    val rMicros = graft.functions.Cols.micros(_: Column, rDt)

    val lt = lMicros(col(leftTime))
    val bucketLo = floor((lt + lowerUs) / width)
    val bucketHi = floor((lt + upperUs) / width)
    val lExp = left
      .withColumn("_band_bucket", explode(sequence(bucketLo, bucketHi)))

    val clashes = left.columns.toSet
    val rRenamed = right.columns.foldLeft(right) { (df, c) =>
      if (clashes.contains(c)) {
        // fail fast on a second-order clash (left already owns c+suffix)
        require(!clashes.contains(c + rightSuffix),
          s"bandJoin: renaming right column '$c' to '${c + rightSuffix}' " +
            "collides with an existing left column — pass a different rightSuffix")
        df.withColumnRenamed(c, c + rightSuffix)
      } else df
    }
    // …and on a right-side SELF-collision (right holds both c and c+suffix
    // with only c clashing): duplicate output names are ambiguous downstream
    require(rRenamed.columns.distinct.length == rRenamed.columns.length,
      s"bandJoin: renamed right columns collide among themselves " +
        s"(${rRenamed.columns.mkString(", ")}) — pass a different rightSuffix")
    val rTime = if (clashes.contains(rightTime)) rightTime + rightSuffix else rightTime
    val rBy = by.map(c => if (clashes.contains(c)) c + rightSuffix else c)
    val rExp = rRenamed.withColumn("_band_bucket", floor(rMicros(col(rTime)) / width))

    val keyCond: Column = by.zip(rBy).foldLeft(lExp("_band_bucket") === rExp("_band_bucket")) {
      case (acc, (lc, rc)) => acc && lExp(lc) === rExp(rc)
    }
    val delta = rMicros(rExp(rTime)) - lMicros(lExp(leftTime))
    lExp.join(rExp, keyCond && delta >= lowerUs && delta <= upperUs, "inner")
      .drop("_band_bucket")
  }
}
