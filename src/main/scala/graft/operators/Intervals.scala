package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment/maintenance interval construction and exclusion — the
  * reference's `get_experiment_times` / `exclude_maintenance_data`
  * (`social_behavior_detection/social_behaviour_detection.py:764-878`):
  * pair alternating environment states into [start, stop] experiment
  * intervals, with sentinel padding at the range edges, then keep only data
  * rows inside some interval.
  *
  * The env-state stream is metadata-scale (a row per mode toggle — dozens
  * for a multi-week experiment), so its single-partition windows are
  * intentional; the *exclusion* join against billions of data rows
  * broadcasts the tiny interval table.
  *
  * Semantics matched to the reference:
  *   - states outside [rangeStart, rangeEnd] are ignored;
  *   - duplicate timestamps keep the first occurrence (pads sort last);
  *   - a Maintenance sentinel is padded at rangeEnd when the stream does
  *     not already end in Maintenance;
  *   - events after the last Maintenance are dropped;
  *   - only state CHANGES survive (A,A,B → A,B);
  *   - an Experiment sentinel is padded at rangeStart when the first
  *     surviving state is Maintenance (mode entered before the range);
  *   - the k-th Experiment start pairs with the k-th Maintenance stop
  *     (zip semantics: an unmatched trailing start is dropped);
  *   - an empty stream yields the single interval [rangeStart, rangeEnd].
  */
object Intervals {

  def experimentIntervals(env: DataFrame, timeCol: String, stateCol: String,
      rangeStart: java.sql.Timestamp, rangeEnd: java.sql.Timestamp,
      maintenance: String = "Maintenance",
      experiment: String = "Experiment"): DataFrame = {
    val spark = env.sparkSession
    import spark.implicits._
    val wAll = Window.partitionBy(lit(0))
    val real = env
      .select(col(timeCol).cast("timestamp").as("t"), col(stateCol).as("s"))
      .filter(col("t") >= lit(rangeStart) && col("t") <= lit(rangeEnd))
    // duplicate timestamps among REAL rows keep one deterministically
    // (state as tie key — the reference's keep-first depends on file
    // order, which a distributed engine must not)
    val dedup = real
      .withColumn("_rn",
        row_number().over(Window.partitionBy(col("t")).orderBy(col("s"))))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("_pad", lit(0))
    // conditional Maintenance pad at rangeEnd, added AFTER dedup: the
    // reference appends it when the last real state is not Maintenance.
    // It must not COMPETE with a real row at exactly rangeEnd — a real
    // Experiment row there would displace the pad and silently drop the
    // trailing interval; instead the pad coexists at the same timestamp,
    // ordered after the real row (the reference's append order). The
    // null-safe compare keeps the pad for an EMPTY stream too.
    val lastState = dedup.agg(max_by(col("s"), col("t")).as("_ls"))
    val endPad = Seq((rangeEnd, maintenance, 1)).toDF("t", "s", "_pad")
      .join(broadcast(lastState), !(col("_ls") <=> lit(maintenance))).drop("_ls")
    val padded = dedup.unionByName(endPad)
    // drop everything after the last Maintenance event
    val endT = padded.filter(col("s") === maintenance).agg(max("t").as("_endT"))
    val sliced = padded.join(broadcast(endT), col("t") <= col("_endT")).drop("_endT")
    // keep state changes only; _pad breaks the rangeEnd timestamp tie
    val chg = sliced
      .withColumn("_ps", lag(col("s"), 1).over(wAll.orderBy(col("t"), col("_pad"))))
      .filter(col("_ps").isNull || col("s") =!= col("_ps")).drop("_ps")
    // conditional Experiment pad at rangeStart (first surviving state is
    // Maintenance ⇔ experiment mode was entered before the range)
    val firstState = chg.agg(
      min_by(col("s"), struct(col("t"), col("_pad"))).as("_fs"))
    val startPad = Seq((rangeStart, experiment, 0)).toDF("t", "s", "_pad")
      .join(broadcast(firstState), col("_fs") === maintenance).drop("_fs")
    val fin = chg.unionByName(startPad)
    val starts = fin.filter(col("s") === experiment)
      .select(col("t").as("start"))
      .withColumn("rn", row_number().over(wAll.orderBy("start")))
    val stops = fin.filter(col("s") === maintenance)
      .select(col("t").as("stop"))
      .withColumn("rn", row_number().over(wAll.orderBy("stop")))
    starts.join(stops, "rn").select("start", "stop")
  }

  /** Keep only rows whose `timeCol` falls inside some [start, stop] interval
    * (both endpoints inclusive — pandas `.loc[start:stop]` slicing). The
    * interval table is broadcast; the data side never shuffles. */
  def excludeOutside(df: DataFrame, timeCol: String, intervals: DataFrame): DataFrame =
    df.join(broadcast(intervals),
      col(timeCol) >= col("start") && col(timeCol) <= col("stop"), "left_semi")
}
