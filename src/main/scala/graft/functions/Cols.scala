package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure-`Column` combinators for the reference's scalar math surface
  * (SURVEY §2.2, §2.8). Everything here stays inside whole-stage codegen —
  * no UDFs, no serialization breaks.
  */
object Cols {
  /** Euclidean distance (reference `np.linalg.norm`,
    * `social_behaviour_detection.py:174,181-190,571-572`). */
  def euclidean(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    hypot(x2 - x1, y2 - y1)

  /** Orientation in degrees ∈ [0, 360) of the vector (x1,y1)→(x2,y2)
    * (reference arctan2 + degrees + mod-360,
    * `social_behaviour_detection.py:194-208`). */
  def orientationDeg(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    pmod(degrees(atan2(y2 - y1, x2 - x1)), lit(360.0))

  /** 3×3 projective (homography) transform of a point, homogeneous divide
    * (reference `combine_pose_id_chunk.py:21-33`). `h` is row-major. */
  def homographyX(h: Seq[Double], x: Column, y: Column): Column =
    (lit(h(0)) * x + lit(h(1)) * y + lit(h(2))) / (lit(h(6)) * x + lit(h(7)) * y + lit(h(8)))
  def homographyY(h: Seq[Double], x: Column, y: Column): Column =
    (lit(h(3)) * x + lit(h(4)) * y + lit(h(5))) / (lit(h(6)) * x + lit(h(7)) * y + lit(h(8)))

  /** Point in annulus ROI (reference arena inner/outer radius test,
    * `social_behaviour_detection.py:241-257`): squared-distance form avoids
    * the sqrt in the hot path. */
  def inAnnulus(x: Column, y: Column, cx: Column, cy: Column,
      rInner: Column, rOuter: Column): Column = {
    val d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
    d2 >= rInner * rInner && d2 <= rOuter * rOuter
  }

  /** Point in convex polygon via half-plane sign tests — pure column math,
    * no UDF (reference Shapely point-in-polygon for quadrant FOVs,
    * `generate_composite_quadrant_videos.py:246-255`; convex case only).
    * Vertices must be in consistent winding order.
    */
  def inConvexPolygon(x: Column, y: Column, vertices: Seq[(Double, Double)]): Column = {
    val edges = vertices.zip(vertices.tail :+ vertices.head)
    val signs = edges.map { case ((x1, y1), (x2, y2)) =>
      (lit(x2 - x1) * (y - lit(y1))) - (lit(y2 - y1) * (x - lit(x1)))
    }
    signs.map(_ >= 0).reduce(_ && _) || signs.map(_ <= 0).reduce(_ && _)
  }

  /** Speed between consecutive samples in px/s given position deltas and dt
    * seconds (reference `social_behaviour_detection.py:579-601`). */
  def speed(dx: Column, dy: Column, dtSeconds: Column): Column =
    hypot(dx, dy) / dtSeconds

  /** pandas `isclose(atol)` (reference `social_behaviour_detection.py:211,283,295`). */
  def isClose(a: Column, b: Column, atol: Double): Column = abs(a - b) <= lit(atol)

  /** Frame id from a timestamp given stream start and fps (reference
    * `social_behaviour_detection.py:138,521`). */
  def frameId(time: Column, startUs: Column, fps: Double): Column =
    round((unix_micros(time) - startUs).cast("double") * fps / 1e6).cast("long")
}
