package graft.behavior

/** Pure per-event kernels for the behavior detectors — SURVEY §2.5 W5
  * (greedy sequential identity cleanup), §2.4 A10 (vote-matrix global swap),
  * and the fight / tube-test event verifiers.
  *
  * Reference semantics (re-expressed, not translated):
  * `social_behavior_detection/social_behaviour_detection.py:303-385` (tube
  * verify), `:650-730` (fight verify). These are inherently sequential
  * *within* an event — the swap decision at frame i depends on the
  * *corrected* positions carried from frame i−1 — so they live here as plain
  * Scala over per-event arrays and run embarrassingly parallel across events
  * via `groupByKey.flatMapGroups` (see [[Detectors]]).
  *
  * NaN semantics are load-bearing and mirror NumPy: any comparison with NaN
  * is false, so a frame where exactly one mouse is missing fails the
  * "keep" test and is treated as a swap — that is the reference behavior.
  */
object Kernels {

  @inline private def isNan2(x: Double, y: Double): Boolean = x.isNaN || y.isNaN
  @inline private def dist(x1: Double, y1: Double, x2: Double, y2: Double): Double =
    math.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))

  /** Mean of the non-NaN entries; NaN when all are NaN (NumPy nanmean). */
  def nanMean(xs: Iterable[Double]): Double = {
    var s = 0.0; var n = 0
    xs.foreach(x => if (!x.isNaN) { s += x; n += 1 })
    if (n == 0) Double.NaN else s / n
  }

  /** Result of the greedy sequential identity cleanup over one event.
    * `swapped(i)` = the detected identities at relative frame i are crossed;
    * votesSame/votesSwap are the A10 vote-matrix diagonal/off-diagonal
    * counts (used by the tube-test global-swap majority).
    */
  final case class Cleanup(swapped: Array[Boolean], votesSame: Long, votesSwap: Long)

  /** W5: frame-by-frame greedy identity cleanup. Arrays are centroid
    * coordinates per relative frame (NaN = missing). `voteFirstFrame`
    * matches the tube-test variant, which seeds the vote matrix with the
    * first frame when both mice are present (fights do not vote at all).
    */
  def greedyCleanup(c0x: Array[Double], c0y: Array[Double],
      c1x: Array[Double], c1y: Array[Double], voteFirstFrame: Boolean): Cleanup = {
    val n = c0x.length
    val swapped = new Array[Boolean](n)
    if (n == 0) return Cleanup(swapped, 0L, 0L)
    var lk0x = c0x(0); var lk0y = c0y(0)
    var lk1x = c1x(0); var lk1y = c1y(0)
    var same = 0L; var swap = 0L
    if (voteFirstFrame && !isNan2(c0x(0), c0y(0)) && !isNan2(c1x(0), c1y(0))) same += 1
    var i = 1
    while (i < n) {
      val m0nan = isNan2(c0x(i), c0y(i))
      val m1nan = isNan2(c1x(i), c1y(i))
      if (!(m0nan && m1nan)) {
        val d00 = dist(c0x(i), c0y(i), lk0x, lk0y)
        val d01 = dist(c0x(i), c0y(i), lk1x, lk1y)
        val d10 = dist(c1x(i), c1y(i), lk0x, lk0y)
        val d11 = dist(c1x(i), c1y(i), lk1x, lk1y)
        if (d00 + d11 <= d01 + d10) { // NaN sums compare false → swap branch
          lk0x = c0x(i); lk0y = c0y(i); lk1x = c1x(i); lk1y = c1y(i)
          same += 1
        } else {
          lk0x = c1x(i); lk0y = c1y(i); lk1x = c0x(i); lk1y = c0y(i)
          swapped(i) = true
          swap += 1
        }
      }
      i += 1
    }
    Cleanup(swapped, same, swap)
  }

  /** Per-mouse mean centroid speed (cm/s) over the valid (non-NaN) frames of
    * one event, matching the reference's dropna→diff→per-gap dt recipe
    * (`social_behaviour_detection.py:681-693`): dt in integer ms from frame
    * indices, speed = ‖Δxy‖/dt/cm2px·1000.
    */
  def meanDropnaSpeed(cx: Array[Double], cy: Array[Double],
      fps: Double, cm2px: Double): Double = {
    val idx = cx.indices.filter(i => !isNan2(cx(i), cy(i)))
    if (idx.length < 2) return Double.NaN
    val speeds = idx.sliding(2).map { case Seq(a, b) =>
      val dtMs = (b * 1000.0 / fps - a * 1000.0 / fps).toInt
      dist(cx(b), cy(b), cx(a), cy(a)) / dtMs / cm2px * 1000.0
    }.toSeq
    nanMean(speeds)
  }

  /** Fight verifier over one candidate event (reference `:650-730`).
    * Input arrays cover relative frames [0, n) = absolute [start−1, end)
    * (the reference trims one frame before the first candidate and stops
    * short of the last). Returns Some((endX, endY)) when the speed
    * conditions hold — positions are the cleaned last-valid-frame midpoint,
    * NaN when no valid frame exists.
    */
  def fightVerdict(c0x: Array[Double], c0y: Array[Double],
      c1x: Array[Double], c1y: Array[Double],
      fps: Double, cm2px: Double,
      minCentroidSpeed: Double, minBothCentroidSpeed: Double): Option[(Double, Double)] = {
    val n = c0x.length
    if (n == 0) return None
    val cl = greedyCleanup(c0x, c0y, c1x, c1y, voteFirstFrame = false)
    // cleaned copies: swap the two mice on swapped frames
    val k0x = c0x.clone(); val k0y = c0y.clone()
    val k1x = c1x.clone(); val k1y = c1y.clone()
    var i = 0
    while (i < n) {
      if (cl.swapped(i)) {
        val tx = k0x(i); k0x(i) = k1x(i); k1x(i) = tx
        val ty = k0y(i); k0y(i) = k1y(i); k1y(i) = ty
      }
      i += 1
    }
    val s0 = meanDropnaSpeed(k0x, k0y, fps, cm2px)
    val s1 = meanDropnaSpeed(k1x, k1y, fps, cm2px)
    val both = nanMean(Seq(s0, s1))
    val isFight = s0 > minCentroidSpeed || s1 > minCentroidSpeed ||
      both > minBothCentroidSpeed
    if (!isFight) return None
    // end location: last frame with both mice valid, searching backward (W7)
    var f = n - 1
    while (f >= 0 && (isNan2(k0x(f), k0y(f)) || isNan2(k1x(f), k1y(f)))) f -= 1
    if (f < 0) Some((Double.NaN, Double.NaN))
    else Some(((k0x(f) + k1x(f)) / 2.0, (k0y(f) + k1y(f)) / 2.0))
  }

  /** Tube-test verifier over one candidate event (reference `:276-385`).
    *
    * Relative frames [0, n) = absolute [firstStart, lastStart+window).
    * @param o0,o1    orientations (deg, NaN = unknown)
    * @param e2,e3    tail0→head1 / tail1→head0 extremity distances
    * @param cDist    centroid distance per frame
    * @param isStart  frame is in the candidate-start subarray
    * @param angleTol,minDist,maxDistEnd,movementThreshold  parameters
    * @return Some((endRelFrame, winnerIdx)) on a confirmed tube test
    */
  def tubeVerdict(
      c0x: Array[Double], c0y: Array[Double], c1x: Array[Double], c1y: Array[Double],
      o0: Array[Double], o1: Array[Double],
      e2: Array[Double], e3: Array[Double],
      cDist: Array[Double], isStart: Array[Boolean],
      lastStartRel: Int,
      angleTol: Double, minDist: Double, maxDistEnd: Double,
      movementThreshold: Double): Option[(Int, Int)] = {
    val n = c0x.length
    if (n == 0) return None
    // skeleton-flip pre-check: same orientation within tolerance on more
    // than one frame of the start interval → tracking error, reject
    var flips = 0
    var i = 0
    while (i <= lastStartRel) {
      if (math.abs(o0(i) - o1(i)) <= angleTol) flips += 1 // NaN → false
      i += 1
    }
    if (flips > 1) return None
    // end conditions within the search window [lastStartRel, n)
    val ends = (lastStartRel until n).filter { f =>
      math.abs(o0(f) - o1(f)) <= angleTol &&
        cDist(f) > minDist && cDist(f) < maxDistEnd
    }
    if (ends.isEmpty) return None
    val cl = greedyCleanup(c0x, c0y, c1x, c1y, voteFirstFrame = true)
    val globalSwap = cl.votesSwap > cl.votesSame
    val swapped = if (!globalSwap) cl.swapped else cl.swapped.map(!_)
    // orientation cleanup + winner: the mouse whose mean orientation changed
    // most between start frames and end frames is the loser (it turned)
    def cleanedPair(a: Array[Double], b: Array[Double], f: Int): (Double, Double) =
      if (swapped(f)) (b(f), a(f)) else (a(f), b(f))
    // start frames = THIS session's candidate frames — they live in
    // [0, lastStartRel]; an isStart flag beyond that belongs to a LATER
    // session whose start happens to fall inside this event's search
    // window and must not pollute the orientation baseline
    val startFrames = (0 to math.min(lastStartRel, n - 1)).filter(isStart)
    val start0 = nanMean(startFrames.map(f => cleanedPair(o0, o1, f)._1))
    val start1 = nanMean(startFrames.map(f => cleanedPair(o0, o1, f)._2))
    val end0 = nanMean(ends.map(f => cleanedPair(o0, o1, f)._1))
    val end1 = nanMean(ends.map(f => cleanedPair(o0, o1, f)._2))
    val loser = if (math.abs(start1 - end1) > math.abs(start0 - end0)) 1 else 0
    val winner = 1 - loser
    // condition 4: the loser is in front (its tail is nearer the winner's
    // head than vice versa); e2/e3 swap together with identities
    val mT0H1 = nanMean(ends.map(f => cleanedPair(e2, e3, f)._1))
    val mT1H0 = nanMean(ends.map(f => cleanedPair(e2, e3, f)._2))
    val frontOk = if (loser == 0) mT0H1 < mT1H0 else mT1H0 < mT0H1
    // condition 5: loser keeps moving after the turn (not grooming)
    val lx = (lastStartRel until n).map { f =>
      val p = cleanedPair(c0x, c1x, f); if (loser == 0) p._1 else p._2
    }.toArray
    val ly = (lastStartRel until n).map { f =>
      val p = cleanedPair(c0y, c1y, f); if (loser == 0) p._1 else p._2
    }.toArray
    val moves = (0 until lx.length - 1).map(f =>
      dist(lx(f + 1), ly(f + 1), lx(f), ly(f)))
    val movementOk = nanMean(moves) > movementThreshold
    if (frontOk && movementOk) Some((ends.head, winner)) else None
  }
}
