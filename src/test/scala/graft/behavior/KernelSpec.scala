package graft.behavior

import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel tests for W5 greedy identity cleanup, the A10 vote matrix,
  * and both event verdicts — no Spark involved. */
class KernelSpec extends AnyFunSuite {
  val NaN = Double.NaN

  test("greedyCleanup: parallel trajectories produce no swaps") {
    val n = 20
    val x0 = Array.tabulate(n)(i => i * 2.0)
    val y0 = Array.fill(n)(0.0)
    val x1 = Array.tabulate(n)(i => i * 2.0)
    val y1 = Array.fill(n)(50.0)
    val c = Kernels.greedyCleanup(x0, y0, x1, y1, voteFirstFrame = true)
    assert(!c.swapped.exists(identity))
    assert(c.votesSame === n.toLong)
    assert(c.votesSwap === 0L)
  }

  test("greedyCleanup: detector-crossed tracks are flagged as swaps") {
    // true mice stay on their sides; the detector labels them crossed from
    // frame 10 on (coordinates exchange) → greedy flags every frame ≥ 10
    val n = 20
    val a = Array.tabulate(n)(i => i * 1.0) // mouse A x: 0..19
    val b = Array.tabulate(n)(i => 100.0 - i) // mouse B x: 100..81
    val x0 = Array.tabulate(n)(i => if (i < 10) a(i) else b(i))
    val x1 = Array.tabulate(n)(i => if (i < 10) b(i) else a(i))
    val y = Array.fill(n)(0.0)
    val c = Kernels.greedyCleanup(x0, y.clone(), x1, y.clone(), voteFirstFrame = true)
    assert((10 until n).forall(c.swapped), "frames after the label flip are swapped")
    assert((0 until 10).forall(i => !c.swapped(i)))
    assert(c.votesSwap === 10L)
  }

  test("greedyCleanup: NaN-for-one-mouse frames take the swap branch (NumPy parity)") {
    val x0 = Array(0.0, NaN, 2.0)
    val y0 = Array(0.0, NaN, 0.0)
    val x1 = Array(10.0, 10.0, 10.0)
    val y1 = Array(0.0, 0.0, 0.0)
    val c = Kernels.greedyCleanup(x0, y0, x1, y1, voteFirstFrame = true)
    assert(c.swapped(1), "frame with one-mouse NaN distances compares false → swap")
  }

  test("nanMean skips NaN and is NaN on empty") {
    assert(Kernels.nanMean(Seq(1.0, NaN, 3.0)) === 2.0)
    assert(Kernels.nanMean(Seq(NaN, NaN)).isNaN)
    assert(Kernels.nanMean(Nil).isNaN)
  }

  test("meanDropnaSpeed: constant 10 px / frame at 50 fps, cm2px=5.4") {
    val n = 11
    val cx = Array.tabulate(n)(i => i * 10.0)
    val cy = Array.fill(n)(0.0)
    val s = Kernels.meanDropnaSpeed(cx, cy, fps = 50.0, cm2px = 5.4)
    // 10 px / 20 ms / 5.4 px/cm * 1000 = 92.59… cm/s
    assert(math.abs(s - 10.0 / 20 / 5.4 * 1000) < 1e-9)
  }

  test("fightVerdict: fast co-moving mice are a fight with valid end point") {
    val n = 50
    val c0x = Array.tabulate(n)(i => i * 10.0)
    val c0y = Array.fill(n)(100.0)
    val c1x = Array.tabulate(n)(i => i * 10.0 + 3.0)
    val c1y = Array.fill(n)(104.0)
    val v = Kernels.fightVerdict(c0x, c0y, c1x, c1y,
      fps = 50, cm2px = 5.4, minCentroidSpeed = 20, minBothCentroidSpeed = 15)
    assert(v.isDefined)
    val (ex, ey) = v.get
    assert(ex === (c0x(n - 1) + c1x(n - 1)) / 2)
    assert(ey === 102.0)
  }

  test("fightVerdict: stationary mice are not a fight") {
    val n = 50
    val v = Kernels.fightVerdict(
      Array.fill(n)(10.0), Array.fill(n)(10.0),
      Array.fill(n)(14.0), Array.fill(n)(14.0),
      fps = 50, cm2px = 5.4, minCentroidSpeed = 20, minBothCentroidSpeed = 15)
    assert(v.isEmpty)
  }

  test("fightVerdict: NaN tail searches backward for the end location (W7)") {
    val n = 30
    val c0x = Array.tabulate(n)(i => i * 10.0)
    val c0y = Array.fill(n)(0.0)
    val c1x = Array.tabulate(n)(i => i * 10.0 + 4.0)
    val c1y = Array.fill(n)(0.0)
    // last 5 frames lost
    for (i <- n - 5 until n) { c0x(i) = NaN; c0y(i) = NaN; c1x(i) = NaN; c1y(i) = NaN }
    val v = Kernels.fightVerdict(c0x, c0y, c1x, c1y, 50, 5.4, 20, 15)
    assert(v.isDefined)
    assert(v.get._1 === ((n - 6) * 10.0 + (n - 6) * 10.0 + 4.0) / 2)
  }

  /** Canonical tube-test arrays: 20 start frames (opposed mice), then the
    * loser turns and retreats. */
  private def tubeArrays(loserTurns: Boolean, loserRetreats: Boolean) = {
    val nStart = 20; val win = 50; val n = nStart + win
    val c0x = new Array[Double](n); val c0y = Array.fill(n)(50.0)
    val c1x = new Array[Double](n); val c1y = Array.fill(n)(50.0)
    val o0 = new Array[Double](n); val o1 = new Array[Double](n)
    val e2 = new Array[Double](n); val e3 = new Array[Double](n)
    val cd = new Array[Double](n); val isStart = new Array[Boolean](n)
    for (i <- 0 until n) {
      val advance = if (i >= nStart && loserRetreats) 3.0 * (i - nStart + 1) else 0.0
      c0x(i) = 100.0; c1x(i) = 140.0 + advance
      o0(i) = 0.0
      o1(i) = if (i < nStart || !loserTurns) 180.0 else 0.0
      cd(i) = c1x(i) - c0x(i)
      isStart(i) = i < nStart
      // facing +x after turn: tail1 behind head1
      e2(i) = math.abs((c0x(i) - 10) - (c1x(i) + 8)) // tail0→head1
      e3(i) = math.abs((c1x(i) - 10) - (c0x(i) + 8)) // tail1→head0
    }
    (c0x, c0y, c1x, c1y, o0, o1, e2, e3, cd, isStart, nStart - 1)
  }

  test("tubeVerdict: turned-and-retreating mouse 1 loses; mouse 0 wins") {
    val (c0x, c0y, c1x, c1y, o0, o1, e2, e3, cd, isStart, lastRel) =
      tubeArrays(loserTurns = true, loserRetreats = true)
    val v = Kernels.tubeVerdict(c0x, c0y, c1x, c1y, o0, o1, e2, e3, cd, isStart,
      lastRel, angleTol = 45, minDist = 30, maxDistEnd = 60, movementThreshold = 2)
    assert(v.isDefined)
    val (endRel, winner) = v.get
    assert(winner === 0)
    assert(endRel === 20, "first end frame right after the last start frame")
  }

  test("tubeVerdict: no turn → no end frames → no tube test") {
    val (c0x, c0y, c1x, c1y, o0, o1, e2, e3, cd, isStart, lastRel) =
      tubeArrays(loserTurns = false, loserRetreats = true)
    val v = Kernels.tubeVerdict(c0x, c0y, c1x, c1y, o0, o1, e2, e3, cd, isStart,
      lastRel, 45, 30, 60, 2)
    assert(v.isEmpty)
  }

  test("tubeVerdict: turned but stationary (grooming) fails the movement condition") {
    val (c0x, c0y, c1x, c1y, o0, o1, e2, e3, cd, isStart, lastRel) =
      tubeArrays(loserTurns = true, loserRetreats = false)
    val v = Kernels.tubeVerdict(c0x, c0y, c1x, c1y, o0, o1, e2, e3, cd, isStart,
      lastRel, 45, 30, 60, 2)
    assert(v.isEmpty)
  }

  test("tubeVerdict: skeleton-flip precheck rejects same-orientation starts") {
    val (c0x, c0y, c1x, c1y, o0, o1, e2, e3, cd, isStart, lastRel) =
      tubeArrays(loserTurns = true, loserRetreats = true)
    o1(0) = 10.0; o1(1) = 10.0 // two start frames where both face the same way
    val v = Kernels.tubeVerdict(c0x, c0y, c1x, c1y, o0, o1, e2, e3, cd, isStart,
      lastRel, 45, 30, 60, 2)
    assert(v.isEmpty)
  }
}
