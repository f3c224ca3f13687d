package graft.behavior

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.TestSpark

/** End-to-end detector goldens over synthetic 2-mouse trajectories
  * engineered to trigger each condition (FIXTURES.md / SURVEY §5). */
class DetectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val parts = Map("nose" -> "nose", "head" -> "head",
    "centroid" -> "spine2", "tail_base" -> "spine4")
  val t0 = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")

  /** Build a long pose table from per-frame mouse part positions. */
  def poseDf(rows: Seq[(Int, String, String, Double, Double)]): DataFrame =
    rows.map { case (frame, id, part, x, y) =>
      (new java.sql.Timestamp(t0.getTime + frame * 20L), id, part, x, y)
    }.toDF("time", "identity", "part", "x", "y")

  /** Mouse at centroid (cx, cy) facing +x (dir=1) or −x (dir=−1). */
  def mouse(frame: Int, id: String, cx: Double, cy: Double, dir: Double,
      noseHead: Double = 2.0): Seq[(Int, String, String, Double, Double)] = Seq(
    (frame, id, "nose", cx + dir * (8 + noseHead), cy),
    (frame, id, "head", cx + dir * 8, cy),
    (frame, id, "spine2", cx, cy),
    (frame, id, "spine4", cx - dir * 10, cy))

  test("detectFights golden: close fast contorted phase yields one event") {
    // frames 0–99 calm & far; 100–200 fighting (close, contorted, fast);
    // 201–260 calm & far again
    val rows = (0 to 260).flatMap { f =>
      if (f >= 100 && f <= 200) {
        val x = 100.0 + (f - 100) * 10.0
        mouse(f, "A", x, 100, 1, noseHead = 10.0) ++
          mouse(f, "B", x + 3, 104, 1, noseHead = 10.0)
      } else {
        mouse(f, "A", 100, 100, 1) ++ mouse(f, "B", 400, 400, 1)
      }
    }
    val fights = Detectors.detectFights(poseDf(rows), None, parts,
      Detectors.FightParams()).collect()
    assert(fights.length === 1)
    val fight = fights.head
    assert(fight.start_ts.getTime === t0.getTime + 100 * 20)
    assert(fight.end_ts.getTime === t0.getTime + 200 * 20)
    assert(math.abs(fight.duration_sec - 2.0) < 1e-9)
    // end point = cleaned both-valid midpoint at frame 199
    assert(math.abs(fight.end_x - (100.0 + 99 * 10 + 1.5)) < 1e-9)
    assert(math.abs(fight.end_y - 102.0) < 1e-9)
  }

  test("detectFights golden: slow contact is not a fight") {
    val rows = (0 to 260).flatMap { f =>
      if (f >= 100 && f <= 200)
        mouse(f, "A", 100, 100, 1, noseHead = 10.0) ++
          mouse(f, "B", 103, 104, 1, noseHead = 10.0) // close but stationary
      else mouse(f, "A", 100, 100, 1) ++ mouse(f, "B", 140, 104, 1) // nearby, apart
    }
    val fights = Detectors.detectFights(poseDf(rows), None, parts,
      Detectors.FightParams()).collect()
    assert(fights.isEmpty)
  }

  test("detectTubeTests golden: opposed stand-off then B turns and retreats → A wins") {
    // frames 0–19: A at 100 facing +x, B at 140 facing −x (candidates);
    // frames 20–69: B turned (+x) and retreats 3 px/frame
    val rows = (0 to 69).flatMap { f =>
      if (f < 20)
        mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140, 50, -1)
      else
        mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140.0 + 3 * (f - 19), 50, 1)
    }
    val tubes = Detectors.detectTubeTests(poseDf(rows), parts,
      Detectors.TubeParams()).collect()
    assert(tubes.length === 1)
    val tube = tubes.head
    assert(tube.winner_identity === "A")
    assert(tube.start_ts.getTime === t0.getTime)
    assert(tube.end_ts.getTime === t0.getTime + 20 * 20)
  }

  test("detectTubeTests: annulus ROI gate keeps/rejects the corridor") {
    val rows = (0 to 69).flatMap { f =>
      if (f < 20) mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140, 50, -1)
      else mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140.0 + 3 * (f - 19), 50, 1)
    }
    // centroids sit 50–290 px from (0,50): an annulus covering that band
    // admits the event; a far-away annulus filters every candidate out
    val in = Detectors.detectTubeTests(poseDf(rows), parts, Detectors.TubeParams(),
      roi = Some((0.0, 50.0, 50.0, 400.0))).collect()
    assert(in.length === 1)
    val out = Detectors.detectTubeTests(poseDf(rows), parts, Detectors.TubeParams(),
      roi = Some((5000.0, 5000.0, 10.0, 20.0))).collect()
    assert(out.isEmpty)
  }

  test("detectFights: blob-speed condition 3 gates candidates") {
    def blob(speedPxPerFrame: Double) = (0 to 260).map { f =>
      (new java.sql.Timestamp(t0.getTime + f * 20L),
        100.0 + f * speedPxPerFrame, 100.0)
    }.toSeq.toDF("time", "x", "y")
    val rows = (0 to 260).flatMap { f =>
      if (f >= 100 && f <= 200) {
        val x = 100.0 + (f - 100) * 10.0
        mouse(f, "A", x, 100, 1, noseHead = 10.0) ++
          mouse(f, "B", x + 3, 104, 1, noseHead = 10.0)
      } else mouse(f, "A", 100, 100, 1) ++ mouse(f, "B", 140, 104, 1)
    }
    // fast blob (10 px/frame ≈ 92 cm/s > 3 cm/s): fight detected
    val fast = Detectors.detectFights(poseDf(rows), Some(blob(10.0)), parts,
      Detectors.FightParams()).collect()
    assert(fast.length === 1)
    // stationary blob (0 px/frame < 3 cm/s): condition 3 kills every frame
    val slow = Detectors.detectFights(poseDf(rows), Some(blob(0.0)), parts,
      Detectors.FightParams()).collect()
    assert(slow.isEmpty)
  }

  test("detectTubeTests golden: B squeezes past without turning → no event") {
    val rows = (0 to 69).flatMap { f =>
      if (f < 20) mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140, 50, -1)
      else mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140.0 + 3 * (f - 19), 50, -1)
    }
    val tubes = Detectors.detectTubeTests(poseDf(rows), parts,
      Detectors.TubeParams()).collect()
    assert(tubes.isEmpty)
  }
}
