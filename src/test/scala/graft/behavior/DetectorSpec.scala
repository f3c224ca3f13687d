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
      roi = Some(Detectors.Roi(0.0, 50.0, 50.0, 400.0))).collect()
    assert(in.length === 1)
    val out = Detectors.detectTubeTests(poseDf(rows), parts, Detectors.TubeParams(),
      roi = Some(Detectors.Roi(5000.0, 5000.0, 10.0, 20.0))).collect()
    assert(out.isEmpty)
  }

  test("ROI exclusion zones: nest band and gate circles reject candidates") {
    val rows = (0 to 69).flatMap { f =>
      if (f < 20) mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140, 50, -1)
      else mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140.0 + 3 * (f - 19), 50, 1)
    }
    val base = Detectors.Roi(0.0, 50.0, 50.0, 400.0)
    // nest band x > 0 ∧ y ∈ [40, 60] contains both mice (y = 50) → rejected
    val nest = Detectors.detectTubeTests(poseDf(rows), parts, Detectors.TubeParams(),
      roi = Some(base.copy(nestY1 = 40.0, nestY2 = 60.0))).collect()
    assert(nest.isEmpty)
    // nest band away from the corridor (y ∈ [300, 400]) → event survives
    val nestFar = Detectors.detectTubeTests(poseDf(rows), parts, Detectors.TubeParams(),
      roi = Some(base.copy(nestY1 = 300.0, nestY2 = 400.0))).collect()
    assert(nestFar.length === 1)
    // gate circle over mouse A's stand-off spot (100, 50) → rejected even
    // though mouse B is clear (np.any over mice)
    val gated = Detectors.detectTubeTests(poseDf(rows), parts, Detectors.TubeParams(),
      roi = Some(base.copy(gates = Seq((100.0, 50.0)), gateWidth = 15.0))).collect()
    assert(gated.isEmpty)
    // distant gate → event survives
    val gatedFar = Detectors.detectTubeTests(poseDf(rows), parts, Detectors.TubeParams(),
      roi = Some(base.copy(gates = Seq((1000.0, 1000.0)), gateWidth = 15.0))).collect()
    assert(gatedFar.length === 1)
  }

  test("Roi.fromMetadata parses arena, nest, and Gate+Rfid device locations") {
    val cfg = """{"ActiveRegion":{"ArenaCenter":{"X":10.0,"Y":20.0},
      |"ArenaInnerRadius":5.0,"ArenaOuterRadius":50.0,
      |"NestRegion":{"ArrayOfPoint":[{"X":1,"Y":11.0},{"X":2,"Y":22.0},{"X":3,"Y":33.0}]}},
      |"Devices":{"GateRfid1":{"Location":{"X":7.0,"Y":8.0}},
      |"GateSouthRfid":{"Location":{"X":9.0,"Y":3.0}},
      |"CameraTop":{"Location":{"X":0.0,"Y":0.0}}}}""".stripMargin.replaceAll("\n", "")
    val dir = java.nio.file.Files.createTempDirectory("roi_meta")
    java.nio.file.Files.writeString(dir.resolve("metadata.json"), cfg + "\n")
    val meta = spark.read.json(dir.toString)
    val roi = Detectors.Roi.fromMetadata(meta, gateWidth = 12.0)
    assert(roi === Detectors.Roi(10.0, 20.0, 5.0, 50.0, 22.0, 33.0,
      Seq((7.0, 8.0), (9.0, 3.0)), 12.0))
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

  test("blobSpeed matches the reference recipe: anomaly drop, lag recompute, leading 0, per-frame rows") {
    // times in ms; t=45 has dt=5 < 10 ms → dropped; survivors' diffs are
    // recomputed against the NEW predecessor (t=40 → t=60 bridges the drop)
    val timesMs = Seq(0L, 20L, 40L, 45L, 60L, 80L, 100L, 120L, 140L, 160L, 180L, 200L)
    val xs = timesMs.indices.map(_ * 10.0)
    val cm2px = 5.4
    val blob = timesMs.zip(xs).map { case (t, x) =>
      (new java.sql.Timestamp(t0.getTime + t), x, 0.0)
    }.toDF("time", "x", "y")
    val got = Detectors.blobSpeed(blob, 50.0, cm2px).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // replicate the numpy recipe
    val keep = timesMs.indices.filter(i => i == 0 || timesMs(i) - timesMs(i - 1) >= 10)
    val kt = keep.map(timesMs); val kx = keep.map(xs)
    val speeds = 0.0 +: (1 until kt.length).map { i =>
      math.abs(kx(i) - kx(i - 1)) / math.floor((kt(i) - kt(i - 1)).toDouble) / cm2px * 1000.0
    }
    val smoothed = speeds.indices.map { i =>
      (math.max(0, i - 5) to math.min(speeds.length - 1, i + 4)).map(speeds).sum / 10.0
    }
    val want = kt.indices.groupBy(i => math.round(kt(i) * 50.0 / 1000.0))
      .map { case (f, is) => f -> is.map(smoothed).sum / is.size }
    assert(got.keySet === want.keySet)
    want.foreach { case (f, v) => assert(math.abs(got(f) - v) < 1e-9, s"frame $f") }
    // exactly one row per frame — the feature join cannot fan out
    assert(got.size === keep.size)
  }

  test("blobSpeed bucket boundaries: 1-second buckets equal the single-bucket result") {
    val rnd = new scala.util.Random(37)
    // ~12 s of irregular samples (some dt < 10 ms to exercise the drop),
    // so bucketSeconds = 1 yields ~12 buckets with live boundaries
    var tMs = 0L
    val rows = (0 until 600).map { i =>
      tMs += (if (rnd.nextDouble() < 0.1) 5L else 15L + rnd.nextInt(10))
      (new java.sql.Timestamp(t0.getTime + tMs), rnd.nextDouble() * 100, rnd.nextDouble() * 100)
    }.toDF("time", "x", "y")
    def run(bucketSeconds: Long) =
      Detectors.blobSpeed(rows, 50.0, 5.4, bucketSeconds).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val single = run(3600) // whole stream in one bucket = the global plan
    val bucketed = run(1)
    assert(bucketed.keySet === single.keySet)
    single.foreach { case (f, v) =>
      assert(math.abs(bucketed(f) - v) < 1e-9, s"frame $f") }
  }

  test("multi-epoch wrapper: events detected independently in both epochs") {
    val fight = (0 to 260).flatMap { f =>
      if (f >= 100 && f <= 200) {
        val x = 100.0 + (f - 100) * 10.0
        mouse(f, "A", x, 100, 1, noseHead = 10.0) ++
          mouse(f, "B", x + 3, 104, 1, noseHead = 10.0)
      } else mouse(f, "A", 100, 100, 1) ++ mouse(f, "B", 400, 400, 1)
    }
    val twoEpochs = fight.map { case (f, id, part, x, y) =>
      (new java.sql.Timestamp(t0.getTime + f * 20L), id, part, x, y, "epochA")
    } ++ fight.map { case (f, id, part, x, y) =>
      // second epoch 3 days later
      (new java.sql.Timestamp(t0.getTime + 3L * 86400000L + f * 20L), id, part, x, y, "epochB")
    }
    val pose = twoEpochs.toDF("time", "identity", "part", "x", "y", "epoch")
    val out = Detectors.detectFightsAllEpochs(pose, None, parts,
      Detectors.FightParams()).collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[String]("epoch")).sorted.toSeq === Seq("epochA", "epochB"))
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("duration_sec") - 2.0) < 1e-9)
    }
  }

  test("multi-epoch tube tests: one event per epoch, winners preserved") {
    val tube = (0 to 69).flatMap { f =>
      if (f < 20) mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140, 50, -1)
      else mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140.0 + 3 * (f - 19), 50, 1)
    }
    val twoEpochs = tube.map { case (f, id, part, x, y) =>
      (new java.sql.Timestamp(t0.getTime + f * 20L), id, part, x, y, "ep1")
    } ++ tube.map { case (f, id, part, x, y) =>
      (new java.sql.Timestamp(t0.getTime + 5L * 86400000L + f * 20L), id, part, x, y, "ep2")
    }
    val pose = twoEpochs.toDF("time", "identity", "part", "x", "y", "epoch")
    val out = Detectors.detectTubeTestsAllEpochs(pose, parts,
      Detectors.TubeParams()).collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[String]("epoch")).sorted.toSeq === Seq("ep1", "ep2"))
    assert(out.forall(_.getAs[String]("winner_identity") == "A"))
  }

  test("multi-epoch wrapper skips epochs without exactly 2 identities instead of crashing") {
    val fight = (0 to 260).flatMap { f =>
      if (f >= 100 && f <= 200) {
        val x = 100.0 + (f - 100) * 10.0
        mouse(f, "A", x, 100, 1, noseHead = 10.0) ++
          mouse(f, "B", x + 3, 104, 1, noseHead = 10.0)
      } else mouse(f, "A", 100, 100, 1) ++ mouse(f, "B", 400, 400, 1)
    }
    val good = fight.map { case (f, id, part, x, y) =>
      (new java.sql.Timestamp(t0.getTime + f * 20L), id, part, x, y, "good")
    }
    // second epoch has only ONE identity (a mouse was removed) → skipped
    val lonely = (0 to 100).flatMap(f => mouse(f, "A", 100, 100, 1)).map {
      case (f, id, part, x, y) =>
        (new java.sql.Timestamp(t0.getTime + 3L * 86400000L + f * 20L), id, part, x, y, "lonely")
    }
    val pose = (good ++ lonely).toDF("time", "identity", "part", "x", "y", "epoch")
    val out = Detectors.detectFightsAllEpochs(pose, None, parts,
      Detectors.FightParams()).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("epoch") === "good")
  }

  test("multi-epoch detectors build ONE plan: no per-epoch union, analysis flat in epoch count") {
    import org.apache.spark.sql.catalyst.plans.logical.Union
    val fight = (0 to 260).flatMap { f =>
      if (f >= 100 && f <= 200) {
        val x = 100.0 + (f - 100) * 10.0
        mouse(f, "A", x, 100, 1, noseHead = 10.0) ++
          mouse(f, "B", x + 3, 104, 1, noseHead = 10.0)
      } else mouse(f, "A", 100, 100, 1) ++ mouse(f, "B", 400, 400, 1)
    }
    // 20 epochs, one per day — the round-3 per-shard-union design built 20
    // full detector plans here; the single-plan design must build one
    def poseFor(n: Int) = (0 until n).flatMap { ep =>
      fight.map { case (f, id, part, x, y) =>
        (new java.sql.Timestamp(t0.getTime + ep * 86400000L + f * 20L),
          id, part, x, y, f"ep$ep%02d")
      }
    }.toDF("time", "identity", "part", "x", "y", "epoch")
    def planStats(n: Int): (Int, Int, Double) = {
      val t0n = System.nanoTime()
      val analyzed = Detectors.detectFightsAllEpochs(poseFor(n), None, parts,
        Detectors.FightParams()).queryExecution.analyzed // forces analysis
      val sec = (System.nanoTime() - t0n) / 1e9
      (analyzed.collect { case p => p }.length,
        analyzed.collect { case u: Union => u }.length, sec)
    }
    // the plan has a fixed number of STRUCTURAL unions (candidate∪bridge,
    // ghost replication) — what must NOT happen is unions/nodes growing
    // with epoch count
    val (nodes2, unions2, _) = planStats(2)
    val (nodes20, unions20, analysisSec) = planStats(20)
    assert(nodes20 === nodes2,
      s"plan node count grew with epochs: $nodes2 @2 epochs vs $nodes20 @20")
    assert(unions20 === unions2,
      s"union count grew with epochs: $unions2 @2 epochs vs $unions20 @20")
    assert(analysisSec < 60.0,
      f"20-epoch analysis took $analysisSec%.1f s — plan growing with epoch count?")
    val events = Detectors.detectFightsAllEpochs(poseFor(20), None, parts,
      Detectors.FightParams()).collect()
    assert(events.length === 20)
    assert(events.map(_.getAs[String]("epoch")).sorted.toSeq ===
      (0 until 20).map(ep => f"ep$ep%02d"))
    events.foreach { r =>
      assert(math.abs(r.getAs[Double]("duration_sec") - 2.0) < 1e-9)
    }
  }

  test("detectTubeTestsAllEpochs: plan size constant in epoch count, all winners correct") {
    import org.apache.spark.sql.catalyst.plans.logical.Union
    val tube = (0 to 120).flatMap { f =>
      if (f < 20) mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140, 50, -1)
      else if (f < 70)
        mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140.0 + 3 * (f - 19), 50, 1)
      else mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 3000, 3000, -1)
    }
    def poseFor(n: Int) = (0 until n).flatMap { ep =>
      tube.map { case (f, id, part, x, y) =>
        (new java.sql.Timestamp(t0.getTime + ep * 86400000L + f * 20L),
          id, part, x, y, f"ep$ep%02d")
      }
    }.toDF("time", "identity", "part", "x", "y", "epoch")
    def planStats(n: Int): (Int, Int) = {
      val analyzed = Detectors.detectTubeTestsAllEpochs(poseFor(n), parts,
        Detectors.TubeParams()).queryExecution.analyzed
      (analyzed.collect { case p => p }.length,
        analyzed.collect { case u: Union => u }.length)
    }
    assert(planStats(2) === planStats(12),
      "tube all-epochs plan grew with epoch count")
    val events = Detectors.detectTubeTestsAllEpochs(poseFor(12), parts,
      Detectors.TubeParams()).collect()
    assert(events.length === 12)
    assert(events.forall(_.getAs[String]("winner_identity") == "A"))
    assert(events.map(_.getAs[String]("epoch")).sorted.toSeq ===
      (0 until 12).map(ep => f"ep$ep%02d"))
  }

  test("multi-epoch fights with a blob stream: epoch-tagged and epoch-less blobs both gate") {
    val fight = (0 to 260).flatMap { f =>
      if (f >= 100 && f <= 200) {
        val x = 100.0 + (f - 100) * 10.0
        mouse(f, "A", x, 100, 1, noseHead = 10.0) ++
          mouse(f, "B", x + 3, 104, 1, noseHead = 10.0)
      } else mouse(f, "A", 100, 100, 1) ++ mouse(f, "B", 400, 400, 1)
    }
    val pose = (fight.map { case (f, id, part, x, y) =>
      (new java.sql.Timestamp(t0.getTime + f * 20L), id, part, x, y, "e1")
    } ++ fight.map { case (f, id, part, x, y) =>
      (new java.sql.Timestamp(t0.getTime + 3L * 86400000L + f * 20L), id, part, x, y, "e2")
    }).toDF("time", "identity", "part", "x", "y", "epoch")
    def blob(speed: Double, withEpoch: Boolean) = {
      val rows = (0 to 1).flatMap { e =>
        (0 to 260).map { f =>
          (new java.sql.Timestamp(t0.getTime + e * 3L * 86400000L + f * 20L),
            100.0 + f * speed, 0.0, if (e == 0) "e1" else "e2")
        }
      }
      val df = rows.toDF("time", "x", "y", "epoch")
      if (withEpoch) df else df.drop("epoch")
    }
    // fast blob: both epochs keep their fight — with and without the epoch col
    for (withEpoch <- Seq(true, false)) {
      val out = Detectors.detectFightsAllEpochs(pose, Some(blob(10.0, withEpoch)),
        parts, Detectors.FightParams()).collect()
      assert(out.length === 2, s"withEpoch=$withEpoch")
    }
    // stationary blob kills condition 3 in both epochs
    assert(Detectors.detectFightsAllEpochs(pose, Some(blob(0.0, withEpoch = true)),
      parts, Detectors.FightParams()).collect().isEmpty)
  }

  test("multi-epoch tube tests resolve identity pairs per epoch") {
    val tube = (0 to 69).flatMap { f =>
      if (f < 20) mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140, 50, -1)
      else mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140.0 + 3 * (f - 19), 50, 1)
    }
    // ep1 keeps A/B (winner A); ep2 renames A→D, B→C (winner D) — the
    // sorted id0 flips roles, so a shared/global identity mapping would
    // report the wrong winner
    val twoEpochs = tube.map { case (f, id, part, x, y) =>
      (new java.sql.Timestamp(t0.getTime + f * 20L), id, part, x, y, "ep1")
    } ++ tube.map { case (f, id, part, x, y) =>
      val renamed = if (id == "A") "D" else "C"
      (new java.sql.Timestamp(t0.getTime + 5L * 86400000L + f * 20L),
        renamed, part, x, y, "ep2")
    }
    val pose = twoEpochs.toDF("time", "identity", "part", "x", "y", "epoch")
    val out = Detectors.detectTubeTestsAllEpochs(pose, parts,
      Detectors.TubeParams()).collect()
    assert(out.length === 2)
    val byEpoch = out.map(r =>
      r.getAs[String]("epoch") -> r.getAs[String]("winner_identity")).toMap
    assert(byEpoch === Map("ep1" -> "A", "ep2" -> "D"))
  }

  test("periods24h splits at the boundary hour like the reference") {
    val zone = java.time.ZoneOffset.UTC
    def us(s: String) = java.time.Instant.parse(s).toEpochMilli * 1000L
    // start 23:00 day1, end 04:00 day3 → [23:00→02:00), [02:00→02:00+24h), [02:00→04:00)
    val p = Detectors.periods24h(us("2024-06-01T23:00:00Z"), us("2024-06-03T04:00:00Z"), 2, zone)
    assert(p === Seq(
      (us("2024-06-01T23:00:00Z"), us("2024-06-02T02:00:00Z")),
      (us("2024-06-02T02:00:00Z"), us("2024-06-03T02:00:00Z")),
      (us("2024-06-03T02:00:00Z"), us("2024-06-03T04:00:00Z"))))
    // epoch entirely before the first boundary → single period
    val q = Detectors.periods24h(us("2024-06-01T03:00:00Z"), us("2024-06-01T23:00:00Z"), 2, zone)
    assert(q === Seq((us("2024-06-01T03:00:00Z"), us("2024-06-01T23:00:00Z"))))
  }

  test("maintenance exclusion: a fight inside the maintenance window is dropped") {
    val rows = (0 to 260).flatMap { f =>
      if (f >= 100 && f <= 200) {
        val x = 100.0 + (f - 100) * 10.0
        mouse(f, "A", x, 100, 1, noseHead = 10.0) ++
          mouse(f, "B", x + 3, 104, 1, noseHead = 10.0)
      } else mouse(f, "A", 100, 100, 1) ++ mouse(f, "B", 400, 400, 1)
    }
    // control: full data yields the fight
    assert(Detectors.detectFights(poseDf(rows), None, parts,
      Detectors.FightParams()).collect().length === 1)
    // maintenance covers frames 120+ (experiment interval ends at frame
    // 119): the surviving 20-frame fragment is under the 1 s duration
    // floor → no events. (A maintenance window with candidate runs on BOTH
    // sides merges via empty-frame bridging — the same continuity the
    // reference gets from positionally collapsing excluded rows.)
    val iv = Seq(
      (new java.sql.Timestamp(t0.getTime), new java.sql.Timestamp(t0.getTime + 119 * 20L))
    ).toDF("start", "stop")
    val excluded = Detectors.detectFights(poseDf(rows), None, parts,
      Detectors.FightParams(), intervals = Some(iv)).collect()
    assert(excluded.isEmpty)
  }

  test("experimentIntervals: padding, state-change filter, and zip pairing") {
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // stream starts in Maintenance (Experiment entered before the range) and
    // ends without a Maintenance event → both sentinels kick in
    val env = Seq(
      (ts(10), "Maintenance"), (ts(20), "Experiment"), (ts(25), "Experiment"),
      (ts(40), "Maintenance"), (ts(50), "Experiment")
    ).toDF("time", "state")
    val iv = graft.operators.Intervals.experimentIntervals(
      env, "time", "state", ts(0), ts(100)).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1))).sortBy(_._1.getTime)
    assert(iv.toSeq === Seq((ts(0), ts(10)), (ts(20), ts(40)), (ts(50), ts(100))))
    // empty stream → the whole range is one experiment interval
    val empty = Seq.empty[(java.sql.Timestamp, String)].toDF("time", "state")
    val iv2 = graft.operators.Intervals.experimentIntervals(
      empty, "time", "state", ts(0), ts(100)).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1)))
    assert(iv2.toSeq === Seq((ts(0), ts(100))))
    // a REAL non-Maintenance row at exactly rangeEnd must not displace the
    // Maintenance end pad (it previously killed the trailing interval)
    val atEnd = Seq(
      (ts(20), "Maintenance"), (ts(50), "Experiment"), (ts(100), "Experiment")
    ).toDF("time", "state")
    val iv3 = graft.operators.Intervals.experimentIntervals(
      atEnd, "time", "state", ts(0), ts(100)).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1))).sortBy(_._1.getTime)
    assert(iv3.toSeq === Seq((ts(0), ts(20)), (ts(50), ts(100))))
    // …and a stream with NO real Maintenance at all must still pair every
    // start with the end pad (previously yielded zero intervals →
    // excludeOutside dropped ALL data)
    val noMaint = Seq((ts(50), "Experiment"), (ts(100), "Experiment"))
      .toDF("time", "state")
    val iv4 = graft.operators.Intervals.experimentIntervals(
      noMaint, "time", "state", ts(0), ts(100)).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1)))
    assert(iv4.toSeq === Seq((ts(50), ts(100))))
  }

  test("detectFights physical plan has no unpartitioned WindowExec (scale shape)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val rows = (0 to 60).flatMap { f =>
      mouse(f, "A", 100, 100, 1) ++ mouse(f, "B", 140, 104, 1)
    }
    val blob = (0 to 60).map { f =>
      (new java.sql.Timestamp(t0.getTime + f * 20L), f * 1.0, 0.0)
    }.toDF("time", "x", "y")
    val plan = Detectors.detectFights(poseDf(rows), Some(blob), parts,
      Detectors.FightParams()).queryExecution.executedPlan
    val bad = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty,
      s"unpartitioned windows found:\n${bad.map(_.simpleStringWithNodeId()).mkString("\n")}")
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
