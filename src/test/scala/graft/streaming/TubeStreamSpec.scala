package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import java.nio.file.Files
import graft.TestSpark
import graft.behavior.Detectors

/** Incremental tube-test detection ([[TubeStream]]) differential-tested
  * against the batch detector — same planted corridor fixtures as
  * DetectorSpec, cut across poll frontiers. */
class TubeStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val parts = Map("nose" -> "nose", "head" -> "head",
    "centroid" -> "spine2", "tail_base" -> "spine4")
  val t0 = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
  val t0us = t0.getTime * 1000L
  val durUs = 20000L // 50 fps

  /** Pose rows with sub-frame jitter (f % 7 ms) so event timestamps
    * exercise the slot-min path, like the FightStream fixtures. */
  def poseDf(rows: Seq[(Int, String, String, Double, Double)]): DataFrame =
    rows.map { case (frame, id, part, x, y) =>
      (new java.sql.Timestamp(t0.getTime + frame * 20L + frame % 7), id, part, x, y)
    }.toDF("time", "identity", "part", "x", "y")

  def mouse(frame: Int, id: String, cx: Double, cy: Double, dir: Double)
      : Seq[(Int, String, String, Double, Double)] = Seq(
    (frame, id, "nose", cx + dir * 10, cy),
    (frame, id, "head", cx + dir * 8, cy),
    (frame, id, "spine2", cx, cy),
    (frame, id, "spine4", cx - dir * 10, cy))

  /** Stand-off frames 100–119 (candidates), B turns and retreats 120–169,
    * calm-far elsewhere. */
  def standoffFixture(gapFrames: Set[Int] = Set.empty)
      : Seq[(Int, String, String, Double, Double)] =
    (0 to 300).flatMap { f =>
      if (gapFrames.contains(f)) Nil
      else if (f >= 100 && f < 120)
        mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140, 50, -1)
      else if (f >= 120 && f < 170)
        mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 140.0 + 3 * (f - 119), 50, 1)
      else
        mouse(f, "A", 100, 50, 1) ++ mouse(f, "B", 2000, 2000, -1)
    }

  def key(e: Detectors.TubeTestEvent) =
    (e.start_ts.getTime, e.end_ts.getTime, e.winner_identity)

  def batchEvents(rows: Seq[(Int, String, String, Double, Double)],
      roi: Option[Detectors.Roi] = None): Set[(Long, Long, String)] =
    Detectors.detectTubeTests(poseDf(rows), parts, Detectors.TubeParams(),
      roi = roi).collect().map(key).toSet

  test("incremental tube-test detection ≡ batch on a two-chunk fixture") {
    val rows = standoffFixture()
    val base = Files.createTempDirectory("graft_tubestream").toString
    val poseDir = s"$base/pose"; val work = s"$base/work"
    val p = Detectors.TubeParams()
    // chunk 1: the frontier stops MID-EVENT (inside the search window)
    poseDf(rows.filter(_._1 <= 130)).write.parquet(s"$poseDir/chunk1")
    TubeStream.pollTubeTests(spark, s"$poseDir/*", work, parts, p, t0us,
      Seq("A", "B"), t0us + 131L * durUs)
    assert(TubeStream.tubeEvents(spark, work).collect().isEmpty,
      "candidate run still open at the mid-event frontier: nothing may be emitted")
    // chunk 2 lands; final poll past the super-gap horizon
    poseDf(rows.filter(_._1 > 130)).write.parquet(s"$poseDir/chunk2")
    TubeStream.pollTubeTests(spark, s"$poseDir/*", work, parts, p, t0us,
      Seq("A", "B"), t0us + 300L * durUs)
    val stream = TubeStream.tubeEvents(spark, work).collect().map(key).toSet
    val batch = batchEvents(rows)
    assert(batch.size === 1)
    val (startMs, endMs, winner) = batch.head
    assert(winner === "A")
    // start = frame 100's min skeleton time (jitter 100 % 7 = 2 ms)
    assert(startMs === t0.getTime + 100L * 20L + 2L)
    assert(endMs === t0.getTime + 120L * 20L + 120 % 7)
    assert(stream === batch)
    // idempotency: an empty re-poll emits nothing new (exactly-once)
    TubeStream.pollTubeTests(spark, s"$poseDir/*", work, parts, p, t0us,
      Seq("A", "B"), t0us + 310L * durUs)
    assert(TubeStream.tubeEvents(spark, work).collect().map(key).toSet === batch)
  }

  test("camera gap inside the search window: densified slice ≡ batch spine") {
    // dropout frames 125–144 inside the search window [120, 169]: the batch
    // spine has all-NaN rows there; the stream slice must synthesize them
    val rows = standoffFixture(gapFrames = (125 to 144).toSet)
    val base = Files.createTempDirectory("graft_tubestream_gap").toString
    val poseDir = s"$base/pose"; val work = s"$base/work"
    val p = Detectors.TubeParams()
    poseDf(rows).write.parquet(s"$poseDir/chunk1")
    TubeStream.pollTubeTests(spark, s"$poseDir/*", work, parts, p, t0us,
      Seq("A", "B"), t0us + 300L * durUs)
    val stream = TubeStream.tubeEvents(spark, work).collect().map(key).toSet
    val batch = batchEvents(rows)
    assert(batch.size === 1, "gap fixture must still produce the event in batch")
    assert(stream === batch)
  }

  test("randomized differential: pollTubeTests ≡ detectTubeTests over mixed walks") {
    import scala.util.Random
    val p = Detectors.TubeParams()
    for (seed <- Seq(7, 31)) {
      val rnd = new Random(seed)
      // random segment walk over corridor states; 'retreat' follows
      // 'standoff' so some walks complete a tube test and some don't
      val segs = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
      segs += (("apart", 10))
      var total = 10
      while (total < 900) {
        val st = Seq("apart", "standoff", "retreat", "gap", "noseless")(rnd.nextInt(5))
        val len = 15 + rnd.nextInt(80)
        segs += ((st, len)); total += len
      }
      def mouseMaybeNoseless(f: Int, id: String, cx: Double, cy: Double,
          dir: Double, noseless: Boolean) = {
        val all = mouse(f, id, cx, cy, dir)
        if (noseless) all.filterNot(_._3 == "nose") else all
      }
      var f0 = 0
      val rows = segs.flatMap { case (st, len) =>
        val out = (f0 until f0 + len).flatMap { f =>
          val y = 50.0 + (f0 % 13)
          st match {
            case "apart" =>
              mouse(f, "A", 100, y, 1) ++ mouse(f, "B", 3000, 3000, -1)
            case "standoff" =>
              mouse(f, "A", 100, y, 1) ++ mouse(f, "B", 140, y, -1)
            case "retreat" =>
              mouse(f, "A", 100, y, 1) ++
                mouse(f, "B", 140.0 + 3 * (f - f0), y, 1)
            case "gap" => Nil
            case _ => // noseless stand-off: orientation falls back to head
              mouseMaybeNoseless(f, "A", 100, y, 1, noseless = true) ++
                mouseMaybeNoseless(f, "B", 140, y, -1, noseless = true)
          }
        }
        f0 += len
        out
      }.toSeq
      val maxF = f0
      // poll cuts inside 'apart' segments (frontier-spanning gaps are the
      // documented caveat; mid-event cuts are the dedicated test above)
      val apartCuts = {
        var acc = 0
        segs.collect { case (st, len) =>
          val mid = acc + len / 2; acc += len
          (st, mid)
        }.filter(_._1 == "apart").map(_._2).filter(c => c > 50 && c < maxF - 60)
      }
      val superGap = math.max(p.maxFrameGap,
        math.ceil(p.fps * p.searchWindowSeconds).toLong)
      val cuts = (apartCuts.take(2) :+ (maxF + superGap.toInt + 5)).sorted
      val base = Files.createTempDirectory(s"graft_tuberand$seed").toString
      val poseDir = s"$base/pose"; val work = s"$base/work"
      var prev = 0
      cuts.zipWithIndex.foreach { case (cut, i) =>
        val chunk = rows.filter(r => r._1 >= prev && r._1 < cut)
        if (chunk.nonEmpty) poseDf(chunk).write.parquet(s"$poseDir/chunk$i")
        prev = cut
        TubeStream.pollTubeTests(spark, s"$poseDir/*", work, parts, p, t0us,
          Seq("A", "B"), t0us + cut.toLong * durUs)
      }
      val stream = TubeStream.tubeEvents(spark, work).collect().map(key).toSet
      val batch = batchEvents(rows)
      assert(stream === batch, s"seed=$seed segs=${segs.toList}")
      info(s"seed=$seed events=${batch.size}")
    }
  }

  test("ROI gate in the silver plan ≡ batch roi parameter") {
    val rows = standoffFixture()
    val p = Detectors.TubeParams()
    // corridor-covering annulus: event survives in both modes
    val keepRoi = Some(Detectors.Roi(0.0, 50.0, 50.0, 400.0))
    // gate circle over A's stand-off spot: every candidate rejected
    val gateRoi = Some(Detectors.Roi(0.0, 50.0, 50.0, 400.0,
      gates = Seq((100.0, 50.0)), gateWidth = 15.0))
    for ((roi, name) <- Seq((keepRoi, "keep"), (gateRoi, "gate"))) {
      val base = Files.createTempDirectory(s"graft_tubestream_roi_$name").toString
      val poseDir = s"$base/pose"; val work = s"$base/work"
      poseDf(rows).write.parquet(s"$poseDir/chunk1")
      TubeStream.pollTubeTests(spark, s"$poseDir/*", work, parts, p, t0us,
        Seq("A", "B"), t0us + 300L * durUs, roi = roi)
      val stream = TubeStream.tubeEvents(spark, work).collect().map(key).toSet
      val batch = batchEvents(rows, roi = roi)
      assert(stream === batch, s"roi=$name")
      if (name == "keep") assert(batch.size === 1) else assert(batch.isEmpty)
    }
  }
}
