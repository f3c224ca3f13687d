package graft.combine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Golden test for the combine ETL (reference combine_pose_id_chunk.py):
  * assignment by likelihood under the distance gate, full-instance
  * writeback, unmatched-pose drop, and the J4 singleton epilogue. */
class CombineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val t0 = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
  private def ts(offsetUs: Long) = new java.sql.Timestamp(t0.getTime + offsetUs / 1000)

  test("combineChunk golden: gate, assignment, writeback, drop, singleton inference") {
    // tick 1 (t0+2ms): poses A(1),B(2),C(3); ids alice,bob → C unmatched
    // tick 2 (t0+42ms): pose D(4); id carol too far → J4 singleton pair
    val pose = Seq(
      (ts(2000), 1L, "anchor_spine2", 10.0, 10.0),
      (ts(2000), 1L, "head", 11.0, 12.0),
      (ts(2000), 2L, "anchor_spine2", 100.0, 100.0),
      (ts(2000), 3L, "anchor_spine2", 500.0, 500.0),
      (ts(42000), 4L, "anchor_spine2", 200.0, 200.0))
      .toDF("time", "pose_id", "part", "x", "y")
    val ids = Seq(
      (ts(1000), "alice", Map("alice" -> 0.9, "bob" -> 0.1), 12.0, 10.0),
      (ts(1000), "bob", Map("bob" -> 0.8, "alice" -> 0.2), 98.0, 102.0),
      (ts(41000), "carol", Map("carol" -> 0.7), 600.0, 600.0))
      .toDF("time", "identity", "identity_likelihood", "x_top", "y_top")

    val out = Combine.combineChunk(pose, ids, Combine.Params(fps = 50, maxDistance = 40))
      .select("pose_id", "part", "identity", "identity_likelihood")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getMap[String, Double](3).toMap))

    // pose C (unmatched, no feasible id) is dropped
    assert(!out.exists(_._1 == 3L))
    // pose A: both part rows carry alice + her full likelihood map
    val aRows = out.filter(_._1 == 1L)
    assert(aRows.length === 2)
    assert(aRows.forall(_._3 == "alice"))
    assert(aRows.forall(_._4 == Map("alice" -> 0.9, "bob" -> 0.1)))
    // pose B: bob
    val bRows = out.filter(_._1 == 2L)
    assert(bRows.map(_._3).toSeq === Seq("bob"))
    // pose D: inferred singleton pair with carol, NaN/null likelihood map
    val dRows = out.filter(_._1 == 4L)
    assert(dRows.map(_._3).toSeq === Seq("carol"))
    assert(dRows.head._4 == null, "inferred pair has no verified likelihood map")
  }

  test("writeback carries the MATCHED (max-likelihood) detection's map when an identity repeats in a tick") {
    // two 'alice' detections in the same tick: the solver matches the
    // min-cost (= max alice-likelihood) one; the writeback map must be that
    // detection's map, deterministically
    val pose = Seq((ts(2000), 1L, "anchor_spine2", 10.0, 10.0))
      .toDF("time", "pose_id", "part", "x", "y")
    val ids = Seq(
      (ts(1000), "alice", Map("alice" -> 0.4, "bob" -> 0.6), 12.0, 10.0),
      (ts(3000), "alice", Map("alice" -> 0.9, "bob" -> 0.1), 11.0, 10.0))
      .toDF("time", "identity", "identity_likelihood", "x_top", "y_top")
    val out = Combine.combineChunk(pose, ids, Combine.Params(fps = 50, maxDistance = 40))
      .select("pose_id", "identity", "identity_likelihood").collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "alice")
    assert(out.head.getMap[String, Double](2).toMap === Map("alice" -> 0.9, "bob" -> 0.1))
  }

  test("writeback never leaks the map of an infeasible (out-of-range) duplicate detection") {
    // same identity twice: D1 likelihood 0.95 but 500 px away (cost +inf,
    // unmatchable); D2 likelihood 0.4 within range (matched). The output
    // map must be D2's, not the higher-likelihood D1's.
    val pose = Seq((ts(2000), 1L, "anchor_spine2", 10.0, 10.0))
      .toDF("time", "pose_id", "part", "x", "y")
    val ids = Seq(
      (ts(1000), "alice", Map("alice" -> 0.95, "bob" -> 0.05), 510.0, 10.0),
      (ts(3000), "alice", Map("alice" -> 0.4, "bob" -> 0.6), 11.0, 10.0))
      .toDF("time", "identity", "identity_likelihood", "x_top", "y_top")
    val out = Combine.combineChunk(pose, ids, Combine.Params(fps = 50, maxDistance = 40))
      .select("pose_id", "identity", "identity_likelihood").collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "alice")
    assert(out.head.getMap[String, Double](2).toMap === Map("alice" -> 0.4, "bob" -> 0.6))
  }

  test("writeback excludes an infeasible duplicate even with a BIT-EQUAL likelihood value") {
    // D1 is out of range but has the same alice-likelihood VALUE as the
    // matched D2 (and a larger position tiebreak) — only the feasibility
    // gate carried into the writeback join keeps its map out
    val pose = Seq((ts(2000), 1L, "anchor_spine2", 10.0, 10.0))
      .toDF("time", "pose_id", "part", "x", "y")
    val ids = Seq(
      (ts(1000), "alice", Map("alice" -> 0.4, "bob" -> 0.99), 510.0, 10.0),
      (ts(3000), "alice", Map("alice" -> 0.4, "bob" -> 0.6), 11.0, 10.0))
      .toDF("time", "identity", "identity_likelihood", "x_top", "y_top")
    val out = Combine.combineChunk(pose, ids, Combine.Params(fps = 50, maxDistance = 40))
      .select("pose_id", "identity", "identity_likelihood").collect()
    assert(out.length === 1)
    assert(out.head.getMap[String, Double](2).toMap === Map("alice" -> 0.4, "bob" -> 0.6),
      "the out-of-range duplicate's map must not leak in on a cost tie")
  }

  test("projectAndUnion: per-camera homography + anchor filter + union") {
    val cam1 = Seq((ts(0), "m0", Map("m0" -> 0.9), "anchor_spine2", 10.0, 20.0),
      (ts(0), "m0", Map("m0" -> 0.9), "head", 1.0, 1.0))
      .toDF("time", "identity", "identity_likelihood", "part", "x", "y")
    val cam2 = Seq((ts(0), "m1", Map("m1" -> 0.8), "anchor_spine2", 30.0, 40.0))
      .toDF("time", "identity", "identity_likelihood", "part", "x", "y")
    // pure translations as homographies
    val h1 = Seq(1.0, 0, 5, 0, 1, -5, 0, 0, 1)
    val h2 = Seq(1.0, 0, 100, 0, 1, 200, 0, 0, 1)
    val out = Combine.projectAndUnion(Seq((cam1, h1), (cam2, h2)))
      .select("identity", "x_top", "y_top").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(out === Set(("m0", 15.0, 15.0), ("m1", 130.0, 240.0)),
      "anchor rows only, translated per camera")
  }

  test("pollCombine: incremental chunks, pairing, idempotency, missing-id chunk") {
    import graft.streaming.CombineStream
    val base = java.nio.file.Files.createTempDirectory("graft_combstream").toString
    val poseDir = s"$base/pose"; val idsDir = s"$base/ids"; val work = s"$base/work"
    val p = Combine.Params(fps = 50, maxDistance = 40)
    def poseChunk(off: Long) = Seq(
      (ts(off + 2000), off + 1L, "anchor_spine2", 10.0, 10.0),
      (ts(off + 2000), off + 1L, "head", 11.0, 12.0),
      (ts(off + 2000), off + 2L, "anchor_spine2", 100.0, 100.0))
      .toDF("time", "pose_id", "part", "x", "y")
    def idsChunk(off: Long) = Seq(
      (ts(off + 1000), "alice", Map("alice" -> 0.9), 12.0, 10.0),
      (ts(off + 1000), "bob", Map("bob" -> 0.8), 98.0, 102.0))
      .toDF("time", "identity", "identity_likelihood", "x_top", "y_top")
    def got() = CombineStream.combined(spark, work)
      .select("pose_id", "part", "identity").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // chunk c1 lands; poll
    poseChunk(0).write.parquet(s"$poseDir/c1")
    idsChunk(0).write.parquet(s"$idsDir/c1")
    CombineStream.pollCombine(spark, poseDir, idsDir, work, p)
    val want1 = Combine.combineChunk(poseChunk(0), idsChunk(0), p)
      .select("pose_id", "part", "identity").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got() === want1)
    // empty re-poll: nothing reprocessed, nothing duplicated
    CombineStream.pollCombine(spark, poseDir, idsDir, work, p)
    assert(got() === want1)
    // c2 lands WITHOUT its id chunk (ingestion race), c3 lands paired
    poseChunk(3600L * 1000000L).write.parquet(s"$poseDir/c2")
    poseChunk(7200L * 1000000L).write.parquet(s"$poseDir/c3")
    idsChunk(7200L * 1000000L).write.parquet(s"$idsDir/c3")
    CombineStream.pollCombine(spark, poseDir, idsDir, work, p)
    val want3 = Combine.combineChunk(
        poseChunk(7200L * 1000000L), idsChunk(7200L * 1000000L), p)
      .select("pose_id", "part", "identity").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got() === (want1 ++ want3), "c2 deferred, not silently emptied")
    // c2's ids arrive late: the deferred chunk is retried on the next poll
    // even though its pose files are already in the checkpoint
    idsChunk(3600L * 1000000L).write.parquet(s"$idsDir/c2")
    CombineStream.pollCombine(spark, poseDir, idsDir, work, p)
    val want2 = Combine.combineChunk(
        poseChunk(3600L * 1000000L), idsChunk(3600L * 1000000L), p)
      .select("pose_id", "part", "identity").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got() === (want1 ++ want2 ++ want3), "late id chunk recovered")
    // a chunk whose ids never arrive finalizes to the reference's empty
    // output on the last poll
    poseChunk(10800L * 1000000L).write.parquet(s"$poseDir/c4")
    CombineStream.pollCombine(spark, poseDir, idsDir, work, p, finalizeMissing = true)
    assert(got() === (want1 ++ want2 ++ want3), "c4 finalized empty")
    assert(new java.io.File(s"$work/out/c4").exists, "c4 has an (empty) output dir")
  }

  test("pollCombineMulti: 2 epochs through ONE poller ≡ per-chunk batch, deferral per epoch") {
    import graft.streaming.CombineStream
    import graft.streaming.CombineStream.CombineEpoch
    val base = java.nio.file.Files.createTempDirectory("graft_combmulti").toString
    val work = s"$base/work"
    val p = Combine.Params(fps = 50, maxDistance = 40)
    def poseChunk(off: Long) = Seq(
      (ts(off + 2000), off + 1L, "anchor_spine2", 10.0, 10.0),
      (ts(off + 2000), off + 1L, "head", 11.0, 12.0),
      (ts(off + 2000), off + 2L, "anchor_spine2", 100.0, 100.0))
      .toDF("time", "pose_id", "part", "x", "y")
    def idsChunk(off: Long, who: String) = Seq(
      (ts(off + 1000), who, Map(who -> 0.9), 12.0, 10.0),
      (ts(off + 1000), "bob", Map("bob" -> 0.8), 98.0, 102.0))
      .toDF("time", "identity", "identity_likelihood", "x_top", "y_top")
    val epochs = Seq(
      CombineEpoch("rigA", s"$base/poseA", s"$base/idsA"),
      CombineEpoch("rigB", s"$base/poseB", s"$base/idsB"))
    def got() = CombineStream.combinedByEpoch(spark, epochs, work)
      .select("epoch", "pose_id", "identity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    def want(epoch: String, off: Long, who: String) =
      Combine.combineChunk(poseChunk(off), idsChunk(off, who), p)
        .select("pose_id", "identity").collect()
        .map(r => (epoch, r.getLong(0), r.getString(1))).toSet
    // poll 1: rigA lands c1 paired; rigB lands c1 WITHOUT ids (race)
    poseChunk(0).write.parquet(s"$base/poseA/c1")
    idsChunk(0, "alice").write.parquet(s"$base/idsA/c1")
    poseChunk(0).write.parquet(s"$base/poseB/c1")
    CombineStream.pollCombineMulti(spark, epochs, work, p)
    assert(got() === want("rigA", 0, "alice"),
      "rigB's unpaired chunk deferred, rigA's combined")
    // poll 2: rigB's ids arrive late (same-named chunk, DIFFERENT identity
    // so cross-epoch pairing would be caught); rigA lands c2 paired
    idsChunk(0, "carol").write.parquet(s"$base/idsB/c1")
    poseChunk(3600L * 1000000L).write.parquet(s"$base/poseA/c2")
    idsChunk(3600L * 1000000L, "alice").write.parquet(s"$base/idsA/c2")
    CombineStream.pollCombineMulti(spark, epochs, work, p)
    val all = want("rigA", 0, "alice") ++
      want("rigA", 3600L * 1000000L, "alice") ++ want("rigB", 0, "carol")
    assert(got() === all, "late ids recovered within the right epoch")
    // idempotent empty re-poll
    CombineStream.pollCombineMulti(spark, epochs, work, p)
    assert(got() === all)
    // exactly ONE streaming checkpoint for both epochs
    assert(new java.io.File(s"$work/ckpt_combine").exists)
    assert(!new java.io.File(s"$work/ckpt_combine_1").exists)
    // the epoch list is manifest-pinned: a reorder must fail loudly
    val ex = intercept[IllegalArgumentException] {
      CombineStream.pollCombineMulti(spark, epochs.reverse, work, p)
    }
    assert(ex.getMessage.contains("epoch list"))
  }

  test("pollCombine catch-up: 6 chunks in ONE micro-batch through the concurrent pool ≡ serial") {
    import graft.streaming.CombineStream
    val base = java.nio.file.Files.createTempDirectory("graft_combcatchup").toString
    val poseDir = s"$base/pose"; val idsDir = s"$base/ids"
    val p = Combine.Params(fps = 50, maxDistance = 40)
    def poseChunk(off: Long) = Seq(
      (ts(off + 2000), off + 1L, "anchor_spine2", 10.0, 10.0),
      (ts(off + 2000), off + 2L, "anchor_spine2", 100.0, 100.0))
      .toDF("time", "pose_id", "part", "x", "y")
    def idsChunk(off: Long) = Seq(
      (ts(off + 1000), "alice", Map("alice" -> 0.9), 12.0, 10.0),
      (ts(off + 1000), "bob", Map("bob" -> 0.8), 98.0, 102.0))
      .toDF("time", "identity", "identity_likelihood", "x_top", "y_top")
    val offs = (0 until 6).map(_ * 3600L * 1000000L)
    offs.zipWithIndex.foreach { case (off, i) =>
      poseChunk(off).write.parquet(s"$poseDir/c$i")
      idsChunk(off).write.parquet(s"$idsDir/c$i")
    }
    // all 6 discovered in one AvailableNow micro-batch, pool of 3
    CombineStream.pollCombineMulti(spark,
      Seq(CombineStream.CombineEpoch("", poseDir, idsDir)),
      s"$base/work_par", p, maxConcurrentChunks = 3)
    // serial reference over the same chunks
    CombineStream.pollCombineMulti(spark,
      Seq(CombineStream.CombineEpoch("", poseDir, idsDir)),
      s"$base/work_ser", p, maxConcurrentChunks = 1)
    def all(work: String) = CombineStream.combined(spark, work)
      .select("time", "pose_id", "identity").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2))).toSet
    val par = all(s"$base/work_par")
    assert(par === all(s"$base/work_ser"), "pool ≡ serial")
    assert(par.map(_._2) === offs.flatMap(o => Seq(o + 1L, o + 2L)).toSet,
      "every chunk's pose ids combined exactly once")
  }

  test("randomized differential: combineChunk ≡ brute-force per-tick model") {
    import scala.util.Random
    val periodUs = 20000L; val tolUs = 5000L; val maxDist = 40.0
    // max-cardinality then min-total-cost matching over feasible cells
    // (the JV solver's BIG-padding semantics), brute-forced for ≤4×4
    def bruteAssign(cost: Array[Array[Double]]): Array[Int] = {
      val n = cost.length; val m = if (n == 0) 0 else cost(0).length
      var bestCard = -1; var bestCost = 0.0; var bestAsg = Array.fill(n)(-1)
      def rec(i: Int, used: Set[Int], acc: List[Int], card: Int, c: Double): Unit =
        if (i == n) {
          if (card > bestCard || (card == bestCard && c < bestCost - 1e-12)) {
            bestCard = card; bestCost = c; bestAsg = acc.reverse.toArray
          }
        } else {
          rec(i + 1, used, -1 :: acc, card, c)
          var j = 0
          while (j < m) {
            if (!used(j) && !cost(i)(j).isPosInfinity)
              rec(i + 1, used + j, j :: acc, card + 1, c + cost(i)(j))
            j += 1
          }
        }
      rec(0, Set.empty, Nil, 0, 0.0)
      bestAsg
    }
    for (seed <- Seq(3, 17, 41)) {
      val rnd = new Random(seed)
      case class Anchor(tUs: Long, poseId: Long, x: Double, y: Double)
      case class Det(tUs: Long, ident: String, lik: Map[String, Double],
        x: Double, y: Double)
      val anchors = scala.collection.mutable.ArrayBuffer.empty[Anchor]
      val extraParts = scala.collection.mutable.ArrayBuffer.empty[Anchor] // "body" rows
      val dets = scala.collection.mutable.ArrayBuffer.empty[Det]
      val nTicks = 40
      var poseId = 0L
      // pin the grid: anchors exactly on the first and last tick
      anchors += Anchor(0L, { poseId += 1; poseId }, 10.0, 10.0)
      anchors += Anchor((nTicks - 1) * periodUs, { poseId += 1; poseId }, 20.0, 20.0)
      for (k <- 1 until nTicks - 1) {
        val tick = k * periodUs
        val nP = rnd.nextInt(4); val nI = rnd.nextInt(4)
        val tickPoses = (0 until nP).map { idx =>
          poseId += 1
          // ms-aligned jitter: the ts() helper truncates µs to ms, so the
          // model and the engine must see the same instant. Anchors ≥80 px
          // apart: the reference cost is likelihood-only, so one detection
          // feasible for TWO anchors is a structural assignment tie (the
          // engine resolves it deterministically, the brute-force model
          // arbitrarily) — keep each detection near at most one anchor
          val a = Anchor(tick + (rnd.nextInt(9) - 4) * 1000L,
            poseId, idx * 100.0 + rnd.nextDouble() * 20, rnd.nextDouble() * 200)
          anchors += a
          if (rnd.nextDouble() < 0.3) extraParts += a
          a
        }
        var usedMissingKey = false
        (0 until nI).foreach { _ =>
          val ident = Seq("A", "B", "C")(rnd.nextInt(3))
          val near = tickPoses.nonEmpty && rnd.nextDouble() < 0.6
          val (dx, dy) =
            if (near) { val b = tickPoses(rnd.nextInt(tickPoses.length))
              (b.x + rnd.nextDouble() * 20 - 10, b.y + rnd.nextDouble() * 20 - 10) }
            else (rnd.nextDouble() * 200 + 500, rnd.nextDouble() * 200 + 500)
          // at most one missing-own-key det per tick, never a duplicated
          // identity (keeps the optimum unique — see cost ties note)
          val dropOwnKey = !usedMissingKey && rnd.nextDouble() < 0.1 &&
            !dets.exists(d => math.abs(d.tUs - tick) <= tolUs && d.ident == ident)
          if (dropOwnKey) usedMissingKey = true
          val lik = (if (dropOwnKey) Map.empty[String, Double]
            else Map(ident -> rnd.nextDouble())) ++
            Map("other" -> rnd.nextDouble())
          dets += Det(tick + (rnd.nextInt(9) - 4) * 1000L, ident, lik, dx, dy)
        }
        // orphan anchor halfway between ticks: outside every band
        if (rnd.nextDouble() < 0.2 && k < nTicks - 2) {
          poseId += 1
          anchors += Anchor(tick + periodUs / 2, poseId,
            rnd.nextDouble() * 200, rnd.nextDouble() * 200)
        }
      }
      // ---- in-memory model ----
      val allPoseTs = (anchors ++ extraParts).map(_.tUs)
      val t0m = allPoseTs.min; val t1m = allPoseTs.max
      val ticksM = (t0m to t1m by periodUs).toSeq
      val expected = scala.collection.mutable.Map.empty[Long, (String, Option[Map[String, Double]])]
      ticksM.foreach { tick =>
        val as = anchors.filter(a => math.abs(a.tUs - tick) <= tolUs).toArray
        val ds = dets.filter(d => math.abs(d.tUs - tick) <= tolUs).toArray
        if (as.nonEmpty && ds.nonEmpty) {
          val idents = ds.map(_.ident).distinct
          val cost = Array.fill(as.length, idents.length)(Double.PositiveInfinity)
          val bestDet = Array.fill[Det](as.length, idents.length)(null)
          for (i <- as.indices; d <- ds) {
            val j = idents.indexOf(d.ident)
            val dist = math.hypot(as(i).x - d.x, as(i).y - d.y)
            val c = if (dist <= maxDist) -d.lik.getOrElse(d.ident, 0.0)
              else Double.PositiveInfinity
            if (c < cost(i)(j)) { cost(i)(j) = c; bestDet(i)(j) = d }
          }
          val m = bruteAssign(cost)
          m.zipWithIndex.foreach { case (j, i) =>
            if (j >= 0)
              expected(as(i).poseId) = (idents(j), Some(bestDet(i)(j).lik))
          }
          val unL = as.indices.filter(m(_) < 0)
          val asgJ = m.filter(_ >= 0).toSet
          val unR = idents.indices.filterNot(asgJ)
          if (unL.size == 1 && unR.size == 1)
            expected(as(unL.head).poseId) = (idents(unR.head), None)
        }
      }
      // ---- engine ----
      val poseDf = (anchors.map(a => (ts(a.tUs), a.poseId, "anchor_spine2", a.x, a.y)) ++
        extraParts.map(a => (ts(a.tUs), a.poseId, "body", a.x + 1, a.y + 1)))
        .toSeq.toDF("time", "pose_id", "part", "x", "y")
      val idsDf = dets.map(d => (ts(d.tUs), d.ident, d.lik, d.x, d.y))
        .toSeq.toDF("time", "identity", "identity_likelihood", "x_top", "y_top")
      val out = Combine.combineChunk(poseDf, idsDf,
          Combine.Params(fps = 50, maxDistance = maxDist))
        .select("pose_id", "part", "identity", "identity_likelihood")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getMap[String, Double](3).toMap)))
      val gotByPose = out.groupBy(_._1)
      assert(gotByPose.keySet === expected.keySet.toSet,
        s"seed=$seed matched pose set differs")
      expected.foreach { case (pid, (ident, lik)) =>
        val rows = gotByPose(pid)
        assert(rows.forall(_._3 == ident), s"seed=$seed pose=$pid identity")
        assert(rows.forall(_._4 == lik), s"seed=$seed pose=$pid likelihood map")
        // every part row of a matched pose instance is written back
        val nParts = 1 + extraParts.count(_.poseId == pid)
        assert(rows.length === nParts, s"seed=$seed pose=$pid part fanout")
      }
    }
  }
}
