package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Quadrant-camera selection goldens: FOV projection, PIP membership with
  * nearest fallback, and every branch of the per-timestamp cascade. */
class QuadrantsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // four 100×100 FOVs tiling [0,200)²: translations of a 100×100 camera
  // (+1 px overlap is avoided by the corner at w-1 = 99)
  private def translation(dx: Double, dy: Double) =
    Seq(1.0, 0, dx, 0, 1, dy, 0, 0, 1)
  private val homos = Seq(
    translation(0, 0), translation(100, 0),
    translation(0, 100), translation(100, 100))
  private val fovs = homos.map(h => Quadrants.fovCorners(h, 100, 100))
  private val cams = Seq("CamNW", "CamNE", "CamSW", "CamSE")

  test("fovCorners projects and orders image corners TL,TR,BR,BL") {
    assert(fovs(1) === Seq((100.0, 0.0), (199.0, 0.0), (199.0, 99.0), (100.0, 99.0)))
    assert(Quadrants.fovCenter(fovs(0)) === (49.5, 49.5))
  }

  test("withQuadrants: membership, outside fallback to nearest center") {
    val pos = Seq((1L, 50.0, 50.0), (2L, 150.0, 50.0), (3L, 500.0, 500.0))
      .toDF("id", "x", "y")
    val q = Quadrants.withQuadrants(pos, "x", "y", fovs).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getSeq[Int](r.fieldIndex("possible_quadrants")),
          r.getAs[Int]("most_central_quadrant"))).toMap
    assert(q(1L) === (Seq(0), 0))
    assert(q(2L) === (Seq(1), 1))
    // far outside every FOV → empty possibles, most-central = nearest (SE)
    assert(q(3L) === (Seq(), 3))
  }

  test("withQuadrants: single-FOV rig (least() needs >=2 children)") {
    val pos = Seq((1L, 50.0, 50.0), (2L, 500.0, 500.0), (3L, Double.NaN, 1.0))
      .toDF("id", "x", "y")
    val q = Quadrants.withQuadrants(pos, "x", "y", fovs.take(1)).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getSeq[Int](r.fieldIndex("possible_quadrants")),
          Option(r.getAs[Any]("most_central_quadrant")))).toMap
    assert(q(1L) === (Seq(0), Some(0)))
    assert(q(2L) === (Seq(), Some(0))) // outside → nearest = the only FOV
    assert(q(3L) === (Seq(), None))    // NaN coords stay null
  }

  test("selectQuadrant cascade: common singleton, central intersection, ties, no-common") {
    def ts(s: Int) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val pos = Seq(
      // t0: both mice in FOV 0 only → common singleton
      (ts(0), 30.0, 30.0), (ts(0), 60.0, 60.0),
      // t1: mice in different quadrants (0 and 3) → no common →
      // distinct most-centrals
      (ts(1), 30.0, 30.0), (ts(1), 150.0, 150.0),
      // t2: single mouse → no-common branch → its most-central
      (ts(2), 120.0, 40.0)
    ).toDF("time", "x", "y")
    val q = Quadrants.withQuadrants(pos, "x", "y", fovs)
    val out = Quadrants.selectQuadrant(q, "time", cams).collect()
      .map(r => r.getTimestamp(0) ->
        (r.getSeq[Int](1), r.getSeq[String](2))).toMap
    assert(out(ts(0)) === (Seq(0), Seq("CamNW")))
    assert(out(ts(1)) === (Seq(0, 3), Seq("CamNW", "CamSE")))
    assert(out(ts(2)) === (Seq(1), Seq("CamNE")))
  }

  test("randomized differential: selectQuadrant cascade ≡ in-memory model") {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val cams = Seq("Q0", "Q1", "Q2", "Q3")
    val seedTie = 42L
    for (seed <- Seq(13, 29, 61)) {
      val rnd = new scala.util.Random(seed)
      def ts(s: Int) = new java.sql.Timestamp(1700000000000L + s * 1000L)
      // random per-timestamp mouse rows: possible ⊆ {0..3} (any size incl.
      // empty), most_central ∈ possible or nearest, null = missing coords
      val rows = (0 until 200).flatMap { t =>
        val nMice = rnd.nextInt(4) // 0..3 rows at this timestamp
        (0 until nMice).map { _ =>
          if (rnd.nextDouble() < 0.1) (ts(t), null, null) // missing coords
          else {
            val poss = (0 to 3).filter(_ => rnd.nextDouble() < 0.45)
            val central =
              if (poss.nonEmpty) poss(rnd.nextInt(poss.length))
              else rnd.nextInt(4) // nearest-FOV fallback
            (ts(t), poss, Integer.valueOf(central))
          }
        }
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map {
          case (t, p, c) => org.apache.spark.sql.Row(t,
            if (p == null) Seq.empty[Int] else p, c)
        }),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("time",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("possible_quadrants",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.IntegerType)),
          org.apache.spark.sql.types.StructField("most_central_quadrant",
            org.apache.spark.sql.types.IntegerType))))
      val got = Quadrants.selectQuadrant(df, "time", cams, seedTie).collect()
        .map(r => r.getTimestamp(0).getTime ->
          (r.getSeq[Int](1), r.getSeq[String](2))).toMap
      // tie-break hash replicated via Spark itself (engine-exact murmur3)
      val hashes = df.select(col("time")).distinct()
        .withColumn("h", pmod(hash(col("time"), lit(seedTie)), lit(2)).cast("int"))
        .collect().map(r => r.getTimestamp(0).getTime -> r.getInt(1)).toMap
      // in-memory model of the reference cascade (determine_quadrant_camera)
      rows.groupBy(_._1.getTime).foreach { case (tMs, rs) =>
        val n = rs.size
        val possSets = rs.map(r => Option(r._2).getOrElse(Seq.empty[Int]).toSet)
        val common: Set[Int] =
          if (n < 2) Set.empty else possSets.reduce(_ intersect _)
        val centrals = rs.flatMap(r => Option(r._3).map(_.intValue))
        val cd = centrals.distinct.sorted
        val inter = cd.filter(common.contains)
        val maxC = if (cd.nonEmpty) cd.map(q => centrals.count(_ == q)).max else 0
        val modes = cd.filter(q => centrals.count(_ == q) == maxC)
        val expected: Seq[Int] =
          if (common.isEmpty) cd
          else if (common.size == 1) common.toSeq
          else if (inter.size == 1) inter
          else if (inter.size == 2) Seq(inter(hashes(tMs)))
          else modes
        val (gq, gc) = got(tMs)
        assert(gq.sorted === expected.sorted, s"seed=$seed t=$tMs quadrants")
        assert(gc === gq.map(cams), s"seed=$seed t=$tMs cameras")
      }
    }
  }

  test("selectQuadrant: seeded two-way tie-break is deterministic") {
    def ts(s: Int) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // overlapping FOVs so both mice sit in BOTH fov A and fov B, each
    // mouse most-central in a different one → intersection of size 2
    val wide = Seq(
      Seq((0.0, 0.0), (200.0, 0.0), (200.0, 100.0), (0.0, 100.0)),  // center (100,50)
      Seq((0.0, 0.0), (200.0, 0.0), (200.0, 140.0), (0.0, 140.0)))  // center (100,70)
    def run(seed: Long) = {
      val pos = Seq((ts(0), 100.0, 45.0), (ts(0), 100.0, 70.0)).toDF("time", "x", "y")
      val q = Quadrants.withQuadrants(pos, "x", "y", wide)
      Quadrants.selectQuadrant(q, "time", Seq("A", "B"), seed).collect()
        .head.getSeq[Int](1)
    }
    val first = run(7L)
    assert(first.length === 1 && (first.head == 0 || first.head == 1))
    assert(run(7L) === first, "same seed → same pick")
  }
}
