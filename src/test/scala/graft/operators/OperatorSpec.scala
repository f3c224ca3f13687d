package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import scala.util.Random

/** Property tests for the time-series primitives (SURVEY §5): sessionization
  * invariants, asof ⊆ band containment, bounded-fill bounds, and assignment
  * optimality vs brute force. Seeded random inputs, multiple rounds. */
class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sessionize: session count per key = gap exceedances + 1 (property)") {
    val rnd = new Random(7)
    val rows = for {
      user <- 0 until 20
      t <- Iterator.iterate(0L)(_ + 1 + rnd.nextInt(2000)).take(50).toSeq
    } yield (user.toLong, t)
    val df = rows.toDF("user", "t")
    val gap = 500L
    val sessed = Sessionize.sessionize(df, "t", Seq("user"), gap)
    val got = sessed.groupBy("user").agg(countDistinct("session_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).map { case (u, rs) =>
      val ts = rs.map(_._2).sorted
      u -> (1L + ts.zip(ts.tail).count { case (a, b) => b - a > gap })
    }
    assert(got === want)
  }

  test("asof backward with tolerance is contained in the band join (property)") {
    val rnd = new Random(13)
    val left = (0 until 200).map(i => (i.toLong, rnd.nextInt(100000).toLong))
      .toDF("lid", "t").withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val right = (0 until 200).map(i => (1000L + i, rnd.nextInt(100000).toLong))
      .toDF("rid", "t").withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val tol = 5000L
    val asof = AsOfJoin.asofJoin(left, right, "ts", Nil, AsOfJoin.Backward, Some(tol))
      .filter(col("rid").isNotNull)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // band: right.ts − left.ts ∈ [−tol, 0] (backward matches look back in time)
    val band = BandJoin.bandJoin(left, right, "ts", "ts", Nil, -tol, 0L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asof.subsetOf(band),
      s"asof produced pairs outside the band: ${asof.diff(band).take(5)}")
    // and the asof match is the max right.ts among band candidates per left row
    val bestInBand = BandJoin.bandJoin(left, right, "ts", "ts", Nil, -tol, 0L)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lid")
          .orderBy(col("ts_r").desc, col("rid").desc)))
      .filter(col("rn") === 1)
      .select("lid").distinct().count()
    assert(asof.map(_._1).size === bestInBand)
  }

  test("boundedFill: never bridges runs ≥ maxRun and only equal-flank runs (property)") {
    val rnd = new Random(21)
    // values with planted null runs of varying lengths
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Int])]
    var t = 0L
    for (_ <- 0 until 40) {
      val v = rnd.nextInt(3)
      val runLen = 1 + rnd.nextInt(6)
      rows += ((t, Some(v))); t += 1
      for (_ <- 0 until runLen) { rows += ((t, None)); t += 1 }
      // flank: same value half the time
      rows += ((t, Some(if (rnd.nextBoolean()) v else v + 10))); t += 1
    }
    val df = rows.toSeq.map { case (tt, v) => (tt, v.map(_.toLong)) }.toDF("t", "v")
    val maxRun = 4L
    val filled = Fill.boundedFill(df, "v", "t", Nil, maxRun, Some("vf"))
      .orderBy("t").collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    // reconstruct runs from the input and check fill decisions
    val arr = rows.toArray
    var i = 0
    while (i < arr.length) {
      if (arr(i)._2.isEmpty) {
        var j = i
        while (j < arr.length && arr(j)._2.isEmpty) j += 1
        val runLen = j - i
        val prev = if (i == 0) None else arr(i - 1)._2
        val next = if (j == arr.length) None else arr(j)._2
        val shouldFill = runLen < maxRun && prev.isDefined && prev == next
        for (k <- i until j) {
          val gotFilled = filled(k)._3
          if (shouldFill) assert(gotFilled === prev.map(_.toLong),
            s"run at $i len $runLen should fill with $prev")
          else assert(gotFilled.isEmpty,
            s"run at $i len $runLen flanks $prev/$next must stay null")
        }
        i = j
      } else i += 1
    }
  }

  test("boundedFill strict mode raises on an unfillable gap, permissive leaves null") {
    val df = Seq((0L, Some(1L)), (1L, None), (2L, Some(2L)), (3L, Some(3L)))
      .toDF("t", "v")
    // gap at t=1 has disagreeing flanks (1 vs 2) → unfillable
    val permissive = Fill.boundedFill(df, "v", "t", Nil, 4L, Some("vf"))
      .orderBy("t").collect()
    assert(permissive(1).isNullAt(2), "permissive default leaves the run null")
    val ex = intercept[Exception] {
      Fill.boundedFill(df, "v", "t", Nil, 4L, Some("vf"), strict = true)
        .collect()
    }
    assert(ex.getMessage.contains("unfillable null run"),
      s"strict mode must raise the reference's error, got: ${ex.getMessage}")
    // a fillable gap does not raise in strict mode
    val ok = Seq((0L, Some(1L)), (1L, None), (2L, Some(1L)))
      .toDF("t", "v")
    val strictOk = Fill.boundedFill(ok, "v", "t", Nil, 4L, Some("vf"), strict = true)
      .orderBy("t").collect()
    assert(strictOk.map(_.getLong(2)).toSeq === Seq(1L, 1L, 1L))
  }

  test("assign: NaN cost is infeasible (never matched, never a crash)") {
    val pairs = Seq(
      (1L, 10L, "a", Double.NaN), (1L, 11L, "a", 0.5))
      .toDF("grp", "l", "r", "cost")
    val out = Assignment.assign(pairs, Seq("grp"), "l", "r", "cost")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(out === Set((11L, "a", 0.5)),
      "the NaN-cost pair must lose to the finite one and drop out")
  }

  test("ffillBucketed tieBreak: deterministic under duplicate order values") {
    // two rows share o=5 with different values; the fill of o=6 must follow
    // the (o, rid) order — value B (rid 2) — in every bucket alignment
    val df = Seq((5L, 1L, Some("A")), (5L, 2L, Some("B")), (6L, 3L, None))
      .toDF("o", "rid", "v")
    for (bucket <- Seq(2L, 100L)) {
      val got = Fill.ffillBucketed(df, Seq("v"), "o", bucket, tieBreak = Seq("rid"))
        .filter(col("o") === 6L).head.getString(2)
      assert(got === "B", s"bucket=$bucket")
    }
  }

  test("bucketed forms retain null-key rows like the plain window forms") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // rows with a NULL by-key and a NULL order value: the plain window
    // paths keep them as their own partition; the bucketed carry joins
    // must not silently drop them
    val schema = StructType(Seq(StructField("us", LongType),
      StructField("v", DoubleType), StructField("grp", StringType)))
    val rows = Seq(
      Row(0L, 1.0, "a"), Row(10L, null, "a"), Row(20L, 2.0, null),
      Row(30L, null, null), Row(null, 9.0, "a"), Row(40L, null, "a"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    def key(r: Row) = (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))
    val plain = graft.operators.Fill.ffill(df, Seq("v"), "us", Seq("grp"))
      .collect().map(key).toSet
    val bucketed = graft.operators.Fill.ffillBucketed(df, Seq("v"), "us",
        bucketSize = 15L, by = Seq("grp"))
      .collect().map(key).toSet
    assert(bucketed.size === rows.size, "bucketed ffill dropped rows")
    assert(bucketed === plain)
    // keyless as-of, bucketed: a null-time left row survives with a null
    // match; a null-time right row is never a match in either path
    val left = Seq((Some(0L), 1L), (None, 2L), (Some(100L), 3L))
      .map { case (t, v) => Row(t.map(u => new java.sql.Timestamp(u)).orNull, v) }
    val right = Seq((Some(90L), 10.0), (None, 99.0))
      .map { case (t, v) => Row(t.map(u => new java.sql.Timestamp(u)).orNull, v) }
    val lDf = spark.createDataFrame(spark.sparkContext.parallelize(left, 1),
      StructType(Seq(StructField("t", TimestampType), StructField("lv", LongType))))
    val rDf = spark.createDataFrame(spark.sparkContext.parallelize(right, 1),
      StructType(Seq(StructField("t", TimestampType), StructField("rv", DoubleType))))
    def asofKeys(bucketUs: Option[Long]) =
      graft.operators.AsOfJoin.asofJoin(lDf, rDf, "t", Nil,
          graft.operators.AsOfJoin.Backward, bucketUs = bucketUs)
        .select("lv", "rv").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val windowed = asofKeys(None)
    val bucketedAsof = asofKeys(Some(3600000000L))
    assert(windowed === Set((1L, None), (2L, None), (3L, Some(10.0))),
      "null-time rows must neither match nor be matched")
    assert(bucketedAsof === windowed)
  }

  test("bfill mirrors ffill on the reversed sequence") {
    val df = Seq((1L, None), (2L, Some(5L)), (3L, None), (4L, Some(7L)), (5L, None))
      .map { case (t, v) => (t, v) }.toDF("t", "v")
    val b = Fill.bfill(df, Seq("v"), "t").orderBy("t").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))
    assert(b.toSeq === Seq(Some(5L), Some(5L), Some(7L), Some(7L), None))
  }

  test("Assignment.solve matches brute force on random matrices (property)") {
    val rnd = new Random(42)
    for (_ <- 0 until 200) {
      val n = 1 + rnd.nextInt(4); val m = 1 + rnd.nextInt(4)
      val cost = Array.fill(n, m)(
        if (rnd.nextInt(5) == 0) Double.PositiveInfinity else rnd.nextInt(100).toDouble)
      val res = Assignment.solve(cost)
      // validity: no column used twice, no infeasible picks
      val used = res.filter(_ >= 0)
      assert(used.distinct.length === used.length)
      res.zipWithIndex.foreach { case (j, i) =>
        if (j >= 0) assert(!cost(i)(j).isInfinity)
      }
      val total = res.zipWithIndex.collect { case (j, i) if j >= 0 => cost(i)(j) }.sum
      // brute force over all injective row→col maps with max cardinality
      def best(rows: List[Int], usedCols: Set[Int]): (Int, Double) = rows match {
        case Nil => (0, 0.0)
        case r :: rest =>
          val skip = best(rest, usedCols)
          val opts = (0 until m).collect {
            case c if !usedCols(c) && !cost(r)(c).isInfinity =>
              val sub = best(rest, usedCols + c)
              (sub._1 + 1, sub._2 + cost(r)(c))
          }
          (opts :+ skip).maxBy(o => (o._1, -o._2))
      }
      val (bk, bc) = best((0 until n).toList, Set.empty)
      assert(used.length === bk, s"cardinality ${used.length} vs brute $bk")
      assert(math.abs(total - bc) < 1e-9, s"cost $total vs brute $bc")
    }
  }

  test("Assignment.assign preserves numeric key types and infers singletons") {
    val pairs = Seq(
      // group 1: 2×2 full bipartite, optimal = (1→10 cost 1, 2→9 cost 2)
      (1L, 1L, 9L, 5.0), (1L, 1L, 10L, 1.0),
      (1L, 2L, 9L, 2.0), (1L, 2L, 10L, 7.0),
      // group 2: left {5,6}, right {20,21}; only (5,20) feasible (the rest
      // are declared-infeasible ∞ cells) → J4 pairs the singletons (6,21)
      (2L, 5L, 20L, 3.0), (2L, 5L, 21L, Double.PositiveInfinity),
      (2L, 6L, 20L, Double.PositiveInfinity), (2L, 6L, 21L, Double.PositiveInfinity))
      .toDF("g", "l", "r", "c")
    val out = Assignment.assign(pairs, Seq("g"), "l", "r", "c", inferSingletons = true)
    assert(out.schema("l").dataType.typeName === "long", "left key type preserved")
    assert(out.schema("r").dataType.typeName === "long", "right key type preserved")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(rows === Set(
      (1L, 1L, 10L, Some(1.0)), (1L, 2L, 9L, Some(2.0)),
      (2L, 5L, 20L, Some(3.0)), (2L, 6L, 21L, None)))
  }

  test("Assignment optimal total ≤ greedy total (property)") {
    val rnd = new Random(99)
    for (_ <- 0 until 50) {
      val n = 2 + rnd.nextInt(3)
      val cost = Array.fill(n, n)(rnd.nextDouble() * 100)
      val res = Assignment.solve(cost)
      val total = res.zipWithIndex.map { case (j, i) => cost(i)(j) }.sum
      // row-greedy baseline
      var usedCols = Set.empty[Int]; var greedy = 0.0
      for (i <- 0 until n) {
        val j = (0 until n).filterNot(usedCols).minBy(cost(i))
        usedCols += j; greedy += cost(i)(j)
      }
      assert(total <= greedy + 1e-9)
    }
  }

  test("asof accepts numeric (frame-id) time columns for tolerance and Nearest") {
    val left = Seq((1L, 100L), (1L, 207L), (2L, 300L)).toDF("k", "f")
    val right = Seq((1L, 98L, "a"), (1L, 205L, "b"), (2L, 310L, "c"))
      .toDF("k", "f", "v")
    // tolerance in the column's own units (frames)
    val tol = AsOfJoin.asofJoin(left, right, "f", Seq("k"),
        direction = AsOfJoin.Backward, tolerance = Some(2L))
      .select("k", "f", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(tol === Set((1L, 100L, Some("a")), (1L, 207L, Some("b")),
      (2L, 300L, None)))
    val near = AsOfJoin.asofJoin(left, right, "f", Seq("k"),
        direction = AsOfJoin.Nearest)
      .select("k", "f", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(near === Set((1L, 100L, "a"), (1L, 207L, "b"), (2L, 300L, "c")))
  }

  test("sessionize on TIMESTAMP_NTZ uses wall-clock gaps, immune to session tz/DST") {
    // 2026-03-08 02:00 does not exist in America/New_York (spring forward):
    // a session-tz interpretation would compress the 61.5-minute wall gap
    // to ~90 seconds and merge the sessions
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val df = Seq("2026-03-08 01:59:00", "2026-03-08 03:00:30")
        .toDF("s").withColumn("ts", col("s").cast("timestamp_ntz"))
      val sessed = Sessionize.sessionize(df, "ts", Nil, gap = 30L * 60L * 1000000L)
      assert(sessed.select("session_id").distinct().count() === 2,
        "61.5-minute wall-clock gap must split at a 30-minute gap")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }
}
