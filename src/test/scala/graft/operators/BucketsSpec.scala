package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark
import scala.util.Random

/** Exactness of the bucketed-window plumbing vs the global-sort plan, and
  * the distributed dense-range spine. */
class BucketsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ffillBucketed equals global ffill on sparse random data (property)") {
    val rnd = new Random(11)
    val rows = (0L until 5000L).map { i =>
      (i, if (rnd.nextDouble() < 0.85) null else java.lang.Double.valueOf(rnd.nextDouble()),
        if (rnd.nextDouble() < 0.95) null else java.lang.Double.valueOf(rnd.nextDouble()))
    }
    val df = rows.toDF("ord", "a", "b")
    val global = Fill.ffill(df, Seq("a", "b"), "ord")
      .select("ord", "a", "b").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    // bucket size 100 → 50 buckets, many all-null buckets for column b
    val bucketed = Fill.ffillBucketed(df, Seq("a", "b"), "ord", bucketSize = 100)
      .select("ord", "a", "b").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(bucketed === global)
  }

  test("bfillBucketed equals global bfill on sparse random data") {
    val rnd = new Random(23)
    val rows = (0L until 3000L).map { i =>
      (i, if (rnd.nextDouble() < 0.9) null else java.lang.Double.valueOf(rnd.nextDouble()))
    }
    val df = rows.toDF("ord", "a")
    val global = Fill.bfill(df, Seq("a"), "ord")
      .select("ord", "a").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val bucketed = Fill.bfillBucketed(df, Seq("a"), "ord", bucketSize = 128)
      .select("ord", "a").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(bucketed === global)
  }

  test("withGhosts: bucketed lag + moving sum equal the global-sort window") {
    val rnd = new Random(13)
    // irregular time steps so buckets have uneven row counts
    val times = Iterator.iterate(0L)(_ + 1 + rnd.nextInt(50)).take(3000).toSeq
    val df = times.map(t => (t, rnd.nextDouble())).toDF("t", "v")
    val gw = Window.orderBy("t")
    val expected = df
      .withColumn("lagv", lag(col("v"), 1).over(gw))
      .withColumn("msum", sum(col("v")).over(gw.rowsBetween(-5, 4)))
      .select("t", "lagv", "msum").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2))).toSet
    val bw = Window.partitionBy("_bkt").orderBy("t")
    val got = Buckets.withGhosts(
        df.withColumn("_bkt", (col("t") / 500).cast("long")), "_bkt", "t", 5, 4)
      .withColumn("lagv", lag(col("v"), 1).over(bw))
      .withColumn("msum", sum(col("v")).over(bw.rowsBetween(-5, 4)))
      .filter(!col("_ghost"))
      .select("t", "lagv", "msum").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2))).toSet
    assert(got === expected)
  }

  test("withGhosts guardSparse: an undersized interior bucket raises; boundary buckets exempt") {
    // bucket 0: 10 rows, bucket 1: 2 rows (< before=6, HAS a successor),
    // bucket 2: 10 rows, bucket 3 (last): 2 rows (exempt for `before`)
    def mk(counts: Seq[Int]) = counts.zipWithIndex.flatMap { case (n, b) =>
      (0 until n).map(i => (b * 1000L + i * 10L, 1.0))
    }.toDF("t", "v").withColumn("_bkt", (col("t") / 1000).cast("long"))
    val w = Window.partitionBy("_bkt").orderBy("t")
    // consume the windowed column (as any real caller does) — the guard
    // lives on the bucket index the window partitions by, so a plan that
    // prunes the window away never evaluates buckets at all
    def run(counts: Seq[Int]) =
      Buckets.withGhosts(mk(counts), "_bkt", "t", 6, 4, guardSparse = true)
        .withColumn("s", sum(col("v")).over(w.rowsBetween(-5, 4)))
        .filter(!col("_ghost")).agg(count(col("s"))).head.getLong(0)
    val ex = intercept[Exception](run(Seq(10, 2, 10, 2)))
    assert(ex.getMessage.contains("withGhosts") ||
      Option(ex.getCause).exists(_.getMessage.contains("withGhosts")),
      s"sparse interior bucket must raise, got: ${ex.getMessage}")
    // boundary buckets may be sparse: no rows exist beyond them, so their
    // own rows are the complete window context either way
    assert(run(Seq(4, 10, 10, 2)) === 26L)
  }

  test("bucketed sessionize equals global sessionize (property, incl. bucket-spanning sessions)") {
    val rnd = new Random(29)
    // gaps sized so sessions regularly span the 1000-unit buckets
    val times = Iterator.iterate(0L)(t => t + (if (rnd.nextDouble() < 0.1) 800 else 1 + rnd.nextInt(40)))
      .take(4000).toSeq
    val df = times.zipWithIndex.map { case (t, i) => (t, i.toLong) }.toDF("t", "rid")
    val global = Sessionize.sessionize(df, "t", Nil, 100, tieBreak = Seq("rid"))
      .select("rid", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucketed = Sessionize.sessionize(df, "t", Nil, 100, tieBreak = Seq("rid"),
        bucketSize = Some(1000L))
      .select("rid", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed === global)
    assert(global.values.max > 50, s"fixture should have many sessions: ${global.values.max}")
  }

  test("bucketed keyless as-of equals the global-sort as-of (all directions, property)") {
    val rnd = new Random(17)
    def mkTs(n: Int, seed: Long) = {
      var t = 1700000000000000L + seed
      (0 until n).map { _ => t += (1 + rnd.nextInt(5000)) * 1000L; t }
    }
    val left = mkTs(400, 0).zipWithIndex
      .map { case (t, i) => (new java.sql.Timestamp(t / 1000), i.toLong) }
      .toDF("ts", "lid")
    val right = mkTs(300, 777).zipWithIndex
      .map { case (t, i) => (new java.sql.Timestamp(t / 1000), i.toLong * 10) }
      .toDF("ts", "rv")
    for (dir <- Seq(AsOfJoin.Backward, AsOfJoin.Forward, AsOfJoin.Nearest)) {
      val global = AsOfJoin.asofJoin(left, right, "ts", Nil, dir, Some(60000000L))
        .select("lid", "rv", "_asof_time").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)).map(_.toString))).toSet
      // bucket of 10 min over a ~17-minute stream → several buckets,
      // some containing left rows with no in-bucket right match
      val bucketed = AsOfJoin.asofJoin(left, right, "ts", Nil, dir, Some(60000000L),
          bucketUs = Some(600L * 1000000L))
        .select("lid", "rv", "_asof_time").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)).map(_.toString))).toSet
      assert(bucketed === global, s"direction $dir")
    }
  }

  test("as-of join equals a brute-force reference implementation (all directions, property)") {
    val rnd = new Random(31)
    val tol = 5000L
    val users = (0 until 10).map(_.toLong)
    val left = for (u <- users; i <- 0 until 40) yield
      (u, (1000L + rnd.nextInt(100000)) * 1000L, u * 1000 + i)
    // unique right timestamps per user → unambiguous brute force
    val right = users.flatMap { u =>
      rnd.shuffle((1 to 100000).toList).take(30)
        .map(t => (u, t.toLong * 1000L, u * 10000 + t.toLong))
    }
    val leftDf = left.map { case (u, t, lid) =>
      (u, new java.sql.Timestamp(t / 1000), lid) }.toDF("u", "ts", "lid")
    val rightDf = right.map { case (u, t, rv) =>
      (u, new java.sql.Timestamp(t / 1000), rv) }.toDF("u", "ts", "rv")
    val rByU = right.groupBy(_._1)
    def bf(dir: AsOfJoin.Direction, u: Long, t: Long): Option[Long] = {
      val rs = rByU.getOrElse(u, Nil)
      val back = rs.filter(r => r._2 <= t && t - r._2 <= tol * 1000)
        .sortBy(_._2).lastOption
      val fwd = rs.filter(r => r._2 >= t && r._2 - t <= tol * 1000)
        .sortBy(_._2).headOption
      (dir match {
        case AsOfJoin.Backward => back
        case AsOfJoin.Forward => fwd
        case AsOfJoin.Nearest => (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (f._2 - t < t - b._2) Some(f) else Some(b) // ties → backward
          case (b, f) => b.orElse(f)
        }
      }).map(_._3)
    }
    for (dir <- Seq(AsOfJoin.Backward, AsOfJoin.Forward, AsOfJoin.Nearest)) {
      val got = AsOfJoin.asofJoin(leftDf, rightDf, "ts", Seq("u"), dir,
          Some(tol * 1000L))
        .select("lid", "rv").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      left.foreach { case (u, t, lid) =>
        assert(got(lid) === bf(dir, u, t), s"direction $dir, left $lid")
      }
    }
  }

  test("densifiedRange: complete, duplicate-free, multi-task") {
    val maxDf = Seq(999999L).toDF("maxF")
    val spine = Buckets.densifiedRange(maxDf, "maxF", "frame", chunk = 100000)
    val n = spine.count()
    assert(n === 1000000L)
    assert(spine.distinct().count() === 1000000L)
    assert(spine.agg(min("frame"), max("frame")).head.toSeq === Seq(0L, 999999L))
    assert(spine.rdd.getNumPartitions > 1)
  }
}
