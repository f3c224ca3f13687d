package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Salt
import java.nio.file.Files

/** Scale-mechanics tests: partition pruning through the bronze layout and
  * salted-join equivalence under skew. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bronze layout: time-range scan prunes partitions before file I/O") {
    val root = Files.createTempDirectory("graft_bronze").toString
    val rows = (0 until 48).flatMap { h =>
      (0 until 10).map { i =>
        (java.sql.Timestamp.valueOf(f"2024-05-${1 + h / 24}%02d ${h % 24}%02d:00:${i}%02d"),
          s"id$i", 1.0 * i, 2.0 * i)
      }
    }.toDF("time", "identity", "x", "y")
    Bronze.write(rows, root, "CameraTop", 222)
    val scan = Bronze.scan(spark, root, "CameraTop", 222,
      java.sql.Timestamp.valueOf("2024-05-01 05:00:00"),
      java.sql.Timestamp.valueOf("2024-05-01 07:00:00"))
    assert(scan.count() === 20)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "partition filters must reach the scan")
    // the HOUR column itself must participate in pruning (a date-only
    // filter would read all 24 hour partitions and discard rows post-scan)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("hour"), s"hour must appear in PartitionFilters: $pf")
    // the physical scan reads only the pruned partitions' files
    val files = scan.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.forall(f => f.contains("hour=5") || f.contains("hour=6")),
      s"scanned unexpected files: ${files.filterNot(f => f.contains("hour=5") || f.contains("hour=6")).take(2).mkString}")
    // idempotent re-write of one partition (S9 via dynamic overwrite)
    Bronze.write(rows.filter(hour(col("time")) === 5 && to_date(col("time")) === "2024-05-01"),
      root, "CameraTop", 222)
    assert(Bronze.scan(spark, root, "CameraTop", 222,
      java.sql.Timestamp.valueOf("2024-05-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-05-03 00:00:00")).count() === 480)
  }

  test("bronze scan: hour pruning correct when JVM default tz != session tz") {
    // Session tz is UTC (Tables.configure). Force a JVM default far from UTC:
    // the old hour derivation (t.toLocalDateTime.getHour, JVM-local) would
    // enumerate NY-local hours while partitions were written with UTC hours,
    // silently filtering out every matching row.
    val prev = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/New_York"))
      val root = Files.createTempDirectory("graft_bronze_tz").toString
      // fixed instants (epoch millis), independent of any default-tz parse
      val base = 1714536000000L // 2024-05-01 04:00:00 UTC
      val rows = (0 until 120).map { i =>
        (new java.sql.Timestamp(base + i * 60000L), s"id$i", 1.0 * i)
      }.toDF("time", "identity", "x")
      Bronze.write(rows, root, "CameraTop", 222)
      val scan = Bronze.scan(spark, root, "CameraTop", 222,
        new java.sql.Timestamp(base), new java.sql.Timestamp(base + 3600000L))
      assert(scan.count() === 60, "hour-pruned scan must keep the first hour's rows")
    } finally java.util.TimeZone.setDefault(prev)
  }

  test("bronze scan: hour pruning correct for a half-hour-offset session timezone") {
    // Asia/Kolkata (+05:30): a UTC hour range spans TWO session-local hour
    // partitions — UTC-hour-aligned enumeration would miss one of them
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      val root = Files.createTempDirectory("graft_bronze_ist").toString
      val base = 1714536000000L // 2024-05-01 04:00:00 UTC = 09:30 IST
      val rows = (0 until 120).map { i =>
        (new java.sql.Timestamp(base + i * 60000L), s"id$i", 1.0 * i)
      }.toDF("time", "identity", "x")
      Bronze.write(rows, root, "CameraTop", 222)
      val scan = Bronze.scan(spark, root, "CameraTop", 222,
        new java.sql.Timestamp(base), new java.sql.Timestamp(base + 3600000L))
      assert(scan.count() === 60,
        "first UTC hour spans IST hours 9 and 10 — both partitions must match")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("saltedJoin: same result as plain join, hot key spread over salts") {
    // skew: one key holds 90% of the large side
    val large = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong))).toDF("key", "v")
    val small = Seq(("hot", 1.0), ("k1", 2.0), ("k2", 3.0)).toDF("key", "w")
    val plain = large.join(small, Seq("key")).groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("sv")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Salt.saltedJoin(large, small, Seq("key"), 8, Seq("key", "v"))
      .groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("sv")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
    // the hot key's rows really do carry multiple salt values
    val saltSpread = large.filter(col("key") === "hot")
      .select(Salt.saltCol(8, col("key"), col("v"))).distinct().count()
    assert(saltSpread > 1)
  }
}
