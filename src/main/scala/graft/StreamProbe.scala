package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.behavior.Detectors
import graft.streaming.{FightStream, TubeStream}

/** Streaming fight-detector scale probe (SURVEY §8): replays the
  * reference's operational cadence — four 30-minute polls over a 2-hour
  * 50 fps epoch (90 k frame slots → 720 k pose rows + 90 k blob rows per
  * poll, one planted fight per half hour) — and measures per-poll wall
  * time end-to-end (silver + filled + gold, all three checkpointed
  * streaming stages plus the incremental blob-speed refresh).
  *
  * The number that matters operationally: a poll must take far less than
  * the 30-minute cadence it serves. Prints one summary line; run with
  * `sbt "runMain graft.StreamProbe"`.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0us = 1717243200000000L
    val framesPerPoll = 90000L // 30 min at 50 fps
    val nPolls = 4
    val parts = Map("nose" -> "nose", "head" -> "head",
      "centroid" -> "spine2", "tail_base" -> "spine4")
    val p = Detectors.FightParams()
    val base = java.nio.file.Files.createTempDirectory("graft_streamprobe").toString
    val poseDir = s"$base/pose"; val blobDir = s"$base/blob"; val work = s"$base/work"

    // one planted fight per poll window: frames [k·90000+1000, +1150]
    def chunk(k: Long) = {
      val lo = k * framesPerPoll
      val frames = spark.range(lo, lo + framesPerPoll).select(col("id").as("frame"))
        .withColumn("inFight",
          col("frame").between(lo + 1000, lo + 1150))
        .withColumn("fx", lit(100.0) + (col("frame") - lo - 1000) * 10.0)
      val mice = array(
        (for (m <- Seq(0, 1); part <- Seq("nose", "head", "spine2", "spine4")) yield {
          val id = if (m == 0) "A" else "B"
          val cx = when(col("inFight"), col("fx") + lit(m * 3.0))
            .otherwise(lit(if (m == 0) 100.0 else 400.0))
          val cy = when(col("inFight"), lit(100.0 + m * 4.0))
            .otherwise(lit(if (m == 0) 100.0 else 400.0))
          val nose = when(col("inFight"), lit(18.0)).otherwise(lit(10.0))
          val dx = part match {
            case "nose" => nose; case "head" => lit(8.0)
            case "spine2" => lit(0.0); case _ => lit(-10.0)
          }
          struct(lit(id).as("identity"), lit(part).as("part"),
            (cx + dx).as("x"), cy.as("y"))
        }): _*)
      frames.select(col("frame"), col("inFight"), col("fx"), explode(mice).as("m"))
        .select(timestamp_micros(lit(t0us) + col("frame") * 20000L).as("time"),
          col("m.identity"), col("m.part"), col("m.x"), col("m.y"))
    }
    def blobChunk(k: Long) = {
      val lo = k * framesPerPoll
      spark.range(lo, lo + framesPerPoll).select(col("id").as("frame"))
        .select(timestamp_micros(lit(t0us) + col("frame") * 20000L).as("time"),
          (when(col("frame").between(lo + 1000, lo + 1150),
            lit(100.0) + (col("frame") - lo - 1000) * 10.0)
            .otherwise(lit(500.0))).as("x"),
          lit(100.0).as("y"))
    }

    val times = (0L until nPolls).map { k =>
      chunk(k).write.parquet(s"$poseDir/chunk$k")
      blobChunk(k).write.parquet(s"$blobDir/chunk$k")
      val upTo = t0us + ((k + 1) * framesPerPoll) * 20000L
      val t0 = System.nanoTime()
      FightStream.pollFights(spark, s"$poseDir/*", work, parts, p, t0us,
        Seq("A", "B"), upTo, blobDir = Some(s"$blobDir/*"))
      (System.nanoTime() - t0) / 1e9
    }
    // final flush poll past the last fight's gap horizon
    val tF0 = System.nanoTime()
    FightStream.pollFights(spark, s"$poseDir/*", work, parts, p, t0us,
      Seq("A", "B"),
      t0us + (nPolls * framesPerPoll + p.maxFrameGap + 5) * 20000L,
      blobDir = Some(s"$blobDir/*"))
    val flushS = (System.nanoTime() - tF0) / 1e9
    val events = FightStream.fightEvents(spark, work).collect()
    println(f"STREAM_PROBE polls=$nPolls framesPerPoll=$framesPerPoll " +
      f"poseRowsPerPoll=${framesPerPoll * 8} events=${events.length} " +
      f"pollSecs=[${times.map(t => f"$t%.1f").mkString(",")}] flush=$flushS%.1fs")
    require(events.length == nPolls,
      s"expected $nPolls planted fights, got ${events.length}")

    // ---- tube-test poller at the same cadence: one stand-off + retreat
    // planted per poll window (frames [k·90000+1000, +1019] stand-off,
    // [+1020, +1069] retreat)
    val tubeWork = s"$base/tube_work"; val tubePoseDir = s"$base/tube_pose"
    val tp = Detectors.TubeParams()
    def tubeChunk(k: Long) = {
      val lo = k * framesPerPoll
      val frames = spark.range(lo, lo + framesPerPoll).select(col("id").as("frame"))
        .withColumn("inStand", col("frame").between(lo + 1000, lo + 1019))
        .withColumn("inRetreat", col("frame").between(lo + 1020, lo + 1069))
      val mice = array(
        (for (m <- Seq(0, 1); part <- Seq("nose", "head", "spine2", "spine4")) yield {
          val id = if (m == 0) "A" else "B"
          val cx =
            if (m == 0) lit(100.0)
            else when(col("inStand"), lit(140.0))
              .when(col("inRetreat"), lit(140.0) + (col("frame") - lo - 1019) * 3.0)
              .otherwise(lit(3000.0))
          val cy =
            if (m == 0) lit(50.0)
            else when(col("inStand") || col("inRetreat"), lit(50.0))
              .otherwise(lit(3000.0))
          val dir = if (m == 0) lit(1.0) else when(col("inStand"), lit(-1.0)).otherwise(lit(1.0))
          val dx = part match {
            case "nose" => dir * 10.0; case "head" => dir * 8.0
            case "spine2" => lit(0.0); case _ => dir * -10.0
          }
          struct(lit(id).as("identity"), lit(part).as("part"),
            (cx + dx).as("x"), cy.as("y"))
        }): _*)
      frames.select(col("frame"), explode(mice).as("m"))
        .select(timestamp_micros(lit(t0us) + col("frame") * 20000L).as("time"),
          col("m.identity"), col("m.part"), col("m.x"), col("m.y"))
    }
    val tubeTimes = (0L until nPolls).map { k =>
      tubeChunk(k).write.parquet(s"$tubePoseDir/chunk$k")
      val upTo = t0us + ((k + 1) * framesPerPoll) * 20000L
      val t0 = System.nanoTime()
      TubeStream.pollTubeTests(spark, s"$tubePoseDir/*", tubeWork, parts, tp,
        t0us, Seq("A", "B"), upTo)
      (System.nanoTime() - t0) / 1e9
    }
    val tubeEvents = TubeStream.tubeEvents(spark, tubeWork).collect()
    println(f"TUBE_STREAM_PROBE polls=$nPolls framesPerPoll=$framesPerPoll " +
      f"events=${tubeEvents.length} " +
      f"pollSecs=[${tubeTimes.map(t => f"$t%.1f").mkString(",")}]")
    require(tubeEvents.length == nPolls,
      s"expected $nPolls planted tube tests, got ${tubeEvents.length}")
    require(tubeEvents.forall(_.winner_identity == "A"),
      "every planted tube test is won by A")
    spark.stop()
  }
}
