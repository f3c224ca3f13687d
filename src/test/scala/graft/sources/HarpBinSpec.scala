package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import java.nio.file.Files

/** Round-trip and pruning tests for the HARP .bin codec + DataSource V2. */
class HarpBinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2024-06-01T12:00:00Z in epoch micros
  private val t0Us = 1717243200000000L
  private def alignedUs(offset: Long) = t0Us + (offset / 32) * 32 // 32 µs ticks

  test("codec: encode/decode round-trips messages bit-exactly") {
    val rows = (0 until 100).map { i =>
      (alignedUs(i * 20000L), Array(i.toFloat, i * 0.5f, -i.toFloat))
    }
    val bytes = rows.flatMap { case (ts, p) =>
      HarpBin.encodeMessage(222, 255, ts, p)
    }.toArray
    val decoded = HarpBin.decode(bytes).toSeq
    assert(decoded.length === 100)
    decoded.zip(rows).foreach { case ((ts, mt, reg, port, payload), (wantTs, wantP)) =>
      assert(ts === wantTs)
      assert(mt === HarpBin.EventType)
      assert(reg === 222)
      assert(port === 255)
      assert(payload.toSeq === wantP.toSeq)
    }
  }

  test("codec: corrupted checksum is rejected") {
    val msg = HarpBin.encodeMessage(222, 255, alignedUs(0), Array(1.0f))
    msg(msg.length - 1) = (msg(msg.length - 1) ^ 0x01).toByte
    assertThrows[IllegalArgumentException](HarpBin.decode(msg).toSeq)
  }

  test("codec: well-formed non-event messages are skipped, not fatal") {
    // a write echo: valid checksum, untimestamped U8 payload (type 0x01)
    def writeEcho(register: Int): Array[Byte] = {
      val len = 3 + 1 + 1 // addr+port+type, one data byte, checksum
      val buf = java.nio.ByteBuffer.allocate(2 + len)
      buf.put(2.toByte).put(len.toByte) // msgType 2 = WRITE
        .put(register.toByte).put(255.toByte).put(0x01.toByte).put(7.toByte)
      val arr = buf.array()
      var sum = 0
      for (i <- 0 until arr.length - 1) sum += arr(i) & 0xff
      arr(arr.length - 1) = (sum & 0xff).toByte
      arr
    }
    // a TIMESTAMPED float write reply (msgType 2, payload type 0x54 — the
    // same payload shape as an event): must be skipped on msgType alone,
    // or the echo fabricates a bogus stream row
    def timestampedWriteReply(register: Int): Array[Byte] = {
      val ev = HarpBin.encodeMessage(register, 255, alignedUs(5000), Array(9.9f))
      ev(0) = 2.toByte // flip msgType Event → Write
      // re-checksum after the flip
      var sum = 0
      for (i <- 0 until ev.length - 1) sum += ev(i) & 0xff
      ev(ev.length - 1) = (sum & 0xff).toByte
      ev
    }
    val bytes = writeEcho(32) ++
      HarpBin.encodeMessage(222, 255, alignedUs(0), Array(1.0f)) ++
      writeEcho(33) ++
      timestampedWriteReply(222) ++
      HarpBin.encodeMessage(222, 255, alignedUs(20000), Array(2.0f))
    val decoded = HarpBin.decode(bytes).toSeq
    assert(decoded.length === 2, "events decoded, echoes skipped")
    assert(decoded.map(_._5.head.toDouble) === Seq(1.0, 2.0))
    // corruption inside a SKIPPED message still fails fast
    val bad = writeEcho(32)
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x01).toByte
    assertThrows[IllegalArgumentException](
      HarpBin.decode(bad ++ HarpBin.encodeMessage(222, 255, alignedUs(0), Array(1.0f))).toSeq)
  }

  test("reader length guard: a >=2GiB chunk file fails with a clear error") {
    assert(HarpBinReader.checkedLength(1024L * 1024, "f.bin") === 1048576)
    val ex = intercept[IllegalArgumentException](
      HarpBinReader.checkedLength(Int.MaxValue.toLong + 5, "big.bin"))
    assert(ex.getMessage.contains("too large"))
  }

  test("DataSource V2: reads chunk files; equals the parquet path; prunes by time and register") {
    val dir = Files.createTempDirectory("harp_bin").toFile
    // three hour chunks for register 222 + one for register 202
    val chunks = Seq("2024-06-01T12-00-00", "2024-06-01T13-00-00", "2024-06-01T14-00-00")
    val hourUs = 3600L * 1000000L
    val all = chunks.zipWithIndex.flatMap { case (name, ci) =>
      val rows = (0 until 50).map { i =>
        (alignedUs(ci * hourUs + i * 20000L),
          Array(ci.toFloat, i.toFloat, i * 2.0f, 0.9f))
      }
      HarpBin.writeFile(s"$dir/CameraTop_222_$name.bin", 222, rows)
      rows
    }
    HarpBin.writeFile(s"$dir/CameraTop_202_2024-06-01T12-00-00.bin", 202,
      Seq((alignedUs(0), Array(9.0f))))

    val df = spark.read.format("graft.sources.HarpBinSource")
      .load(s"$dir/*.bin")
    assert(df.count() === 151)

    // equals a parquet round-trip of the same decoded rows
    val pq = s"$dir/pq"
    all.map { case (ts, p) => (new java.sql.Timestamp(ts / 1000), p.toSeq) }
      .toDF("time", "payload").write.parquet(pq)
    val fromBin = df.filter(col("register") === 222)
      .select(col("time"), col("payload"))
      .collect().map(r => (r.getTimestamp(0), r.getSeq[Float](1))).toSet
    val fromPq = spark.read.parquet(pq)
      .collect().map(r => (r.getTimestamp(0), r.getSeq[Float](1))).toSet
    assert(fromBin === fromPq)

    // time-range pruning: only the middle chunk's file is planned
    val midLo = new java.sql.Timestamp((t0Us + hourUs) / 1000)
    val midHi = new java.sql.Timestamp((t0Us + hourUs + 1000000L) / 1000)
    val pruned = df.filter(col("time") >= midLo && col("time") <= midHi)
    assert(pruned.rdd.getNumPartitions === 1,
      "time-range pushdown must prune to the single matching chunk file")
    assert(pruned.count() === 50)

    // register pruning: register = 202 plans only its one file
    val reg = df.filter(col("register") === 202)
    assert(reg.rdd.getNumPartitions === 1)
    assert(reg.count() === 1)
  }

  test("writeChunkFiles: distributed bin sink round-trips through the DSv2 reader, idempotently") {
    import spark.implicits._
    val out = Files.createTempDirectory("harp_sink").toString
    val hourUs = 3600L * 1000000L
    // 3 hours of data, one row per second, payload = [hour, sec]
    val rows = for (h <- 0 until 3; s <- 0 until 60) yield
      (new java.sql.Timestamp((t0Us + h * hourUs + s * 60000000L) / 1000),
        Seq(h.toFloat, s.toFloat))
    val df = rows.toDF("time", "payload")
      .withColumn("payload", col("payload").cast("array<float>"))
    HarpBin.writeChunkFiles(df, out, "CameraTop", 222)
    val files = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.endsWith(".bin")).sorted
    assert(files.toSeq === Seq(
      "CameraTop_222_2024-06-01T12-00-00.bin",
      "CameraTop_222_2024-06-01T13-00-00.bin",
      "CameraTop_222_2024-06-01T14-00-00.bin"))
    val back = spark.read.format("graft.sources.HarpBinSource").load(s"$out/*.bin")
      .select("time", "payload").collect()
      .map(r => (r.getTimestamp(0), r.getSeq[Float](1))).toSet
    assert(back === rows.map { case (t, p) => (t, p.map(_.toFloat)) }.toSet)
    // idempotent: second run overwrites to identical bytes
    val sums1 = files.map(f => f -> java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, f)).toSeq).toMap
    HarpBin.writeChunkFiles(df, out, "CameraTop", 222)
    files.foreach { f =>
      assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, f)).toSeq === sums1(f))
    }
  }

  test("discoverChunks catalogs the epoch/camera/chunk tree with range pruning") {
    val root = Files.createTempDirectory("harp_root")
    def epoch(name: String, cams: Seq[String], chunks: Seq[String]): Unit =
      cams.foreach { cam =>
        val d = root.resolve(name).resolve(cam)
        Files.createDirectories(d)
        chunks.foreach { c =>
          HarpBin.writeFile(d.resolve(s"${cam}_222_$c.bin").toString, 222,
            Seq((alignedUs(0), Array(1.0f))))
        }
      }
    epoch("2024-06-01T10-00-00", Seq("CameraTop", "CameraNorth"),
      Seq("2024-06-01T10-00-00", "2024-06-01T11-00-00"))
    epoch("2024-06-05T08-00-00", Seq("CameraTop"), Seq("2024-06-05T08-00-00"))
    Files.createDirectories(root.resolve("not-an-epoch")) // ignored

    val all = HarpBin.discoverChunks(spark, root.toString)
    assert(all.count() === 5)
    assert(all.select("epoch").distinct().count() === 2)
    assert(all.filter(col("camera") === "CameraNorth").count() === 2)
    assert(all.filter(col("register") =!= 222).count() === 0)

    // epoch-range pruning: only the first epoch
    def us(s: String) = java.time.Instant.parse(s).toEpochMilli * 1000L
    val pruned = HarpBin.discoverChunks(spark, root.toString,
      us("2024-06-01T00:00:00Z"), us("2024-06-02T00:00:00Z"))
    assert(pruned.select("epoch").distinct().collect().map(_.getString(0)).toSeq
      === Seq("2024-06-01T10-00-00"))
    assert(pruned.count() === 4)
  }

  test("empty chunk marker files (reference no-data sentinel) read as zero rows") {
    val dir = Files.createTempDirectory("harp_empty").toFile
    // the reference writes an empty file when a chunk has no data
    // (combine_pose_id_chunk.py:327-331)
    Files.write(new java.io.File(dir, "CameraTop_222_2024-06-01T12-00-00.bin").toPath,
      Array.empty[Byte])
    HarpBin.writeFile(s"$dir/CameraTop_222_2024-06-01T13-00-00.bin", 222,
      Seq((alignedUs(0), Array(1.0f))))
    val df = spark.read.format("graft.sources.HarpBinSource").load(s"$dir/*.bin")
    assert(df.count() === 1)
  }

  test("poseView maps payload onto the reference Pose schema") {
    val dir = Files.createTempDirectory("harp_pose").toFile
    // payload: [class_idx, part_idx, x, y, part_likelihood, lik_m0, lik_m1]
    HarpBin.writeFile(s"$dir/CameraTop_222_2024-06-01T12-00-00.bin", 222, Seq(
      (alignedUs(0), Array(0f, 1f, 10f, 20f, 0.95f, 0.8f, 0.2f)),
      (alignedUs(20000), Array(1f, 0f, 30f, 40f, 0.85f, 0.1f, 0.9f))))
    val df = spark.read.format("graft.sources.HarpBinSource").load(s"$dir/*.bin")
    val pose = HarpBin.poseView(df, Seq("m0", "m1"), Seq("nose", "head"))
      .orderBy("time").collect()
    assert(pose.length === 2)
    assert(pose(0).getString(1) === "m0")
    assert(pose(0).getMap[String, Double](2).toMap ===
      Map("m0" -> 0.8f.toDouble, "m1" -> 0.2f.toDouble))
    assert(pose(0).getString(3) === "head")
    assert(pose(0).getDouble(5) === 10.0)
    assert(pose(1).getString(1) === "m1")
    assert(pose(1).getString(3) === "nose")
  }
}
