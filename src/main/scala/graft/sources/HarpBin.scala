package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HARP binary stream codec — the reference's native on-disk format
  * (files `<Camera>_<register>_<YYYY-MM-DDTHH-MM-SS>.bin` in hour chunks,
  * `combine_pose_id_chunk.py:245-246,263-282`, layout
  * `combine_pose_id_automated.py:25-44`), implemented from the PUBLIC
  * harp-tech protocol specification:
  *
  *   [0]    message type (1=Read, 2=Write, 3=Event)
  *   [1]    length — bytes after this byte, checksum included
  *   [2]    address (register id)
  *   [3]    port
  *   [4]    payload type — low bits element type (0x44 = Float32),
  *          0x10 flag = timestamped payload
  *   [5:9]  uint32 LE seconds since the HARP epoch (1904-01-01T00:00:00Z)
  *   [9:11] uint16 LE sub-second ticks of 32 µs
  *   [11:]  little-endian float32 payload elements
  *   [last] checksum = sum of all preceding bytes mod 256
  *
  * [[poseView]] maps a decoded register stream onto the reference Pose
  * schema (SURVEY §1.1): payload layout
  * `[class_idx, part_idx, x, y, part_likelihood, class_lik_0…class_lik_C−1]`
  * → `(time, identity, identity_likelihood: map, part, part_likelihood,
  * x, y)` with names resolved from the confmap-config class/part lists.
  */
object HarpBin {

  /** 1904-01-01T00:00:00Z in unix seconds. */
  val HarpEpochSec: Long = -2082844800L

  val FloatTimestamped: Int = 0x44 | 0x10
  val EventType: Int = 3

  /** Encode one timestamped float32 event message. Payload arity ≤ 58 so
    * the single-byte length field suffices. */
  def encodeMessage(register: Int, port: Int, tsUs: Long,
      payload: Array[Float]): Array[Byte] = {
    require(payload.length <= 58, "payload too wide for single-byte length")
    val n = payload.length
    val len = 3 + 6 + 4 * n + 1 // addr+port+type, timestamp, data, checksum
    val buf = java.nio.ByteBuffer.allocate(2 + len)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(EventType.toByte).put(len.toByte)
      .put(register.toByte).put(port.toByte).put(FloatTimestamped.toByte)
    val harpUs = tsUs - HarpEpochSec * 1000000L
    buf.putInt((harpUs / 1000000L).toInt)
    buf.putShort(((harpUs % 1000000L) / 32L).toShort)
    payload.foreach(buf.putFloat)
    val arr = buf.array()
    var sum = 0
    var i = 0
    while (i < arr.length - 1) { sum += arr(i) & 0xff; i += 1 }
    arr(arr.length - 1) = (sum & 0xff).toByte
    arr
  }

  /** Decoded message: (tsUs, msgType, register, port, payload).
    *
    * Only timestamped Float32 event messages are EMITTED; other well-formed
    * messages (write echoes at stream start, differently-typed registers)
    * are SKIPPED by advancing past their length field — one odd message must
    * not poison a whole chunk read. Structural corruption still fails fast:
    * the truncation and checksum `require`s stay on every message, skipped
    * or not.
    */
  def decode(bytes: Array[Byte]): Iterator[(Long, Int, Int, Int, Array[Float])] =
    new Iterator[(Long, Int, Int, Int, Array[Float])] {
      private var off = 0
      private var nextRow: (Long, Int, Int, Int, Array[Float]) = _
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && off + 2 <= bytes.length) {
          val msgType = bytes(off) & 0xff
          val len = bytes(off + 1) & 0xff
          val end = off + 2 + len
          require(end <= bytes.length, s"truncated message at offset $off")
          var sum = 0
          var i = off
          while (i < end - 1) { sum += bytes(i) & 0xff; i += 1 }
          require((sum & 0xff) == (bytes(end - 1) & 0xff),
            s"checksum mismatch at offset $off")
          // len must at least cover address+port+type (3) + checksum before
          // the header reads — a checksum-valid short control frame is
          // SKIPPED, not a BufferUnderflowException
          if (len >= 4) {
            val bb = java.nio.ByteBuffer.wrap(bytes, off + 2, len - 1)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val register = bb.get() & 0xff
            val port = bb.get() & 0xff
            val ptype = bb.get() & 0xff
            // timestamped (0x10) Float32 (0x44) EVENT messages only —
            // msgType is checked too: a device's TIMESTAMPED float
            // write/read reply (msgType 1/2, same payload type) would
            // otherwise be emitted and fabricate a bogus stream row.
            // len must cover address+port+type (3) + timestamp (6)
            if (msgType == EventType &&
                (ptype & 0x10) != 0 && (ptype & 0x4f) == 0x44 && len >= 10) {
              val sec = bb.getInt().toLong & 0xffffffffL
              val ticks = bb.getShort().toLong & 0xffffL
              val tsUs = (HarpEpochSec + sec) * 1000000L + ticks * 32L
              val n = (len - 1 - 3 - 6) / 4
              val payload = new Array[Float](n)
              var k = 0
              while (k < n) { payload(k) = bb.getFloat(); k += 1 }
              nextRow = (tsUs, msgType, register, port, payload)
            }
          }
          off = end
        }
      }
      advance()
      def hasNext: Boolean = nextRow != null
      def next(): (Long, Int, Int, Int, Array[Float]) = {
        val r = nextRow
        advance()
        r
      }
    }

  /** Write one chunk file of event messages. */
  def writeFile(path: String, register: Int,
      rows: Seq[(Long, Array[Float])], port: Int = 255): Unit = {
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path))
    try rows.foreach { case (tsUs, payload) =>
      out.write(encodeMessage(register, port, tsUs, payload))
    } finally out.close()
  }

  /** The layout's chunk-timestamp format — one shared, thread-safe
    * instance (DateTimeFormatter is immutable; as an object field it is
    * re-initialized executor-side rather than serialized). */
  private val TsFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH-mm-ss")
  private val ChunkTsRe = """(\d{4}-\d{2}-\d{2}T\d{2}-\d{2}-\d{2})\.bin$""".r
  private val RegisterRe = """_(\d+)_\d{4}-\d{2}-\d{2}T""".r

  /** Chunk-start micros parsed from `..._YYYY-MM-DDTHH-MM-SS.bin`. */
  def chunkStartUs(fileName: String): Option[Long] =
    ChunkTsRe.findFirstMatchIn(fileName).map { m =>
      java.time.LocalDateTime.parse(m.group(1), TsFmt)
        .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
    }

  /** Register id parsed from `<Camera>_<register>_<ts>.bin`. */
  def fileRegister(fileName: String): Option[Int] =
    RegisterRe.findFirstMatchIn(fileName).map(_.group(1).toInt)

  /** Distributed HARP chunk-file SINK — S8 on the native format (the
    * reference writes the combined stream back as register-222 `.bin`,
    * `combine_pose_id_chunk.py:324-326`). Rows `(time, payload:
    * array<float>)` are hash-repartitioned on their hour bucket, each
    * bucket's rows are sorted by time and encoded into ONE
    * `<cameraPrefix>_<register>_<YYYY-MM-DDTHH-MM-SS>.bin` chunk file,
    * written executor-side through the Hadoop FS (idempotent overwrite —
    * re-runs produce identical bytes). One task may own several buckets;
    * a bucket never splits across tasks.
    */
  def writeChunkFiles(df: DataFrame, outDir: String, cameraPrefix: String,
      register: Int, chunkSeconds: Long = 3600): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val chunkUs = chunkSeconds * 1000000L
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    // repartition on the bucket, sort (bucket, time) within tasks, then
    // STREAM rows to one file per bucket — a task may own several hour
    // buckets but never holds more than one row in memory
    df.select(graft.functions.Cols.micros(df, "time").as("tus"), col("payload"))
      .withColumn("_b", floor(col("tus") / chunkUs).cast("long"))
      .repartition(col("_b"))
      .sortWithinPartitions(col("_b"), col("tus"))
      .as[(Long, Array[Float], Long)]
      .foreachPartition { (it: Iterator[(Long, Array[Float], Long)]) =>
        // empty shuffle partitions (repartition produces many) must not
        // build a FileSystem or issue an mkdirs RPC
        if (it.hasNext) {
          val fs = new org.apache.hadoop.fs.Path(outDir)
            .getFileSystem(conf.value)
          fs.mkdirs(new org.apache.hadoop.fs.Path(outDir))
          // task-commit protocol: encode into an attempt-unique temp file,
          // then delete+rename into place per bucket — a speculative or
          // zombie duplicate attempt can race, but last-rename-wins leaves
          // a COMPLETE file either way (two attempts appending to one
          // final path would interleave bytes)
          val attempt = java.util.UUID.randomUUID().toString
          var curBucket = Long.MinValue
          var out: org.apache.hadoop.fs.FSDataOutputStream = null
          var tmpPath: org.apache.hadoop.fs.Path = null
          var finalPath: org.apache.hadoop.fs.Path = null
          def commit(): Unit = if (out != null) {
            out.close(); out = null
            fs.delete(finalPath, false)
            require(fs.rename(tmpPath, finalPath),
              s"could not commit chunk file $finalPath")
          }
          try {
            it.foreach { case (tus, payload, b) =>
              if (b != curBucket) {
                commit()
                val startUs = b * chunkUs
                val name = cameraPrefix + "_" + register + "_" +
                  java.time.Instant.ofEpochSecond(startUs / 1000000L)
                    .atZone(java.time.ZoneOffset.UTC).format(TsFmt) + ".bin"
                finalPath = new org.apache.hadoop.fs.Path(outDir, name)
                tmpPath = new org.apache.hadoop.fs.Path(outDir,
                  s".$name.inprogress-$attempt")
                out = fs.create(tmpPath, true)
                curBucket = b
              }
              out.write(encodeMessage(register, 255, tus, payload))
            }
            commit()
          } finally if (out != null) { out.close(); fs.delete(tmpPath, false); () }
        }
      }
  }

  /** Epoch/chunk catalog discovery over the reference directory layout
    * `root/<epoch YYYY-MM-DDTHH-MM-SS>/<Camera>/<Camera>_<register>_<ts>.bin`
    * (reference `find_epochs`/`find_chunks`,
    * `combine_pose_id_automated.py:19-44`, `detect_fights_all_epochs.py:12-94`):
    * one row per chunk file with parsed epoch, camera, register, and chunk
    * start, restricted to CHUNKS overlapping [startUs, endUs] (a chunk
    * spans `chunkSeconds` from its filename timestamp). An epoch that
    * STARTED before the window still contributes its in-window chunks — a
    * multi-day epoch queried for its second day must not vanish. Directory
    * listing is driver-side METADATA work (the same contract as Spark's
    * own file index); the returned DataFrame is the query-able catalog.
    */
  def discoverChunks(spark: org.apache.spark.sql.SparkSession, root: String,
      startUs: Long = Long.MinValue, endUs: Long = Long.MaxValue,
      chunkSeconds: Long = 3600): DataFrame = {
    import spark.implicits._
    val hconf = spark.sessionState.newHadoopConf()
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(hconf)
    // saturating chunk extent: startUs = Long.MinValue must not overflow
    val loChunk =
      if (startUs == Long.MinValue) Long.MinValue
      else startUs - chunkSeconds * 1000000L
    val rows = for {
      epochDir <- fs.listStatus(rootPath).toSeq if epochDir.isDirectory
      epochUs <- scala.util.Try(java.time.LocalDateTime
        .parse(epochDir.getPath.getName, TsFmt)
        .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L).toOption.toSeq
      if epochUs <= endUs
      camDir <- fs.listStatus(epochDir.getPath).toSeq if camDir.isDirectory
      f <- fs.listStatus(camDir.getPath).toSeq
      if f.isFile && f.getPath.getName.endsWith(".bin")
      chunkUs <- chunkStartUs(f.getPath.getName).toSeq
      if chunkUs <= endUs && chunkUs > loChunk
    } yield (epochDir.getPath.getName, timestampFromUs(epochUs),
      camDir.getPath.getName, fileRegister(f.getPath.getName).getOrElse(-1),
      timestampFromUs(chunkUs), f.getPath.toString, f.getLen)
    rows.toDF("epoch", "epoch_start", "camera", "register", "chunk_start",
      "file", "size_bytes")
  }

  private def timestampFromUs(us: Long) = new java.sql.Timestamp(us / 1000L)

  /** Reference Pose schema over a decoded register stream (see class doc
    * for the payload layout). */
  def poseView(df: DataFrame, classNames: Seq[String],
      partNames: Seq[String]): DataFrame = {
    val classArr = array(classNames.map(lit): _*)
    val partArr = array(partNames.map(lit): _*)
    val liks = sequence(lit(5), lit(5 + classNames.length - 1))
    df.select(
      col("time"),
      element_at(classArr, col("payload").getItem(0).cast("int") + 1).as("identity"),
      map_from_arrays(classArr,
        transform(liks, i => element_at(col("payload"), i + 1).cast("double")))
        .as("identity_likelihood"),
      element_at(partArr, col("payload").getItem(1).cast("int") + 1).as("part"),
      col("payload").getItem(4).cast("double").as("part_likelihood"),
      col("payload").getItem(2).cast("double").as("x"),
      col("payload").getItem(3).cast("double").as("y"))
  }
}
