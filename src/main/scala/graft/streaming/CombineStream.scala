package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.Path
import graft.combine.Combine

/** The reference's automated combine loop (`combine_pose_id_automated.py:
  * 149-185`: every 30 minutes, discover newly-landed chunks and submit one
  * combine job per new chunk) as a checkpointed incremental poller. Chunk
  * discovery rides the pose FILE STREAM, so the processed set is
  * exactly-once and survives restarts — the reference tracks
  * `processed_chunks` in process memory and loses it on a crash. Each
  * discovered chunk runs the batch [[Combine.combineChunk]] and writes one
  * output dir per chunk; a checkpoint replay overwrites the same dirs
  * (idempotent), never duplicates.
  *
  * Layout contract (the reference's hourly chunk keys as directories):
  * `poseDir/<chunk>/…parquet` paired with `idsDir/<chunk>/…parquet` by
  * name; chunk dirs are immutable once written.
  *
  * Pose/id ingestion race: a pose chunk whose id chunk has NOT landed yet
  * is deferred (a marker under `workDir/pending/`) and retried on every
  * later poll — the pose files are already in the stream checkpoint, so
  * without the marker the chunk would freeze as silent data loss. An id
  * dir that EXISTS but is still being written is the same race in a worse
  * disguise (combining against partial identities, never revisited), so by
  * default a chunk only counts as landed once its `_SUCCESS` marker exists
  * (Spark batch writers emit it on commit); writers that don't produce
  * `_SUCCESS` must pass `requireIdsSuccessMarker = false` AND guarantee
  * atomic chunk-dir appearance. Passing `finalizeMissing = true` (the
  * epoch's last poll) instead writes the empty output of the reference's
  * no-identity-data path (`combine_pose_id_chunk.py:245-250`).
  *
  * A deployment with N live rigs runs ONE poller over all its epochs
  * ([[pollCombineMulti]]): one streaming discovery query and ONE
  * checkpoint, each epoch with its own pose/id source dirs and per-epoch
  * pending/output slots. Unlike the detector pollers there is no
  * watermark coupling across epochs (each chunk is an independent batch
  * combine), so deliveries need no wall-clock-cut contract — a lagging
  * rig simply defers its own chunks.
  */
object CombineStream {

  /** One epoch (rig/session) in a multi-epoch combine poll: its own pose
    * and id chunk roots. `epoch` keys the output slot and must stay
    * positionally stable across polls of one workDir (manifest-pinned). */
  case class CombineEpoch(epoch: String, poseDir: String, idsDir: String)

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  val poseChunkSchema: StructType = StructType(Seq(
    StructField("time", TimestampType), StructField("pose_id", LongType),
    StructField("part", StringType), StructField("x", DoubleType),
    StructField("y", DoubleType)))

  val idsChunkSchema: StructType = StructType(Seq(
    StructField("time", TimestampType), StructField("identity", StringType),
    StructField("identity_likelihood", MapType(StringType, DoubleType)),
    StructField("x_top", DoubleType), StructField("y_top", DoubleType)))

  /** Chunk key = the file's immediate parent directory name.
    * `input_file_name` yields a percent-encoded URI — decode through
    * java.net.URI so a chunk dir with a space or '%' round-trips. */
  private def chunkKey(file: String): String =
    new Path(new java.net.URI(file)).getParent.getName

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Combine one chunk and write its output dir (overwrite-idempotent).
    * Returns false when the id chunk is absent (or present without its
    * `_SUCCESS` commit marker, when required) and `emptyIfMissing` is
    * unset (caller defers the chunk). */
  private def combineOne(sp: SparkSession, poseDir: String, idsDir: String,
      outDir: String, c: String, p: Combine.Params, anchorPart: String,
      emptyIfMissing: Boolean, requireSuccess: Boolean): Boolean = {
    val idsPath = new Path(s"$idsDir/$c")
    val idsFs = fs(sp, idsDir)
    val haveIds = idsFs.exists(idsPath) &&
      (!requireSuccess || idsFs.exists(new Path(idsPath, "_SUCCESS")))
    if (!haveIds && !emptyIfMissing) false
    else {
      // loud path for the marker-less-writer misconfiguration: the id DIR
      // exists but never gained _SUCCESS, so finalizeMissing is about to
      // write an EMPTY combine for a chunk that plausibly has identity
      // data — without this signal that's silent data loss
      if (!haveIds && idsFs.exists(idsPath))
        log.warn(
          s"finalizing chunk '$c' as EMPTY: id directory $idsPath exists " +
          "but has no _SUCCESS marker — if the id writer never emits " +
          "_SUCCESS, pass requireIdsSuccessMarker=false")
      val pose = sp.read.schema(poseChunkSchema).parquet(s"$poseDir/$c")
      val ids =
        if (haveIds) sp.read.schema(idsChunkSchema).parquet(s"$idsDir/$c")
        else sp.createDataFrame(
          sp.sparkContext.emptyRDD[org.apache.spark.sql.Row], idsChunkSchema)
      Combine.combineChunk(pose, ids, p, anchorPart)
        .write.mode("overwrite").parquet(s"$outDir/$c")
      true
    }
  }

  /** One incremental poll over N epochs through ONE streaming query and
    * ONE checkpoint: combine every pose chunk whose files are new to the
    * checkpoint plus every previously-deferred chunk, pairing each with
    * the same-named id chunk of its own epoch.
    *
    * Single-epoch workDirs keep the pre-multi layout (`pending/` and
    * `out/` directly under workDir) so live deployments keep their
    * checkpointed seen-file logs and per-chunk output dirs; multi-epoch
    * workDirs slot each epoch at `pending/m<i>` / `out/m<i>`. The stream
    * sources and slot dirs are positional, so the epoch Seq is
    * manifest-pinned (`workDir/epochs.txt`) like the detector pollers.
    * Discovered chunks combine as up to `maxConcurrentChunks` concurrent
    * Spark jobs (independent inputs, disjoint output dirs). */
  def pollCombineMulti(spark: SparkSession, epochs: Seq[CombineEpoch],
      workDir: String, p: Combine.Params, anchorPart: String = "anchor",
      finalizeMissing: Boolean = false,
      requireIdsSuccessMarker: Boolean = true,
      maxConcurrentChunks: Int = 4): Unit = {
    require(epochs.nonEmpty, "at least one epoch")
    require(epochs.map(_.epoch).distinct.length == epochs.length,
      "epoch keys must be unique")
    require(maxConcurrentChunks >= 1, "maxConcurrentChunks must be >= 1")
    Poll.checkEpochManifest(spark, workDir, epochs.map(_.epoch))
    val single = epochs.lengthCompare(1) == 0
    val pendingRoot = s"$workDir/pending"
    val outRoot = s"$workDir/out"
    def slot(root: String, i: Int): String =
      if (single) root else s"$root/m$i"
    // deferred chunks retry BEFORE the stream: their ids may have landed
    // since the previous poll — and running the retry first means a chunk
    // deferred by THIS poll's micro-batch is not immediately re-probed in
    // the same poll (a guaranteed-futile FS round-trip)
    def retryPending(emptyIfMissing: Boolean): Unit = {
      val pfs = fs(spark, pendingRoot)
      epochs.zipWithIndex.foreach { case (e, i) =>
        val pendDir = new Path(slot(pendingRoot, i))
        if (pfs.exists(pendDir)) pfs.listStatus(pendDir).foreach { st =>
          if (st.isFile) {
            val c = st.getPath.getName
            if (combineOne(spark, e.poseDir, e.idsDir, slot(outRoot, i), c,
                p, anchorPart, emptyIfMissing = emptyIfMissing,
                requireIdsSuccessMarker))
              pfs.delete(st.getPath, false)
          }
        }
      }
    }
    retryPending(emptyIfMissing = false)
    val poseFiles = epochs.zipWithIndex.map { case (e, i) =>
      spark.readStream.schema(poseChunkSchema)
        .parquet(s"${e.poseDir}/*")
        .select(input_file_name().as("_f"), lit(i).as("_i"))
    }.reduce(_ union _)
    poseFiles.writeStream
      .option("checkpointLocation", s"$workDir/ckpt_combine")
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val chunks = batch.select("_i", "_f").distinct().collect()
          .map(r => (r.getInt(0), chunkKey(r.getString(1))))
          .distinct.sorted
        val pfs = fs(sp, pendingRoot)
        // per-chunk combines are independent jobs on disjoint output dirs:
        // submit them CONCURRENTLY (bounded pool) instead of serially — at
        // N rigs a poll lands N chunks, and serial submission multiplies
        // poll latency by N while most of the cluster idles. A failed
        // chunk propagates and fails the micro-batch; the checkpoint does
        // not advance and the idempotent overwrite re-runs everything next
        // poll (same at-least-once contract as the serial loop).
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.max(1, math.min(maxConcurrentChunks, chunks.length)))
        try {
          val futures = chunks.toSeq.map { case (i, c) =>
            pool.submit(new java.util.concurrent.Callable[Unit] {
              def call(): Unit = {
                val e = epochs(i)
                if (!combineOne(sp, e.poseDir, e.idsDir, slot(outRoot, i), c,
                    p, anchorPart, emptyIfMissing = false,
                    requireIdsSuccessMarker))
                  pfs.create(new Path(s"${slot(pendingRoot, i)}/$c"), true)
                    .close()
              }
            })
          }
          futures.foreach(_.get())
        } finally pool.shutdown()
        ()
      }
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // the epochs' LAST poll must also finalize chunks deferred by the
    // micro-batch that just ran (their ids will never arrive)
    if (finalizeMissing) retryPending(emptyIfMissing = true)
  }

  /** Single-epoch convenience: [[pollCombineMulti]] with one unnamed
    * [[CombineEpoch]] (legacy workDir layout preserved). */
  def pollCombine(spark: SparkSession, poseDir: String, idsDir: String,
      workDir: String, p: Combine.Params, anchorPart: String = "anchor",
      finalizeMissing: Boolean = false,
      requireIdsSuccessMarker: Boolean = true): Unit =
    pollCombineMulti(spark, Seq(CombineEpoch("", poseDir, idsDir)), workDir,
      p, anchorPart, finalizeMissing, requireIdsSuccessMarker)

  private def combinedUnder(spark: SparkSession, outDir: String): DataFrame = {
    val root = new Path(outDir)
    val rfs = fs(spark, outDir)
    val dirs =
      if (rfs.exists(root)) rfs.listStatus(root).filter(_.isDirectory).map(_.getPath.toString)
      else Array.empty[String]
    if (dirs.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], poseChunkSchema)
      val emptyIds = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], idsChunkSchema)
      Combine.combineChunk(empty, emptyIds, Combine.Params())
    } else spark.read.parquet(dirs.toIndexedSeq: _*)
  }

  /** Combined output so far of a SINGLE-epoch workDir (batch read over the
    * per-chunk output dirs). Empty (no chunk processed yet) keeps the
    * combineChunk schema so `select`s on the documented columns still
    * resolve. */
  def combined(spark: SparkSession, workDir: String): DataFrame =
    combinedUnder(spark, s"$workDir/out")

  /** Combined output so far of a multi-epoch workDir, one `epoch` column
    * prepended. `epochs` must be the same manifest-pinned Seq the poller
    * runs with (slots are positional). */
  def combinedByEpoch(spark: SparkSession, epochs: Seq[CombineEpoch],
      workDir: String): DataFrame = {
    require(epochs.nonEmpty, "at least one epoch")
    val single = epochs.lengthCompare(1) == 0
    epochs.zipWithIndex.map { case (e, i) =>
      val outDir = if (single) s"$workDir/out" else s"$workDir/out/m$i"
      combinedUnder(spark, outDir)
        .select(lit(e.epoch).as("epoch"), col("*"))
    }.reduce(_ union _)
  }
}
