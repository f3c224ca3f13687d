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
  */
object CombineStream {

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
      workDir: String, c: String, p: Combine.Params, anchorPart: String,
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
        .write.mode("overwrite").parquet(s"$workDir/out/$c")
      true
    }
  }

  /** One incremental poll: combine every pose chunk whose files are new to
    * the checkpoint plus every previously-deferred chunk, pairing each
    * with the same-named id chunk. */
  def pollCombine(spark: SparkSession, poseDir: String, idsDir: String,
      workDir: String, p: Combine.Params, anchorPart: String = "anchor",
      finalizeMissing: Boolean = false,
      requireIdsSuccessMarker: Boolean = true): Unit = {
    val pendingDir = s"$workDir/pending"
    // deferred chunks retry BEFORE the stream: their ids may have landed
    // since the previous poll — and running the retry first means a chunk
    // deferred by THIS poll's micro-batch is not immediately re-probed in
    // the same poll (a guaranteed-futile FS round-trip)
    def retryPending(emptyIfMissing: Boolean): Unit = {
      val pfs = fs(spark, pendingDir)
      val pendRoot = new Path(pendingDir)
      if (pfs.exists(pendRoot)) pfs.listStatus(pendRoot).foreach { st =>
        val c = st.getPath.getName
        if (combineOne(spark, poseDir, idsDir, workDir, c, p, anchorPart,
            emptyIfMissing = emptyIfMissing, requireIdsSuccessMarker))
          pfs.delete(st.getPath, false)
      }
    }
    retryPending(emptyIfMissing = false)
    val poseFiles = spark.readStream.schema(poseChunkSchema)
      .parquet(s"$poseDir/*")
      .select(input_file_name().as("_f"))
    poseFiles.writeStream
      .option("checkpointLocation", s"$workDir/ckpt_combine")
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val chunks = batch.select("_f").distinct().collect()
          .map(r => chunkKey(r.getString(0))).distinct.sorted
        val pfs = fs(sp, pendingDir)
        chunks.foreach { c =>
          if (!combineOne(sp, poseDir, idsDir, workDir, c, p, anchorPart,
              emptyIfMissing = false, requireIdsSuccessMarker))
            pfs.create(new Path(s"$pendingDir/$c"), true).close()
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // the epoch's LAST poll must also finalize chunks deferred by the
    // micro-batch that just ran (their ids will never arrive)
    if (finalizeMissing) retryPending(emptyIfMissing = true)
  }

  /** Combined output so far (batch read over the per-chunk output dirs).
    * Empty (no chunk processed yet) keeps the combineChunk schema so
    * `select`s on the documented columns still resolve. */
  def combined(spark: SparkSession, workDir: String): DataFrame = {
    val root = new Path(s"$workDir/out")
    val rfs = fs(spark, s"$workDir/out")
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
}
