package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
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
  * name; chunk dirs are immutable once written. A pose chunk whose id
  * chunk is absent yields an EMPTY output dir — the reference's
  * no-identity-data path (`combine_pose_id_chunk.py:245-250`) — and is
  * not retried.
  */
object CombineStream {

  val poseChunkSchema: StructType = StructType(Seq(
    StructField("time", TimestampType), StructField("pose_id", LongType),
    StructField("part", StringType), StructField("x", DoubleType),
    StructField("y", DoubleType)))

  val idsChunkSchema: StructType = StructType(Seq(
    StructField("time", TimestampType), StructField("identity", StringType),
    StructField("identity_likelihood", MapType(StringType, DoubleType)),
    StructField("x_top", DoubleType), StructField("y_top", DoubleType)))

  /** Chunk key = the file's immediate parent directory name. */
  private def chunkKey(file: String): String = {
    val parts = file.split('/')
    parts(parts.length - 2)
  }

  /** One incremental poll: combine every pose chunk whose files are new to
    * the checkpoint, pairing with the same-named id chunk. */
  def pollCombine(spark: SparkSession, poseDir: String, idsDir: String,
      workDir: String, p: Combine.Params, anchorPart: String = "anchor"): Unit = {
    new java.io.File(s"$workDir/out").mkdirs()
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
        chunks.foreach { c =>
          val pose = sp.read.schema(poseChunkSchema).parquet(s"$poseDir/$c")
          val idsPath = new org.apache.hadoop.fs.Path(s"$idsDir/$c")
          val fs = idsPath.getFileSystem(sp.sparkContext.hadoopConfiguration)
          val ids =
            if (fs.exists(idsPath))
              sp.read.schema(idsChunkSchema).parquet(s"$idsDir/$c")
            else sp.createDataFrame(
              sp.sparkContext.emptyRDD[org.apache.spark.sql.Row], idsChunkSchema)
          Combine.combineChunk(pose, ids, p, anchorPart)
            .write.mode("overwrite").parquet(s"$workDir/out/$c")
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
  }

  /** Combined output so far (batch read over the per-chunk output dirs). */
  def combined(spark: SparkSession, workDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(s"$workDir/out")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (fs.exists(root)) fs.listStatus(root).filter(_.isDirectory).map(_.getPath.toString)
      else Array.empty[String]
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(dirs.toIndexedSeq: _*)
  }
}
