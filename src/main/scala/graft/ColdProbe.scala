package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Cold-scan attribution for the shingle-heavy text queries (d2/d3/d4,
  * the round-13 watch item): runs each named query once through the
  * noop sink and prints per-stage wall, executor CPU, input bytes and
  * read time, shuffle bytes and fetch wait, and spill — so a cold 5-6×
  * swing can be attributed to first-touch scan I/O vs shuffle spill.
  * Run once right after `sync; echo 3 > /proc/sys/vm/drop_caches` for
  * the cold arm, then again in the same session for the warm arm. */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("d2_ngram_jaccard", "d3_minhash_lsh", "d4_simhash")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val wall = (for { a <- i.completionTime; b <- i.submissionTime }
          yield a - b).getOrElse(-1L)
        println(f"  STG ${i.stageId}%3d ${wall}%6d ms  " +
          f"cpu=${m.executorCpuTime / 1000000}%6d ms  " +
          f"in=${m.inputMetrics.bytesRead / 1024 / 1024}%5d MB/" +
          f"${m.inputMetrics.recordsRead}%8d rows  " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1024 / 1024}%4d MB " +
          f"fetchWait=${m.shuffleReadMetrics.fetchWaitTime}%5d ms  " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1024 / 1024}%4d MB  " +
          f"spillD=${m.diskBytesSpilled / 1024 / 1024}%4d MB  " +
          f"tasks=${i.numTasks}%3d  ${i.name.takeWhile(_ != '\n').take(40)}")
      }
    })
    for (rep <- 1 to 2; name <- names) {
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(s"coldprobe: $name rep$rep")
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"COLD $name rep$rep  ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
