package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev probe: run ONE SparkEntry query under a job-level timing listener
  * — per-job wall, description, job count, and the gap between summed
  * job time and query wall (planning/codegen/driver time). The
  * fixed-overhead diagnosis tool for deep compositions like d21. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = Tables.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = mutable.Map[Int, (Long, String)]()
    val done = mutable.ArrayBuffer[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.synchronized {
          val stages = j.stageInfos.map(_.name.takeWhile(_ != '\n'))
            .distinct.mkString(" | ")
          starts(j.jobId) = (j.time, stages)
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(j.jobId).foreach { case (t0, d) =>
            done += ((j.jobId, j.time - t0, d))
          }
        }
    })
    // warm the session the way Bench does, so codegen/classloading of
    // the scan path isn't billed to the probed query
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val reps = if (args.length > 2) args(2).toInt else 1
    (1 to reps).foreach { rep =>
      done.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").parquet("/tmp/jobprobe_out")
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val snap = done.sortBy(-_._2)
      println(f"[jobprobe] $name rep $rep TOTAL $wall%.2f s, " +
        f"jobs=${snap.size}, summed job time ${snap.map(_._2).sum / 1000.0}%.2f s")
      snap.take(30).foreach { case (id, ms, d) =>
        println(f"[jobprobe] job $id%4d ${ms / 1000.0}%7.2f s  ${d.take(140)}")
      }
    }
    spark.stop()
  }
}
