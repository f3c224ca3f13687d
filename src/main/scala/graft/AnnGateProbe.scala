package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Stage-level timing for the ANN construction gates (ann5/6/8/10/11's
  * shape): setup → save → append → corpus-count → refined serve. The
  * gates are adjudicated persistence-loop replays, but their wall is the
  * largest engine cost class at the bench tier — this probe attributes
  * it so optimization lands on the real stage, not a guess. */
object AnnGateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.nio.file.Files

    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
          starts.put(j.jobId, (System.nanoTime(), j.stageInfos.map(si =>
            s"${si.name.takeWhile(_ != '\n').take(60)}(${si.numTasks})")
            .mkString(" | ")))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          if (sys.env.contains("SPARK_GRAFT_PROBE_JOBS"))
            Option(starts.get(j.jobId)).foreach { case (t0, nm) =>
              println(f"  JOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%7.1f ms  $nm")
            }
        }
      })
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val j0 = jobs.get; val s0 = stages.get
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d")
      r
    }

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell"), col("embedding").as("_cv"))
      val cbs = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("code"), col("embedding"))
        .select(col("code"), explode(sequence(lit(0), lit(7))).as("m"),
          col("embedding"))
        .select(col("m"), col("code"),
          slice(col("embedding"), col("m") * 8 + 1, lit(8)).as("_cbv"))
      val rot = spark.range(64).select(col("id").cast("int").as("i"),
        transform(sequence(lit(0), lit(63)), j =>
          when(j === lit(63) - col("id").cast("int"), lit(1.0f))
            .otherwise(lit(0.0f))).as("_rv"))
      val idx = Files.createTempDirectory("graft_annprobe").toString
      timed("save_pq_residual_rotated") {
        Similarity.saveIvfIndexPQ(e.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", idx, nlist = 8, pqM = 8, pqK = 8,
          centroids = Some(cents), codebooks = Some(cbs), residual = true,
          rotation = Some(rot))
      }
      timed("append") {
        Similarity.appendIvfIndex(e.filter(col("vec_id") % 2 =!= 0),
          "vec_id", "embedding", idx, Some("b1"))
      }
      val q = e.filter(col("vec_id") < 50)
      val factor = timed("corpus_count")((e.count() / 5 + 1).toInt)
      timed("serve_refined") {
        Similarity.ivfTopKPQRefined(q, idx, e, "vec_id",
          "embedding", k = 5, nprobe = 3, refineFactor = factor)
          .select(col("query_id"), col("neighbor_id"),
            round(col("cos"), 6).as("cos"))
          .orderBy(col("query_id"), col("neighbor_id")).collect()
      }
    }
    spark.stop()
  }
}
