package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan probe: does the indexed-IVF scoring join prune the cell-partitioned
  * corpus scan (dynamic partition pruning from the query side)? */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfprobe").toString
    graft.llm.Similarity.saveIvfIndex(embs, "vec_id", "embedding", dir, nlist = 8)
    val q = embs.filter(col("vec_id") < 5)
    val served = graft.llm.Similarity.ivfTopKIndexed(q, dir, "vec_id", "embedding", 5, 2)
    val plan = served.queryExecution.executedPlan.toString
    println("HAS_DPP=" + plan.contains("dynamicpruning"))
    plan.linesIterator.filter(l => l.contains("PartitionFilters"))
      .foreach(l => println("PF: " + l.trim.take(200)))
    served.write.format("noop").mode("overwrite").save()
    spark.stop()
  }
}
