package graft

import org.apache.spark.sql.SparkSession

/** Cache-lifecycle probe (SURVEY §8): runs the three queries whose
  * operators materialize intermediates (`d2` prefix-filtered Jaccard,
  * `d3` MinHash+LSH, `ann2` IVF recall — all on eager `localCheckpoint`,
  * no `CacheManager` entries) 10× each and asserts storage does NOT grow
  * across iterations: checkpoint blocks must be freed by the
  * ContextCleaner once each iteration's plans become unreachable, so a
  * long-running service issuing these queries forever holds steady-state
  * memory. Prints one line per iteration + a PASS line; run with
  * `sbt "runMain graft.LeakProbe [sfDir]"`.
  */
object LeakProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("d2_ngram_jaccard", "d3_minhash_lsh", "ann2_ivf_recall")
    def storageNow(): (Int, Long) = {
      // ContextCleaner frees checkpoint blocks asynchronously after their
      // RDDs are GC-unreachable — force the GC, then let the cleaner drain
      System.gc()
      Thread.sleep(1000)
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.length, infos.map(i => i.memSize + i.diskSize).sum)
    }
    val counts = (1 to 10).map { i =>
      names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
      val (nRdds, bytes) = storageNow()
      println(f"LEAK_PROBE iter=$i cachedRdds=$nRdds storageMb=${bytes / 1e6}%.1f")
      nRdds
    }
    // steady state: the last iteration may hold at most one iteration's
    // worth of still-reachable blocks — growth across 10 iterations means
    // a leak (the pre-round-5 cache() forms held every iteration's blocks)
    val early = counts.take(3).max
    require(counts.last <= early.max(1) + 2,
      s"storage grew across iterations: $counts")
    println(s"LEAK_PROBE_PASS iterations=10 queries=${names.mkString(",")} " +
      s"rddCounts=${counts.mkString(",")}")
    spark.stop()
  }
}
