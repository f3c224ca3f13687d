package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.SpanDupStream

/** Span-dup INGEST probe (SURVEY §8): the [[SpanDupStream]] poller at the
  * operational shape — deliveries land poll by poll, each is scored
  * against the accumulated window state, and the per-poll wall must stay
  * roughly flat as the state grows poll over poll (per-poll work =
  * delivery explode + broadcast-probe of the state scan; nothing
  * corpus-sized shuffles).
  *
  * Each delivery is the [[SpanDupProbe]] mutation corpus NAMESPACED BY
  * DELIVERY (token prefix `d<k>_`), so deliveries are bridge-free by
  * construction and the structural expectations hold per delivery at
  * score time: every control doc dup_frac = 0 exactly, every cluster doc
  * ≥ 31 of its 36 windows duplicated. Asserted over the FULL accumulated
  * stats table at the end — correctness of every poll, not just the last.
  *
  * `SPARK_GRAFT_SPAN_BASE` = clusters per delivery (default 2000 → 42 k
  * docs/poll), `SPARK_GRAFT_SPAN_POLLS` = deliveries (default 6). */
object SpanDupIngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nBase = sys.env.getOrElse("SPARK_GRAFT_SPAN_BASE", "2000").toInt
    val nPolls = sys.env.getOrElse("SPARK_GRAFT_SPAN_POLLS", "6").toInt
    val copies = 20
    val nCtl = nBase / 10
    val perPoll = nBase.toLong * copies + nCtl
    val root = java.nio.file.Files.createTempDirectory("graft_spaningest").toString
    val landing = s"$root/landing"; val work = s"$root/work"
    new java.io.File(landing).mkdirs()

    def delivery(k: Int): DataFrame = {
      val off = k * perPoll
      val cluster = spark.range(nBase.toLong * copies)
        .select((col("id") + off).as("doc_id"),
          (col("id") % nBase).as("base"),
          (col("id") / nBase).cast("long").as("copy"))
        .select(col("doc_id"), concat_ws(" ",
          (0 until 40).map { w =>
            val b = concat(lit(s"d${k}_w"),
              (col("base") * 40 + w).cast("string"))
            when(lit(w) === col("copy") % 40,
              concat(lit("m"), col("copy"), lit("_"), b)).otherwise(b)
          }: _*).as("text"))
      val control = spark.range(nCtl)
        .select((col("id") + off + nBase.toLong * copies).as("doc_id"),
          concat_ws(" ", (0 until 40).map { w =>
            concat(lit("u"),
              ((col("id") + off + nBase.toLong * copies) * 40 + w)
                .cast("string"))
          }: _*).as("text"))
      cluster.union(control)
    }

    val p = SpanDupStream.Params(spanTokens = 5, minDocs = 2, compactEvery = 3)
    val walls = (0 until nPolls).map { k =>
      delivery(k).write.parquet(s"$landing/d$k")
      val t0 = System.nanoTime()
      SpanDupStream.pollSpanDup(spark, landing, work, p)
      (System.nanoTime() - t0) / 1e9
    }
    // structural exactness over EVERY scored doc: id → class via the
    // per-delivery layout (local id < clusters·copies → cluster doc)
    val st = SpanDupStream.stats(spark, work)
      .withColumn("_local", pmod(col("doc_id"), lit(perPoll)))
    val nDocs = st.count()
    val ctlBad = st.filter(col("_local") >= nBase.toLong * copies &&
      col("n_dup_windows") =!= 0L).count()
    val clBad = st.filter(col("_local") < nBase.toLong * copies &&
      col("n_dup_windows") < 31L).count()
    val ok = nDocs == perPoll * nPolls && ctlBad == 0 && clBad == 0
    println(s"SPAN_INGEST perPoll=$perPoll polls=$nPolls docs=$nDocs " +
      s"pollS=${walls.map(w => f"$w%.1f").mkString("/")} " +
      s"ctlNonzero=$ctlBad clusterBelow31=$clBad " +
      s"${if (ok) "OK" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
