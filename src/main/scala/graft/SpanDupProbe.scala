package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Substring-span duplication at scale (SURVEY §8): [[Dedup.spanDupStats]]
  * over the [[DedupStress]]-style mutation corpus — `nBase` clusters × 20
  * copies, copy k mutating one word slot, PLUS `nBase/10` fully-unique
  * control documents. Expectations are structural: each copy's mutated
  * token is globally unique, so AT MOST `spanLen` of a cluster doc's 36
  * windows touch it and miss — every other window is shared with the 19
  * sibling copies mutating other slots → dup_frac ∈ [31/36, 1) for every
  * cluster doc, while control docs share nothing → dup_frac = 0 exactly.
  * The probe asserts both bounds for every document and reports wall
  * time for the ~(docs × 36) window keys the hashed path shuffles.
  *
  * `SPARK_GRAFT_SPAN_BASE` scales (default 10000 → 210 k docs ≈ 7.6 M
  * windows; 50000 → 1.05 M docs ≈ 38 M windows). */
object SpanDupProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nBase = sys.env.getOrElse("SPARK_GRAFT_SPAN_BASE", "10000").toInt
    val copies = 20
    val nCtl = nBase / 10

    val cluster: DataFrame = spark.range(nBase.toLong * copies)
      .select(col("id").as("doc_id"),
        (col("id") % nBase).as("base"),
        (col("id") / nBase).cast("long").as("copy"))
      .select(col("doc_id"), concat_ws(" ",
        (0 until 40).map { w =>
          val b = concat(lit("w"), (col("base") * 40 + w).cast("string"))
          when(lit(w) === col("copy") % 40,
            concat(lit("m"), col("copy"), lit("_"), b)).otherwise(b)
        }: _*).as("text"))
    val control: DataFrame = spark.range(nCtl)
      .select((col("id") + nBase.toLong * copies).as("doc_id"),
        concat_ws(" ", (0 until 40).map { w =>
          concat(lit("u"), ((col("id") + nBase.toLong * copies) * 40 + w)
            .cast("string"))
        }: _*).as("text"))
    val docs = cluster.union(control).localCheckpoint()

    val t0 = System.nanoTime()
    val stats = Dedup.spanDupStats(docs, "doc_id", "text", spanTokens = 5)
      .localCheckpoint()
    val wall = (System.nanoTime() - t0) / 1e9
    val nDocs = nBase.toLong * copies + nCtl
    val rows = stats.count()
    // control docs: exactly zero duplicated windows
    val ctlBad = stats.filter(col("doc_id") >= nBase.toLong * copies &&
      col("n_dup_windows") =!= 0L).count()
    // cluster docs: only the ≤5 windows over the (globally unique)
    // mutated token can miss — at least 31 of 36 windows duplicated
    val clBad = stats.filter(col("doc_id") < nBase.toLong * copies &&
      col("n_dup_windows") < 31L).count()
    val windows = stats.agg(sum("n_windows")).head.getLong(0)
    val ok = rows == nDocs && ctlBad == 0 && clBad == 0
    println(s"SPAN_DUP docs=$nDocs windows=$windows " +
      f"wall=$wall%.1fs ctlNonzero=$ctlBad clusterBelow1=$clBad " +
      s"${if (ok) "OK" else "FAIL"}")

    // REMOVAL arm — [[Dedup.removeDupSpans]] on the same corpus, so the
    // rebuild tail's wall is probe-recorded (round 9's interval form sat
    // at 18.7 s parity with the per-token filter at 1 M docs; the
    // slice+array_join complement rebuild is what this arm measures).
    // Structural checks mirror the stats arm: control docs pass through
    // byte-identical; a cluster doc keeps ONLY tokens whose every
    // covering window touches its globally-unique mutated slot (≥ 31 of
    // 40 removed).
    val t1 = System.nanoTime()
    val rm = Dedup.removeDupSpans(docs, "doc_id", "text", spanTokens = 5)
      .localCheckpoint()
    val rmWall = (System.nanoTime() - t1) / 1e9
    val rmRows = rm.count()
    val rmCtlBad = rm.join(docs, "doc_id")
      .filter(col("doc_id") >= nBase.toLong * copies &&
        (col("n_removed") =!= 0L || col("clean_text") =!= col("text")))
      .count()
    val rmClBad = rm.filter(col("doc_id") < nBase.toLong * copies &&
      col("n_removed") < 31L).count()
    val rmOk = rmRows == nDocs && rmCtlBad == 0 && rmClBad == 0
    println(s"SPAN_RM docs=$nDocs " +
      f"wall=$rmWall%.1fs ctlTouched=$rmCtlBad clusterBelow31=$rmClBad " +
      s"${if (rmOk) "OK" else "FAIL"}")
    spark.stop()
    if (!ok || !rmOk) sys.exit(1)
  }
}
