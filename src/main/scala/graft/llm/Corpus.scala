package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed corpus-preparation recipes — the batch entry a training-data
  * pipeline actually runs: quality floor, language selection, and
  * deduplication in one pass, shaped so nothing corpus-sized shuffles.
  */
object Corpus {

  /** Filter to documents meeting a quality floor (rounded to 6 decimals —
    * the same fixed-point the differential oracles compare at, so the
    * boundary is bit-stable across engines) in the selected predicted
    * languages, then exact-dedup the survivors. Per-document stats
    * (token count, content hash) are computed BEFORE grouping, so the
    * aggregation shuffles only 32-byte hashes and counters — documents
    * themselves never shuffle. Output: (rep_id, n_copies, n_tokens) per
    * distinct surviving content. Near-dup collapse beyond exact content
    * is [[Dedup.minhashRepresentatives]] composed downstream. */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
      stops: Seq[String], markers: Seq[(String, Seq[String])],
      minQuality: Double, langs: Seq[String]): DataFrame = {
    val t: Column = col(textCol)
    docs
      .filter(round(TextStats.qualityScore(t, stops), 6) >= minQuality &&
        TextStats.langId(t, markers).isin(langs: _*))
      .select(col(idCol), TextStats.tokenCount(t).as("_nt"),
        sha2(t, 256).as("_ch"))
      .groupBy("_ch")
      .agg(min(idCol).as("rep_id"), count(lit(1)).as("n_copies"),
        // all members of a hash group share the text, hence the count
        min("_nt").as("n_tokens"))
      .select("rep_id", "n_copies", "n_tokens")
  }
}
