package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library for training-data pipelines: token counting,
  * quality scoring, language identification, and content fingerprinting.
  * Everything is pure column math (codegen-friendly, no UDFs) so it runs at
  * scan speed inside whole-stage codegen.
  */
object TextStats {

  /** Whitespace token count — deliberately `' '`-split semantics (Python
    * `text.split(' ')`): empty strings and repeated spaces yield phantom
    * tokens, exactly like the naive split the oracle and reference-style
    * pipelines use. Normalize whitespace upstream when that matters. */
  def tokenCount(text: Column): Column =
    // = size(split(text, " ")): split with the keep-trailing-empties
    // limit yields exactly (number of separators + 1) tokens, so the
    // count is one compiled byte scan — no token-array allocation
    graft.functions.Cols.asciiSetCount(text, " ") + 1

  /** BPE-ish subword token estimate: alphanumeric runs and single
    * non-alphanumeric marks each count as one token — one compiled byte
    * scan ([[graft.functions.Cols.alnumRunCount]]; the
    * regexp_extract_all form materialized every match in an array just
    * to size() it). */
  def bpeTokenEstimate(text: Column): Column =
    graft.functions.Cols.alnumRunCount(lower(text))

  /** Fraction of tokens in the stopword list (quality signal). One
    * compiled membership-count pass ([[graft.functions.Cols.tokenSetHits]])
    * — the filter/isInCollection lambda form ran interpreted and built
    * the kept-token array per row (4.7 s vs 0.3 s at sf1). */
  def stopwordRatio(text: Column, stops: Seq[String]): Column = {
    val toks = split(lower(text), " ")
    graft.functions.Cols.tokenSetHits(toks, stops).cast("double") / size(toks)
  }

  /** Fraction of characters that are a-z0-9 or space; 0.0 for empty text
    * (a bare division would null out and break qualityScore's [0,1]
    * contract). */
  def alphaRatio(text: Column): Column =
    // codepoints kept by the old regexp_replace deletion = codepoints in
    // the ASCII class — counted in one compiled byte scan instead of
    // building the replaced string (the regex pass dominated tx2's wall)
    when(length(text) === 0, 0.0).otherwise(
      graft.functions.Cols.asciiSetCount(lower(text),
        "abcdefghijklmnopqrstuvwxyz0123456789 ").cast("double") / length(text))

  /** Composite quality score ∈ [0,1]: length prior + stopword band +
    * alphanumeric purity (shape of C4/Gopher-style heuristics). */
  def qualityScore(text: Column, stops: Seq[String]): Column = {
    val lenPrior = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    lenPrior * 0.5 + stopwordRatio(text, stops) * 0.3 + alphaRatio(text) * 0.2
  }

  /** Marker-token language votes: count of hits in `markers` (compiled
    * membership count, no interpreted lambda). */
  def langVotes(text: Column, markers: Seq[String]): Column =
    graft.functions.Cols.tokenSetHits(split(lower(text), " "), markers)

  /** Argmax language over marker vote sets with deterministic tie-break
    * (earlier entry wins ties). */
  def langId(text: Column, markerSets: Seq[(String, Seq[String])]): Column = {
    val votes = markerSets.map { case (lang, m) => (lit(lang), langVotes(text, m)) }
    votes.tail.foldLeft(votes.head) { case ((bestLang, bestVotes), (lang, v)) =>
      (when(v > bestVotes, lang).otherwise(bestLang), greatest(bestVotes, v))
    }._1
  }

  /** Content fingerprint: md5 of whitespace/punctuation-normalized text —
    * the cheap exact-dedup key after normalization. Text whose ASCII
    * normalization is EMPTY (non-Latin scripts, emoji-only) falls back to
    * hashing the raw text, so distinct non-Latin documents never collapse
    * into one dedup bucket. */
  def fingerprint(text: Column): Column = {
    // one compiled byte pass (graft.expressions.AlnumNormExpr) — the
    // regex form built the normalized string per row AND evaluated it
    // twice (empty test + value); byte-exact, raw-fallback included
    import org.apache.spark.sql.graft.ColumnBridge
    md5(ColumnBridge.column(graft.expressions.AlnumNormExpr(
      ColumnBridge.expression(text), ColumnBridge.expression(lower(text))))
      .cast("binary"))
  }

  /** Winnowing document sketch (rolling k-gram hashes, window minima) —
    * near-dup fingerprint used by plagiarism-style matching. Driver-side
    * kernel for the typed Dataset path; property-tested in ScalaTest.
    */
  def winnow(text: String, k: Int, window: Int): Seq[Long] = {
    val s = text.toLowerCase(java.util.Locale.ROOT)
    if (s.length < k) return Seq.empty
    val hashes = (0 to s.length - k).map { i =>
      var h = 1125899906842597L // FNV-ish polynomial rolling base
      var j = i
      while (j < i + k) { h = 31 * h + s.charAt(j); j += 1 }
      h
    }
    if (hashes.length <= window) Seq(hashes.min)
    else hashes.sliding(window).map(_.min).toSeq.distinct
  }
}
