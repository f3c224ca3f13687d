package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition and compliance quality signals for training-data curation —
  * the Gopher-style "fraction of the document that is self-repetition"
  * family plus PII scrubbing. Complements [[TextStats]] (per-row column
  * math) with the one signal that needs an aggregation (top-n-gram
  * fraction) expressed in the scale shape: explode → (doc, gram) count →
  * per-doc agg, all partial-aggregation-friendly keys that contain the
  * doc id, so no gram — however viral across the corpus — ever
  * concentrates rows on one task (repetition is WITHIN a document;
  * corpus-level span duplication is [[Dedup.spanDupStats]]'s job).
  */
object Quality {

  /** Per-document repetition statistics (the shape of the Gopher/
    * MassiveText repetition filters: duplicate-word fraction, duplicate
    * n-gram fraction, and the most-frequent-n-gram fraction):
    *
    *   - `dup_word_frac`   = (n_tokens − n_distinct_tokens) / n_tokens
    *   - `dup_bigram_frac` = (n_bigrams − n_distinct_bigrams) / n_bigrams
    *   - `top_bigram_frac` = occurrences of the most frequent bigram
    *                         / n_bigrams
    *
    * Tokens are `' '`-split ([[TextStats.tokenCount]] semantics). A
    * document with fewer than two tokens has no bigrams; its bigram
    * fractions are 0.0. Fractions round to 6 decimals.
    *
    * Distinct-token counting is per-row `array_distinct` (linear, stays
    * in whole-stage codegen); the bigram tallies go through one shuffle
    * keyed by (doc, bigram) — uniform by construction — then a per-doc
    * aggregate, joined back to the per-row stats on doc_id.
    *
    * Output: (doc_id, n_tokens, dup_word_frac, dup_bigram_frac,
    * top_bigram_frac), one row per input document with a non-null id and
    * text. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = split(col(textCol), " ")
    val m = size(tok) - 1
    // zip_with over two length-m slices, NOT transform(sequence(1,m),
    // p => slice(tok,p,2)): the positional form re-slices per element
    // (measured 3× slower on the interpreted HOF path), and zip_with
    // needs the guard anyway — slice with length 0 is invalid, and
    // unequal slice lengths would null-pad the pairs
    val bigrams = when(m < 1, array().cast("array<string>"))
      .otherwise(zip_with(slice(tok, lit(1), m), slice(tok, lit(2), m),
        (a, b) => concat(a, lit(" "), b)))
    val base = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tok.as("_toks"), bigrams.as("_bgs"))
    val perRow = base.select(col("doc_id"),
      size(col("_toks")).cast("double").as("_nt"),
      size(array_distinct(col("_toks"))).cast("double").as("_ndt"))
    val counts = base.select(col("doc_id"), explode(col("_bgs")).as("_b"))
      .groupBy("doc_id", "_b").agg(count(lit(1)).as("_c"))
      .groupBy("doc_id").agg(
        sum(col("_c")).cast("double").as("_nb"),
        count(lit(1)).cast("double").as("_ndb"),
        max(col("_c")).cast("double").as("_mx"))
    perRow.join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("_nt").cast("long").as("n_tokens"),
        round((col("_nt") - col("_ndt")) / col("_nt"), 6).as("dup_word_frac"),
        round(coalesce((col("_nb") - col("_ndb")) / col("_nb"), lit(0.0)), 6)
          .as("dup_bigram_frac"),
        round(coalesce(col("_mx") / col("_nb"), lit(0.0)), 6)
          .as("top_bigram_frac"))
  }

  /** PII patterns — deliberately alternation-free (character classes +
    * quantifiers only) so leftmost-greedy (Java) and leftmost-Perl (RE2)
    * engines match identically, which a SQL oracle replay relies on. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Fixed-shape international phone: +C[C] NNN NNN NNNN. */
  val PhoneRe = "\\+\\d{1,2} \\d{3} \\d{3} \\d{4}"

  /** Count of pattern hits (codegen'd regexp_extract_all). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Redact emails, then IPv4 addresses, then phone numbers (order is part
    * of the contract: an email's domain can never be re-matched as an IP
    * once it is `<EMAIL>`). Pure column math — scan-speed scrubbing. */
  def scrubPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }

  /** Whitespace-family character class — EXPLICIT (no `\s`, no unicode
    * properties) so Java regex and RE2 agree byte for byte: Java's `\s`
    * is ASCII-only by default while other engines disagree on vertical
    * tab and unicode spaces; an explicit class removes the question. */
  val WsRe = "[ \\t\\n\\r\\f\\x0B]+"
  /** C0 control characters and DEL, minus the whitespace family above —
    * the bytes a crawler's transport layer leaks into text. */
  val CtrlRe = "[\\x00-\\x08\\x0E-\\x1F\\x7F]"

  /** Canonicalize raw text: strip control characters, collapse every
    * whitespace run (tab/newline/CR/FF/VT included) to one space, trim,
    * and optionally lowercase — the normalization pass that runs BEFORE
    * hashing-based dedup so that byte-level transport noise (CRLF vs LF,
    * tab indentation, trailing blanks) cannot split an exact-duplicate
    * group. Pure column math, scan-speed, alternation-free patterns
    * (oracle-replayable in any RE2 engine). Control characters become
    * nothing (not a space): a stray NUL inside a word must not split the
    * word, while whitespace runs collapse on their own class. */
  def normalizeText(text: Column, lowercase: Boolean = false): Column = {
    val stripped = regexp_replace(text, CtrlRe, "")
    val collapsed = trim(regexp_replace(stripped, WsRe, " "))
    if (lowercase) lower(collapsed) else collapsed
  }
}
