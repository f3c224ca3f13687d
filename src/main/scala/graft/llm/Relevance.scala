package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Term-relevance tier: TF-IDF document featurization and BM25 keyword
  * retrieval — the query-based corpus-selection tools (pull the documents
  * most relevant to a target topic out of a web-scale pool, or hand a
  * labelling pass the top terms that characterize each document).
  *
  * Scale shape shared by both operators: ONE corpus-sized explode of
  * (doc, term) feeding partial aggregates; document-frequency tables are
  * vocab-sized (BM25's is query-sized — a handful of rows) and join back
  * by term — broadcast when they fit, AQE-skew-rescued otherwise (a
  * stopword's (doc, term) rows all meet one df row); ranking windows
  * partition by doc_id, a key that cannot go viral. Nothing corpus-sized
  * shuffles twice.
  *
  * Determinism contract (the tx8 micro-nat recipe): the ONLY transcendental
  * — the idf logarithm — is fixed-pointed to integer MICRO-NATS
  * immediately (`round(ln(·)·1e6)`), and every downstream score is exact
  * integer arithmetic (products and truncating `div`, which equals floor
  * on the non-negative operands here), so Spark and a SQL oracle agree
  * bit for bit with no float-summation-order or round-midpoint hazard.
  */
object Relevance {

  /** Top-`k` TF-IDF terms per document. Terms are `' '`-split of the
    * lowercased text with empty tokens dropped; `tf` the term's in-doc
    * count, `dl` the doc token count, `df` the number of documents
    * containing the term, `N` the document count. Score (integer
    * micro-units): `tfidf_micro = (tf * idf_micro) div dl` with
    * `idf_micro = round(ln((N+1)/(df+1)) * 1e6)` — the smoothed idf is
    * ≥ 0, so the truncating division is floor on both engines.
    *
    * Rows whose `tf · idf_micro` product cannot be proven to fit a Long
    * evaluate in decimal(38,0) instead (see [[bm25TopK]] — the same
    * per-row automatic widening; here the narrow guard holds for any
    * document under ~2×10¹¹ tokens, so the wide branch is pure
    * insurance). `longBound` is the TEST SEAM: the Long budget the
    * narrow guard proves against — production always leaves it at
    * `Long.MaxValue`; shrinking it forces the wide branch at test scale.
    *
    * Output: (doc_id, term, tf, tfidf_micro, rk), rk = 1..k per doc by
    * (score DESC, term ASC). Documents with no tokens have no rows. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int, longBound: Long = Long.MaxValue): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(longBound >= 1L, s"longBound must be >= 1, got $longBound")
    val tok = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        filter(split(lower(col(textCol)), " "), t => t =!= "").as("_toks"))
    // single-row corpus stats broadcast into the plan — no driver
    // action. "Has ≥ 1 non-empty space-split token" ⟺ "some non-space
    // character exists" ⟺ `trim(text) ≠ ''` — so this branch never
    // tokenizes at all; and on the dt branches below, `explode` of an
    // empty term array drops the row on its own, so no branch carries
    // the split inside a Filter condition (which would re-evaluate the
    // whole tokenize once per operator that mentions it).
    val n = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        trim(col(textCol)) =!= "").agg(count(lit(1)).as("_n"))
    // tf is DOC-LOCAL: one compiled pass per row, then explode the
    // (term, tf) pairs — no corpus-token-scale groupBy exchange (the
    // RepetitionCounts lesson); df and the term join below are the
    // genuinely corpus-level steps and keep their shuffles
    val dt = tok.select(col("doc_id"), size(col("_toks")).as("_dl"),
        explode(graft.functions.Cols.termCounts(col("_toks"))).as("_tc"))
      .select(col("doc_id"), col("_dl"), col("_tc.term").as("term"),
        col("_tc.tf").as("tf"))
    val df = dt.groupBy("term").agg(count(lit(1)).as("_df"))
    val scored = dt.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("_idfm",
        round(log((col("_n") + 1).cast("double") / (col("_df") + 1)) * 1e6)
          .cast("long"))
      // per-row automatic widening: rows proven Long-safe take the
      // codegen'd integer branch (everything, in practice); the rest
      // evaluate the SAME exact rational in decimal(38,0). CASE branches
      // evaluate lazily, so the narrow product never overflows under ANSI
      .withColumn("tfidf_micro", expr(
        s"""CASE WHEN _idfm = 0 OR tf <= ${longBound}L div _idfm
           |  THEN (tf * _idfm) div _dl
           |  ELSE CAST((CAST(tf AS DECIMAL(38,0)) * _idfm) div _dl AS BIGINT)
           |END""".stripMargin))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf_micro").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("doc_id", "term", "tf", "tfidf_micro", "rk")
  }

  /** BM25 top-`k` retrieval for one keyword query (Robertson/Okapi,
    * k1 = 1.2, b = 0.75). Per matching (doc, term):
    * `idf_micro = round(ln(1 + (N − df + 0.5)/(df + 0.5)) * 1e6)` and the
    * saturation term with the constants cleared to integers — multiply
    * numerator and denominator by 10·S (S = Σ doc lengths):
    *
    *   contrib = (idf_micro · 22 · tf · S) div (10·tf·S + 3·S + 9·dl·N)
    *
    * an exact rational; the doc score is the integer sum over query
    * terms. Long-exactness bound: the numerator needs
    * idf_micro·22·tf·S < 2⁶³ — comfortable through ~10¹⁰ corpus tokens.
    * Past that the row AUTOMATICALLY widens: a per-row CASE proves the
    * Long budget from the row's own (tf, dl) and the corpus stats already
    * in the plan, and rows it cannot prove safe evaluate the same
    * rational in decimal(38,0) — exact through ~10³⁸, i.e. any corpus
    * (10¹³ tokens uses ~32 digits). No driver action, no API change, and
    * the narrow branch keeps its codegen'd Long arithmetic; a 100-TB
    * corpus wides silently instead of wrapping silently. `longBound` is
    * the TEST SEAM: the Long budget the guards prove against —
    * production always leaves it at `Long.MaxValue`; shrinking it forces
    * the wide branch at test scale, which is how the wide arithmetic is
    * differentially oracled (the rational is exact either way, so narrow
    * and wide must agree bit for bit at ANY bound).
    *
    * Output: the top `k` rows of (doc_id, score_micro) by
    * (score DESC, doc_id ASC) — a `TakeOrdered`, never a global sort. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      longBound: Long = Long.MaxValue): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: terms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    require(longBound >= 1L, s"longBound must be >= 1, got $longBound")
    // one compiled pass per row counts the K query terms and the doc
    // length together (graft.expressions.QueryTermCounts): the old shape
    // materialized the token array and exploded every corpus token just
    // to keep the handful matching the query set — the tf EXCHANGE was
    // already pruned, but the explode wasn't
    val qts = terms.distinct
    val base = queryTermBase(docs, idCol, textCol, qts)
    val stats = base.agg(sum(col("_dl")).cast("long").as("_s"),
      count(lit(1)).as("_n"))
    val qt = queryTermRows(base, qts)
    val df = qt.groupBy("term").agg(count(lit(1)).as("_df"))
    qt.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("_idfm", idfMicro)
      .withColumn("_contrib", contribExpr(longBound))
      .groupBy("doc_id").agg(sum(col("_contrib")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
      .limit(k)
  }

  /** (doc_id, _dl, _cnts) via the compiled per-row query-term counter —
    * `_dl` ≡ `size(filter(split(lower(t), " "), _ =!= ""))`, `_cnts(i)`
    * the tf of `terms(i)`. */
  private def queryTermBase(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame =
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        graft.functions.Cols.queryTermCounts(lower(col(textCol)), terms)
          .as("_qtc"))
      .select(col("doc_id"), col("_qtc.dl").as("_dl"),
        col("_qtc.counts").as("_cnts"))
      .filter(col("_dl") >= 1)

  /** (doc_id, _dl, term, tf) rows for present query terms — K array
    * elements per doc via posexplode, no corpus-token generator, no
    * exchange. Row set ≡ the old explode → prune → groupBy form. */
  private def queryTermRows(base: DataFrame, terms: Seq[String]): DataFrame =
    base.select(col("doc_id"), col("_dl"),
        posexplode(col("_cnts")).as(Seq("_i", "tf")))
      .filter(col("tf") > 0L)
      .select(col("doc_id"), col("_dl"),
        element_at(typedlit(terms), col("_i") + 1).as("term"), col("tf"))

  /** `round(ln(1 + (N − df + 0.5)/(df + 0.5)) * 1e6)` over bound `_n`/`_df`. */
  private def idfMicro =
    round(log(lit(1.0) + (col("_n") - col("_df") + lit(0.5)) /
      (col("_df") + lit(0.5))) * 1e6).cast("long")

  /** The per-(doc, term) BM25 contribution over bound `_idfm`/`tf`/`_s`/
    * `_dl`/`_n` columns — ONE definition shared by the single-query and
    * batch operators, so their arithmetic cannot drift.
    *
    * Narrow guard: each product/sum term proven under `longBound` from
    * the row's own values (floor-division chains — floor(floor(B/x)/y)
    * · y · x ≤ B, so a passing row cannot overflow); the three
    * denominator terms are each proven ≤ B/4, bounding their sum. The
    * `_idfm = 0` arm short-circuits the division guard (OR evaluates
    * left-first in codegen) AND is itself narrow-safe: a zero product.
    * CASE branches evaluate lazily, so the narrow products never
    * overflow under ANSI on rows routed wide. */
  private def contribExpr(longBound: Long) = {
    val b = longBound
    expr(
      s"""CASE WHEN _s <= ${b}L div 12
         |      AND tf <= ((${b}L div 4) div 10) div _s
         |      AND _dl <= ((${b}L div 4) div 9) div _n
         |      AND (_idfm = 0 OR tf <= (${b}L div (_idfm * 22)) div _s)
         |  THEN (_idfm * 22 * tf * _s)
         |       div (10 * tf * _s + 3 * _s + 9 * _dl * _n)
         |  ELSE CAST((CAST(_idfm AS DECIMAL(38,0)) * 22 * tf * _s)
         |       div (CAST(10 AS DECIMAL(38,0)) * tf * _s
         |            + CAST(3 AS DECIMAL(38,0)) * _s
         |            + CAST(9 AS DECIMAL(38,0)) * _dl * _n) AS BIGINT)
         |END""".stripMargin)
  }

  /** BM25 top-`k` PER QUERY for a whole batch of keyword queries in ONE
    * corpus pass — the selection-pipeline shape (score a web-scale pool
    * against hundreds of target topics), where calling [[bm25TopK]] per
    * query would re-scan the corpus per query. `queries` is a
    * (query id, array<string> terms) table, BROADCAST by contract
    * (query batches are human-authored — thousands of rows, not
    * corpus-scale).
    *
    * Exactly [[bm25TopK]]'s semantics per query, by construction:
    * `df`/`tf`/`idf`/`contrib` are query-independent and computed once
    * over the UNION of query terms (duplicate terms within one query
    * count once, same as the single-query `isin`); the one corpus
    * explode filters to that union before anything shuffles; per-query
    * scores regroup by (query, doc) and rank in a query-partitioned
    * window — no per-query scan, no per-query shuffle.
    * RelevanceSpec pins batch ≡ per-query calls.
    *
    * Output: (query_id, doc_id, score_micro) — per query, its top `k`
    * docs by (score DESC, doc_id ASC); queries matching nothing have no
    * rows. */
  def bm25TopKBatch(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, termsCol: String, k: Int,
      longBound: Long = Long.MaxValue): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(longBound >= 1L, s"longBound must be >= 1, got $longBound")
    val qterms = queries
      .select(col(qidCol).as("query_id"), explode(col(termsCol)).as("term"))
      .filter(col("query_id").isNotNull && col("term").isNotNull)
      .distinct()
    // the term UNION binds into the compiled per-row counter — query
    // batches are driver-scale by the operator's own broadcast contract
    // (require-bounded, the collectUniModel guard shape); sorted so the
    // bound plan is stable across input orderings
    val cap = 1 << 20
    val termRows = qterms.select("term").distinct().limit(cap + 1).collect()
    require(termRows.length <= cap,
      s"bm25TopKBatch: > $cap distinct query terms — not a broadcastable " +
        "query batch")
    val unionTerms = termRows.map(_.getString(0)).sorted.toSeq
    require(unionTerms.nonEmpty, "bm25TopKBatch: no query terms")
    val base = queryTermBase(docs, idCol, textCol, unionTerms)
    val stats = base.agg(sum(col("_dl")).cast("long").as("_s"),
      count(lit(1)).as("_n"))
    val qt = queryTermRows(base, unionTerms)
    val df = qt.groupBy("term").agg(count(lit(1)).as("_df"))
    val scored = qt.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("_idfm", idfMicro)
      .withColumn("_contrib", contribExpr(longBound))
      .join(broadcast(qterms), "term")
      .groupBy("query_id", "doc_id")
      .agg(sum(col("_contrib")).as("score_micro"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    scored.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .select("query_id", "doc_id", "score_micro")
  }
}
