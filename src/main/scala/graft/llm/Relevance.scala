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
    * Output: (doc_id, term, tf, tfidf_micro, rk), rk = 1..k per doc by
    * (score DESC, term ASC). Documents with no tokens have no rows. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        filter(split(lower(col(textCol)), " "), t => t =!= "").as("_toks"))
      .select(col("doc_id"), col("_toks"), size(col("_toks")).as("_dl"))
      .filter(col("_dl") >= 1)
    // single-row corpus stats broadcast into the plan — no driver action
    val n = base.agg(count(lit(1)).as("_n"))
    val dt = base.select(col("doc_id"), col("_dl"),
        explode(col("_toks")).as("term"))
      .groupBy("doc_id", "_dl", "term").agg(count(lit(1)).as("tf"))
    val df = dt.groupBy("term").agg(count(lit(1)).as("_df"))
    val scored = dt.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("_idfm",
        round(log((col("_n") + 1).cast("double") / (col("_df") + 1)) * 1e6)
          .cast("long"))
      .withColumn("tfidf_micro", expr("(tf * _idfm) div _dl"))
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
    * an exact rational evaluated in Long arithmetic; the doc score is the
    * integer sum over query terms. Long-exactness bound: the numerator
    * needs idf_micro·22·tf·S < 2⁶³ — comfortable through ~10¹⁰ corpus
    * tokens; past that, widen the two products to decimal(38,0) (the
    * formula is exact rational either way; this differential-testable
    * integer form is the contract the oracle replays).
    *
    * Output: the top `k` rows of (doc_id, score_micro) by
    * (score DESC, doc_id ASC) — a `TakeOrdered`, never a global sort. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: terms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val base = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        filter(split(lower(col(textCol)), " "), t => t =!= "").as("_toks"))
      .select(col("doc_id"), col("_toks"), size(col("_toks")).as("_dl"))
      .filter(col("_dl") >= 1)
    val stats = base.agg(sum(col("_dl")).cast("long").as("_s"),
      count(lit(1)).as("_n"))
    // the explode filters to the broadcast query-term set FIRST — only
    // query-term occurrences survive the map side
    val qt = base.select(col("doc_id"), col("_dl"),
        explode(col("_toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "_dl", "term").agg(count(lit(1)).as("tf"))
    val df = qt.groupBy("term").agg(count(lit(1)).as("_df"))
    qt.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("_idfm",
        round(log(lit(1.0) + (col("_n") - col("_df") + lit(0.5)) /
          (col("_df") + lit(0.5))) * 1e6).cast("long"))
      .withColumn("_contrib", expr(
        "(_idfm * 22 * tf * _s) div (10 * tf * _s + 3 * _s + 9 * _dl * _n)"))
      .groupBy("doc_id").agg(sum(col("_contrib")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
      .limit(k)
  }
}
