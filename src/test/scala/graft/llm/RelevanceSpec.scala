package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** Term-relevance tier: hand-computed TF-IDF and BM25 goldens (micro-unit
  * integer scores), tie-breaks, and corpus-level invariants. */
class RelevanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = Tables.documents(spark, TestSpark.sfDir)
  import spark.implicits._

  // shared fixture: N = 3 docs, df(a)=1, df(b)=2, df(c)=2
  private def fix = Seq(1L -> "a b a", 2L -> "b c", 3L -> "c c c c")
    .toDF("doc_id", "text")

  test("tfidfTopTerms: hand-computed micro scores with term-asc tie-break") {
    // idf_micro: a → round(ln(4/2)·1e6) = 693147; b,c → round(ln(4/3)·1e6)
    // = 287682. doc1: a = (2·693147) div 3 = 462098, b = 287682 div 3 =
    // 95894; doc2: b = c = 287682 div 2 = 143841 (tie → b first);
    // doc3: c = (4·287682) div 4 = 287682
    val out = Relevance.tfidfTopTerms(fix, "doc_id", "text", 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(t => (t._1, t._5))
    assert(out === Seq(
      (1L, "a", 2L, 462098L, 1L), (1L, "b", 1L, 95894L, 2L),
      (2L, "b", 1L, 143841L, 1L), (2L, "c", 1L, 143841L, 2L),
      (3L, "c", 4L, 287682L, 1L)))
  }

  test("tfidfTopTerms: corpus — exactly k rows per doc, ranks contiguous") {
    val out = Relevance.tfidfTopTerms(docs, "doc_id", "text", 3)
    val perDoc = out.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max(col("rk")).as("mx"), min(col("rk")).as("mn"))
    // sf docs all have ≥ 3 distinct terms → exactly 3 rows, ranks 1..3
    assert(perDoc.filter(col("n") =!= 3 || col("mx") =!= 3 ||
      col("mn") =!= 1).count() === 0L)
    assert(out.filter(col("tfidf_micro") < 0).count() === 0L)
  }

  test("bm25TopK: hand-computed integer contributions and ranking") {
    // S = 9, N = 3; df(b) = df(c) = 2 → idf_micro = round(ln(1.6)·1e6) =
    // 470004. doc1 (b, tf=1, dl=3): den = 90+27+81 = 198 = 22·S → contrib
    // = 470004; doc2 (b and c, tf=1, dl=2): den = 90+27+54 = 171, contrib
    // = (470004·198) div 171 = 544215 each → 1088430; doc3 (c, tf=4,
    // dl=4): (470004·792) div 495 = 752006
    val out = Relevance.bm25TopK(fix, "doc_id", "text", Seq("b", "c"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((1L, 470004L), (2L, 1088430L), (3L, 752006L)))
    // top-1 is the highest score
    val top1 = Relevance.bm25TopK(fix, "doc_id", "text", Seq("b", "c"), 1)
      .collect()
    assert(top1.length === 1 && top1(0).getLong(0) === 2L)
  }

  test("bm25TopK: docs without any query term never appear; k bounds the result") {
    val out = Relevance.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "merge", "window"), 25)
    assert(out.count() === 25L)
    assert(out.filter(col("score_micro") <= 0).count() === 0L)
    val noTerm = Relevance.bm25TopK(
      Seq(1L -> "x y", 2L -> "spark z").toDF("doc_id", "text"),
      "doc_id", "text", Seq("spark"), 10).collect()
    assert(noTerm.map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("tfidf and bm25 are partition-invariant") {
    val a = Relevance.tfidfTopTerms(docs, "doc_id", "text", 3)
      .collect().map(_.toSeq).toSet
    val b = Relevance.tfidfTopTerms(docs.repartition(7), "doc_id", "text", 3)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    val c = Relevance.bm25TopK(docs, "doc_id", "text", Seq("spark"), 10)
      .collect().map(_.toSeq).toSet
    val e = Relevance.bm25TopK(docs.repartition(7), "doc_id", "text",
      Seq("spark"), 10).collect().map(_.toSeq).toSet
    assert(c === e)
  }

  test("validation: empty query terms and k < 1 are refused") {
    intercept[IllegalArgumentException] {
      Relevance.bm25TopK(fix, "doc_id", "text", Seq.empty, 5)
    }
    intercept[IllegalArgumentException] {
      Relevance.tfidfTopTerms(fix, "doc_id", "text", 0)
    }
  }

  test("bm25TopKBatch ≡ per-query bm25TopK calls for every query") {
    import spark.implicits._
    val queries = Seq(
      1L -> Seq("spark", "merge", "window"),
      2L -> Seq("data", "shuffle"),
      3L -> Seq("window", "window")) // in-query duplicate counts once
      .toDF("query_id", "terms")
    val batch = Relevance.bm25TopKBatch(docs, "doc_id", "text",
      queries, "query_id", "terms", 10)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet).toMap
    Seq(1L -> Seq("spark", "merge", "window"), 2L -> Seq("data", "shuffle"),
      3L -> Seq("window")).foreach { case (qid, terms) =>
      val single = Relevance.bm25TopK(docs, "doc_id", "text", terms, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.getOrElse(qid, Set.empty) === single,
        s"query $qid diverged from the single-query operator")
    }
  }

  test("wide decimal arithmetic ≡ narrow Long arithmetic at every bound") {
    // the score is an exact rational either way, so forcing every row
    // down the decimal branch (longBound = 1) — and a mixed regime
    // (longBound splitting rows between branches) — must reproduce the
    // default narrow results bit for bit, on the fixture and the corpus
    Seq(1L, 1000000L).foreach { bound =>
      val a = Relevance.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "merge"), 10).collect().map(_.toSeq).toSeq
      val w = Relevance.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "merge"), 10, longBound = bound)
        .collect().map(_.toSeq).toSeq
      assert(a === w, s"bm25 diverged at longBound=$bound")
      val t = Relevance.tfidfTopTerms(docs, "doc_id", "text", 3)
        .collect().map(_.toSeq).toSet
      val tw = Relevance.tfidfTopTerms(docs, "doc_id", "text", 3,
        longBound = bound).collect().map(_.toSeq).toSet
      assert(t === tw, s"tfidf diverged at longBound=$bound")
    }
  }
}
