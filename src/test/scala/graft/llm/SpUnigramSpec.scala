package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** SentencePiece-unigram trainer: hand-computed Viterbi-EM goldens and
  * corpus-level invariants. */
class SpUnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("kernel: hand-computed seed, two EM iterations, final prune") {
    // words: aaab x3, ab x2; maxPieceLen 3.
    // seed counts: a:11 b:5 aa:6 ab:5 aaa:3 aab:3 (T=33).
    // iter1 Viterbi: 'aaab' -> [a, aab] (score -3496509 beats aa|ab
    // -3591819 and aaa|b -4284966); 'ab' -> [ab].
    // M-step: a:3 aab:3 ab:2, b floored to 1. iter2: fixed point.
    // final vocab=3 keeps (a,3) (aab,3) (ab,2); single b floors in.
    val words = Array(("aaab", 3L), ("ab", 2L))
    val got = SpUnigram.kernel(words, vocab = 3, iters = 2,
      maxPieceLen = 3, seedVocab = 100)
    assert(got.toSeq === Seq(("a", 3L), ("aab", 3L), ("ab", 2L), ("b", 1L)))
    // iters = 0: the pruned SEED is the model
    val seed = SpUnigram.kernel(words, vocab = 3, iters = 0,
      maxPieceLen = 3, seedVocab = 100)
    assert(seed.toSeq === Seq(("a", 11L), ("aa", 6L), ("ab", 5L),
      ("b", 5L)))
  }

  test("kernel: determinism and character coverage on the corpus") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    def run() = SpUnigram.train(docs, "doc_id", "text", vocab = 120,
      iters = 2, maxPieceLen = 3, seedVocab = 200, maxWordLen = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val a = run()
    assert(a === run(), "trainer is bit-deterministic")
    assert(a.nonEmpty && a.forall(_._2 >= 1L))
    // every single character of every (capped) word is in the vocab —
    // the coverage guarantee that keeps all words segmentable
    val chars = SpUnigram.wordFreqs(docs, "doc_id", "text")
      .filter(length(col("w")) <= 8)
      .select(explode(split(col("w"), "")).as("c"))
      .distinct().collect().map(_.getString(0)).toSet
    val vocabSet = a.map(_._1).toSet
    assert(chars.subsetOf(vocabSet), s"missing chars: ${chars -- vocabSet}")
  }
}
