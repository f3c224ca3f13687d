package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The quality-classifier tier: hashed-ngram features, the driver-kernel
  * logistic trainer, and exact integer scoring. */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The scorer's own hash: md5-low-32(ngram) mod dim — recomputed here
    * independently so the expected feature ids don't come from the code
    * under test. */
  private def featId(ngram: String, dim: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(ngram.getBytes("UTF-8"))
    val h = java.lang.Integer.toUnsignedLong(
      java.nio.ByteBuffer.wrap(d).getInt)
    h % dim
  }

  test("hashedTextFeatures: unigrams + bigrams of the lowercased split, counted per doc") {
    import spark.implicits._
    val docs = Seq((1L, "The cat the Cat"), (2L, "")).toDF("doc_id", "text")
    val dim = 1 << 16
    val got = Quality.hashedTextFeatures(docs, "doc_id", "text", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // lowercased: unigrams {the×2, cat×2}, bigrams {the cat×2, cat the×1}
    val expected = Map(
      (1L, featId("the", dim)) -> 2L,
      (1L, featId("cat", dim)) -> 2L,
      (1L, featId("the cat", dim)) -> 2L,
      (1L, featId("cat the", dim)) -> 1L,
      (2L, featId("", dim)) -> 1L) // phantom empty token: empty text features
    assert(got === expected)
  }

  test("scoreTextClassifier: exact integer logit, unknown features contribute 0, intercept-only docs score") {
    import spark.implicits._
    val dim = 1 << 16
    val docs = Seq((1L, "good good"), (2L, "zzz")).toDF("doc_id", "text")
    val weights = Seq(
      (-1L, 7000L),
      (featId("good", dim), 250L),
      (featId("good good", dim), -40L)).toDF("feature", "w_micro")
    val got = Quality.scoreTextClassifier(docs, "doc_id", "text", weights, dim)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: 7000 + 2·250 + 1·(−40) = 7460 over 2 distinct features
    assert(got(1L) === ((2L, 7460L)))
    // doc 2: one unigram feature, no weight → intercept only
    assert(got(2L) === ((1L, 7000L)))
  }

  test("trainTextClassifier: separates a planted quality/spam corpus, deterministic, sample-capped") {
    import spark.implicits._
    // 40 labeled docs: quality docs share marker tokens, spam docs share
    // different ones, plus per-doc noise tokens so the trainer can't
    // memorize a single feature
    val labeled = (0L until 40L).map { i =>
      val y = (i % 2).toInt
      val marker = if (y == 1) "thoughtful analysis prose" else "click spam win"
      (i, s"$marker filler${i / 2} common word", y)
    }.toDF("doc_id", "text", "label")
    val dim = 1 << 14
    def train() = Quality.trainTextClassifier(labeled, "doc_id", "text",
        "label", dim, iters = 200, maxTrainDocs = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w1 = train()
    assert(w1 === train(), "driver kernel is bit-deterministic")
    val wdf = w1.toSeq.toDF("feature", "w_micro")
    val scored = Quality.scoreTextClassifier(labeled, "doc_id", "text",
        wdf, dim)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val qMin = (0L until 40L).filter(_ % 2 == 1).map(scored).min
    val sMax = (0L until 40L).filter(_ % 2 == 0).map(scored).max
    assert(qMin > 0 && sMax < 0,
      s"trained boundary separates at logit 0: qualityMin=$qMin spamMax=$sMax")
    // the cap refuses a corpus-scale training set loudly
    val ex = intercept[IllegalArgumentException] {
      Quality.trainTextClassifier(labeled, "doc_id", "text", "label",
        dim, maxTrainDocs = 10)
    }
    assert(ex.getMessage.contains("maxTrainDocs"))
  }

  test("typed zero-shuffle scorer ≡ the declarative hashedTextFeatures composition, bit for bit") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, graft.TestSpark.sfDir)
    val dim = 1 << 16
    val weights = spark.range(dim)
      .select(col("id").as("feature"), (col("id") % 2001 - 1000).as("w_micro"))
      .unionByName(Seq((-1L, 12345L)).toDF("feature", "w_micro"))
    val typed = Quality.scoreTextClassifier(docs, "doc_id", "text",
        weights, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val declarative = Quality.hashedTextFeatures(docs, "doc_id", "text", dim)
      .join(broadcast(weights.filter(col("feature") >= 0L)
        .select(col("feature"), col("w_micro").as("_w"))),
        Seq("feature"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        (coalesce(sum(col("cnt") * col("_w")), lit(0L)) + lit(12345L))
          .as("logit_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(typed === declarative)
    assert(typed.nonEmpty)
  }

  test("trainTextClassifierMulti + langIdTrained: matches marker langid " +
      "on the marker fixture, beats it on mixed vocabulary") {
    import spark.implicits._
    val markers = Seq(
      "en" -> Seq("the", "a", "of", "and"),
      "de" -> Seq("der", "die", "das", "und"),
      "es" -> Seq("el", "la", "los", "y"))
    val dim = 1 << 14
    // training corpus: marker-bearing docs per language plus NON-marker
    // vocabulary the marker voter is blind to
    val enV = Seq("house", "water", "friend", "morning")
    val deV = Seq("haus", "wasser", "freund", "morgen")
    val esV = Seq("casa", "agua", "amigo", "manana")
    def doc(i: Long, lang: String, mk: Seq[String], v: Seq[String]) =
      (i, s"${mk(i.toInt % 4)} ${v(i.toInt % 4)} ${v((i.toInt + 1) % 4)} " +
        s"${mk((i.toInt + 2) % 4)}", lang)
    val labeled = ((0L until 30L).map(i => doc(i, "en", markers(0)._2, enV))
      ++ (30L until 60L).map(i => doc(i, "de", markers(1)._2, deV))
      ++ (60L until 90L).map(i => doc(i, "es", markers(2)._2, esV)))
      .toDF("doc_id", "text", "lang")
    val w = Quality.trainTextClassifierMulti(labeled, "doc_id", "text",
      "lang", dim, iters = 200, maxTrainDocs = 1000)
    // determinism
    val w2 = Quality.trainTextClassifierMulti(labeled, "doc_id", "text",
      "lang", dim, iters = 200, maxTrainDocs = 1000)
    assert(w.collect().toSet === w2.collect().toSet,
      "multi-class driver kernel is bit-deterministic")
    // marker fixture: docs of pure marker text — both identify them
    val markerFix = Seq(
      (1L, "the of and a"), (2L, "der und das die"), (3L, "el la y los"))
      .toDF("doc_id", "text")
    val trained = Quality.langIdTrained(markerFix, "doc_id", "text", w, dim)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val voted = markerFix.withColumn("lang",
        TextStats.langId(col("text"), markers))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(trained === voted && trained ===
      Map(1L -> "en", 2L -> "de", 3L -> "es"))
    // mixed-vocabulary fixture: ZERO marker tokens — the voter ties at 0
    // votes everywhere (argmax falls to its first entry), the trained
    // model separates on the learned vocabulary
    val mixedFix = Seq(
      (11L, "water friend morning house"), (12L, "wasser freund morgen haus"),
      (13L, "agua amigo manana casa")).toDF("doc_id", "text")
    val trainedMixed = Quality.langIdTrained(mixedFix, "doc_id", "text",
        w, dim)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(trainedMixed === Map(11L -> "en", 12L -> "de", 13L -> "es"),
      s"trained langid must separate non-marker vocabulary: $trainedMixed")
    val votedMixed = mixedFix.withColumn("lang",
        TextStats.langId(col("text"), markers))
      .collect().map(_.getString(2)).toSet
    assert(votedMixed === Set("en"),
      "the marker voter is blind here (0 votes → first entry) — the " +
        "fixture demonstrating why the trained tier exists")
  }

  test("trained model is a frozen table: scoring drifted vocabulary falls back to the intercept") {
    import spark.implicits._
    val labeled = (0L until 20L).map { i =>
      val y = (i % 2).toInt
      (i, if (y == 1) "alpha beta" else "gamma delta", y)
    }.toDF("doc_id", "text", "label")
    val dim = 1 << 14
    val w = Quality.trainTextClassifier(labeled, "doc_id", "text", "label",
      dim, iters = 50)
    val b = w.filter(col("feature") === -1L).head.getLong(1)
    val drifted = Seq((99L, "entirely novel tokens")).toDF("doc_id", "text")
    val got = Quality.scoreTextClassifier(drifted, "doc_id", "text", w, dim)
      .head
    assert(got.getLong(2) === b, "no carried feature → intercept exactly")
  }

  /** HALF_UP (away from zero) — the trainer's cross-engine rounding,
    * recomputed here independently. */
  private def halfUp(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  test("trainTextClassifierGd: bit-equal to an independent sequential " +
      "integer-GD replay, deterministic, separates the planted corpus") {
    import spark.implicits._
    val labeled = (0L until 40L).map { i =>
      val y = (i % 2).toInt
      val marker = if (y == 1) "thoughtful analysis prose" else "click spam win"
      (i, s"$marker filler${i / 2} common word", y)
    }.toDF("doc_id", "text", "label")
    val dim = 1 << 14
    val iters = 40
    val lr = 0.5
    val l2 = 1e-4
    def train() = Quality.trainTextClassifierGd(labeled, "doc_id", "text",
        "label", dim, iters = iters, lr = lr, l2 = l2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = train()
    assert(got === train(), "distributed GD is bit-deterministic")
    // independent replay: features via the DECLARATIVE hashedTextFeatures
    // path (itself spec-pinned ≡ the byte featurizer), then the exact
    // integer-fixed-point recursion re-implemented sequentially here
    val featRows = Quality.hashedTextFeatures(labeled, "doc_id", "text", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ys = (0L until 40L).map(i => i -> (i % 2).toInt).toMap
    val byDoc = featRows.groupBy(_._1).toArray.sortBy(_._1)
    val n = byDoc.length
    val w = new Array[Long](dim)
    var b = 0L
    for (_ <- 0 until iters) {
      val grad = new Array[Long](dim)
      var gb = 0L
      byDoc.foreach { case (doc, rows) =>
        var z = b
        rows.foreach { case (_, f, c) => z += c * w(f.toInt) }
        val p = 1.0 / (1.0 + math.exp(-(z.toDouble / 1e6)))
        val gm = halfUp((p - ys(doc)) * 1e6)
        gb += gm
        rows.foreach { case (_, f, c) => grad(f.toInt) += gm * c }
      }
      for (f <- 0 until dim)
        if (grad(f) != 0L || w(f) != 0L)
          w(f) -= halfUp(lr * (grad(f).toDouble / n + l2 * w(f)))
      b -= halfUp(lr * (gb.toDouble / n))
    }
    val expected = ((-1L, b) +:
      (0 until dim).collect { case f if w(f) != 0L => (f.toLong, w(f)) })
      .toMap
    assert(got === expected,
      "distributed ≡ sequential on the identical integer recursion")
    // the trained model separates the planted boundary at logit 0
    val scored = Quality.scoreTextClassifier(labeled, "doc_id", "text",
        got.toSeq.toDF("feature", "w_micro"), dim)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val qMin = (0L until 40L).filter(_ % 2 == 1).map(scored).min
    val sMax = (0L until 40L).filter(_ % 2 == 0).map(scored).max
    assert(qMin > 0 && sMax < 0,
      s"GD-trained boundary separates: qualityMin=$qMin spamMax=$sMax")
  }

  test("trainTextClassifierMultiGd: bit-equal to an independent " +
      "sequential softmax replay, deterministic, langid separates") {
    import spark.implicits._
    val enV = Seq("house", "water", "friend", "morning")
    val deV = Seq("haus", "wasser", "freund", "morgen")
    val esV = Seq("casa", "agua", "amigo", "manana")
    def doc(i: Long, lang: String, v: Seq[String]) =
      (i, s"${v(i.toInt % 4)} ${v((i.toInt + 1) % 4)} mid${i % 3} " +
        s"${v((i.toInt + 2) % 4)}", lang)
    val labeled = ((0L until 30L).map(i => doc(i, "en", enV))
      ++ (30L until 60L).map(i => doc(i, "de", deV))
      ++ (60L until 90L).map(i => doc(i, "es", esV)))
      .toDF("doc_id", "text", "lang")
    val dim = 1 << 14
    val iters = 30
    val lr = 0.5
    val l2 = 1e-4
    def train() = Quality.trainTextClassifierMultiGd(labeled, "doc_id",
        "text", "lang", dim, iters = iters, lr = lr, l2 = l2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val got = train()
    assert(got === train(), "distributed multi-class GD is bit-deterministic")
    // independent sequential replay of the integer softmax recursion
    val featRows = Quality.hashedTextFeatures(labeled, "doc_id", "text", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val classes = Seq("de", "en", "es") // sorted
    val yOf = (0L until 90L).map(i =>
      i -> classes.indexOf(if (i < 30) "en" else if (i < 60) "de" else "es"))
      .toMap
    val byDoc = featRows.groupBy(_._1).toArray.sortBy(_._1)
    val n = byDoc.length
    val k = classes.length
    val w = Array.ofDim[Long](k, dim)
    val b = new Array[Long](k)
    for (_ <- 0 until iters) {
      val grad = Array.ofDim[Long](k, dim)
      val gb = new Array[Long](k)
      byDoc.foreach { case (docId, rows) =>
        val z = (0 until k).map { c =>
          var zz = b(c)
          rows.foreach { case (_, f, cnt) => zz += cnt * w(c)(f.toInt) }
          zz
        }
        val mx = z.max
        val e = (0 until k).map(c => math.exp((z(c) - mx).toDouble / 1e6))
        val denom = e.sum // ascending class order, the canonical fold
        for (c <- 0 until k) {
          val gm = halfUp(
            (e(c) / denom - (if (yOf(docId) == c) 1.0 else 0.0)) * 1e6)
          gb(c) += gm
          rows.foreach { case (_, f, cnt) => grad(c)(f.toInt) += gm * cnt }
        }
      }
      for (c <- 0 until k) {
        for (f <- 0 until dim)
          if (grad(c)(f) != 0L || w(c)(f) != 0L)
            w(c)(f) -= halfUp(lr * (grad(c)(f).toDouble / n + l2 * w(c)(f)))
        b(c) -= halfUp(lr * (gb(c).toDouble / n))
      }
    }
    val expected = (for (c <- 0 until k) yield {
      ((classes(c), -1L) -> b(c)) +: (0 until dim).collect {
        case f if w(c)(f) != 0L => (classes(c), f.toLong) -> w(c)(f)
      }
    }).flatten.toMap
    assert(got === expected,
      "distributed ≡ sequential on the identical integer softmax recursion")
    // the trained model separates the three languages via langIdTrained
    val wdf = got.toSeq.map { case ((l, f), wm) => (l, f, wm) }
      .toDF("label", "feature", "w_micro")
    val fix = Seq((101L, "water friend morning house"),
      (102L, "wasser freund morgen haus"),
      (103L, "agua amigo manana casa")).toDF("doc_id", "text")
    val langs = Quality.langIdTrained(fix, "doc_id", "text", wdf, dim)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs === Map(101L -> "en", 102L -> "de", 103L -> "es"),
      s"GD-trained langid separates: $langs")
  }

  test("trainTextClassifierMultiGd: refuses duplicates and single-class input") {
    import spark.implicits._
    val ok = Seq((1L, "a b", "en"), (2L, "c d", "de"))
      .toDF("doc_id", "text", "lang")
    val dup = ok.unionByName(
      Seq((1L, "a b", "en")).toDF("doc_id", "text", "lang"))
    val exDup = intercept[IllegalArgumentException] {
      Quality.trainTextClassifierMultiGd(dup, "doc_id", "text", "lang",
        dim = 1 << 10, iters = 1)
    }
    assert(exDup.getMessage.contains("duplicate"))
    val one = Seq((1L, "a b", "en"), (2L, "c d", "en"))
      .toDF("doc_id", "text", "lang")
    val exOne = intercept[IllegalArgumentException] {
      Quality.trainTextClassifierMultiGd(one, "doc_id", "text", "lang",
        dim = 1 << 10, iters = 1)
    }
    assert(exOne.getMessage.contains(">= 2 classes"))
  }

  test("trainTextClassifierGd: refuses duplicate ids and non-0/1 labels") {
    import spark.implicits._
    val ok = Seq((1L, "a b", 0), (2L, "c d", 1)).toDF("doc_id", "text", "label")
    val dup = ok.unionByName(
      Seq((1L, "a b", 0)).toDF("doc_id", "text", "label"))
    val exDup = intercept[IllegalArgumentException] {
      Quality.trainTextClassifierGd(dup, "doc_id", "text", "label",
        dim = 1 << 10, iters = 1)
    }
    assert(exDup.getMessage.contains("duplicate"))
    val bad = Seq((1L, "a b", 0), (2L, "c d", 2)).toDF("doc_id", "text", "label")
    val exLab = intercept[IllegalArgumentException] {
      Quality.trainTextClassifierGd(bad, "doc_id", "text", "label",
        dim = 1 << 10, iters = 1)
    }
    assert(exLab.getMessage.contains("labels must be 0/1"))
    val exEmpty = intercept[IllegalArgumentException] {
      Quality.trainTextClassifierGd(
        ok.filter(col("doc_id") < 0), "doc_id", "text", "label",
        dim = 1 << 10, iters = 1)
    }
    assert(exEmpty.getMessage.contains("no labeled documents"))
  }
}
