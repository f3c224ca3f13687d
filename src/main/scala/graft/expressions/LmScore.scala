package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast n-gram LM for zero-shuffle per-document scoring — the model
  * side of [[NgramNll6]]. Every per-token log-probability the backoff
  * chain can ever produce is PRE-FIXED-POINTED to micro-nats on the
  * driver (`round(ln(p)·10⁶)` with the exact algebra of Spark's `round`
  * on doubles: java `BigDecimal.valueOf ∘ setScale(0, HALF_UP)`), so the
  * executor-side kernel is pure integer lookups + an exact integer sum —
  * bit-identical to the old explode → broadcast-join → fixed-point →
  * per-doc-agg plan, which paid a pair explode, two join operators and a
  * doc_id exchange for what is per-row math against two vocab-sized maps
  * (`Quality.ngramPerplexity` measured 5.6× its oracle at sf1 on exactly
  * that; the same anti-pattern `Quality.scoreTextClassifier` eliminated).
  *
  * Tokens intern to dense ids (< 2²¹, require-guarded — model tables are
  * vocab-capped); bigrams and trigrams key open Long maps by 21-bit id
  * packing, collision-free by construction. `level` selects the chain:
  *
  *   - 1 (unigram): every token scores the Laplace-smoothed unigram —
  *     [[graft.llm.Quality.lmPerplexity]]'s formula;
  *   - 2 (bigram, stupid backoff): token 1 unigram; token i ≥ 2 the raw
  *     bigram relative frequency when (t₋₁, t) is in the table, else
  *     `backoff` × smoothed unigram;
  *   - 3 (trigram): tokens 1–2 as level 2; token i ≥ 3 the trigram
  *     relative frequency, else `backoff` × bigram, else `backoff²` ×
  *     smoothed unigram (Brants et al. 2007's chain, one more level).
  *
  * Each chain arm's log is computed and rounded SEPARATELY (the rounding
  * happens after the α product, exactly as the declarative form and the
  * SQL oracles compute it), so no arm is derivable from another by
  * integer addition — hence the three per-id arrays. */
final class LmModel(
    val level: Int,
    val ids: java.util.HashMap[UTF8String, Integer],
    val lpUni6: Array[Long],
    val lpBack6: Array[Long],
    val lpBack26: Array[Long],
    val oovUni6: Long,
    val oovBack6: Long,
    val oovBack26: Long,
    val bi: scala.collection.mutable.LongMap[Long],
    val biBack: scala.collection.mutable.LongMap[Long],
    val tri: scala.collection.mutable.LongMap[Long],
    val lam6: Array[Long]) extends Serializable {

  /** struct(n_tokens, s6): token count and the exact micro-nat integer
    * sum of per-token log-probs under the backoff chain, over the
    * `' '`-split tokens of an already-LOWERCASED text (byte-level split,
    * trailing empties kept — ≡ `split(lower(text), " ")`, every token a
    * zero-copy view probed against the interned-id map; going through
    * Spark's split would re-materialize each token as a java String just
    * to hash it). */
  def nll6(text: UTF8String): InternalRow = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nb = text.numBytes()
    var n = 0L
    var s6 = 0L
    var prev = -1
    var prev2 = -1
    var start = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || org.apache.spark.unsafe.Platform.getByte(base, off + i)
          == ' '.toByte) {
        val t = UTF8String.fromAddress(base, off + start, i - start)
        val idObj = ids.get(t)
        val id = if (idObj == null) -1 else idObj.intValue()
        var lp = LmModel.Miss
        if (n == 0L || level == 1) {
          lp = if (id >= 0) lpUni6(id) else oovUni6
        } else if (level == 2 || n == 1L) {
          if (prev >= 0 && id >= 0)
            lp = bi.getOrElse((prev.toLong << 21) | id, LmModel.Miss)
          if (lp == LmModel.Miss) {
            lp = if (id >= 0) lpBack6(id) else oovBack6
            // Kneser–Ney's per-context interpolation weight: unseen
            // (prev, cur) scores λ(prev) · Pcont(cur) — two separately
            // rounded micro-nat logs summed (the defined contract both
            // engines replay). A context with no table pairs — or an
            // OOV context — carries λ = 1 (lam6 = 0 / prev < 0).
            if (lam6 != null && prev >= 0) lp += lam6(prev)
          }
        } else {
          if (prev2 >= 0 && prev >= 0 && id >= 0)
            lp = tri.getOrElse(
              (prev2.toLong << 42) | (prev.toLong << 21) | id, LmModel.Miss)
          if (lp == LmModel.Miss && prev >= 0 && id >= 0)
            lp = biBack.getOrElse((prev.toLong << 21) | id, LmModel.Miss)
          if (lp == LmModel.Miss)
            lp = if (id >= 0) lpBack26(id) else oovBack26
        }
        s6 += lp
        prev2 = prev
        prev = id
        n += 1L
        start = i + 1
      }
      i += 1
    }
    InternalRow(n, s6)
  }
}

object LmModel {
  /** Sentinel for "not in the table" — real log-probs are small negative
    * micro-nat integers, nowhere near Long.MinValue. */
  private val Miss = Long.MinValue

  private val MaxIds = (1 << 21) - 1

  /** Spark `round(x) .cast("long")` on doubles, exactly:
    * BigDecimal.valueOf ∘ setScale(0, HALF_UP) ∘ toDouble ∘ toLong (the
    * [[RepetitionCounts]] fixed-point discipline at scale 0). */
  private def fix6(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Build a model from collected vocab-capped tables (null tokens —
    * which a `unigramLm` table can never carry, and which the old join
    * form ignored by null-never-equal — are skipped).
    *
    *   - `uni`: (token, cnt) rows; N = Σ cnt, V = rows — the Laplace
    *     denominator is N + V + 1, `Quality.lmPerplexity`'s contract.
    *   - `bi`: (w1, w2, cnt, ctx_cnt) rows — the relative-frequency
    *     denominator is the row's OWN ctx_cnt column (`bigramLm` carries
    *     it, so a persisted model is self-contained).
    *   - `tri`: (w1, w2, w3, cnt, ctx_cnt) rows, level-3 only. */
  def build(uni: Array[(String, Long)], bi: Array[(String, String, Long, Long)],
      tri: Array[(String, String, String, Long, Long)], backoff: Double,
      level: Int): LmModel = {
    require(level >= 1 && level <= 3, s"LmModel: level must be 1..3, got $level")
    val ids = new java.util.HashMap[UTF8String, Integer]()
    def id(w: String): Int = {
      val u = UTF8String.fromString(w)
      var v = ids.get(u)
      if (v == null) {
        require(ids.size() <= MaxIds,
          s"LmModel: > $MaxIds distinct model tokens — not a vocab-capped " +
            "LM table")
        v = Integer.valueOf(ids.size())
        ids.put(u, v)
      }
      v.intValue()
    }
    // duplicate unigram tokens would have fanned the old join out —
    // refuse a malformed model rather than silently last-win
    val uniClean = uni.filter(_._1 != null)
    require(uniClean.map(_._1).distinct.length == uniClean.length,
      "LmModel: duplicate tokens in the unigram table — pass a " +
        "unigramLm-shaped model (distinct tokens)")
    var nSum = 0L
    uniClean.foreach { case (_, c) => nSum += c }
    val nD = nSum.toDouble
    val vD = uniClean.length.toDouble
    val denom = nD + vD + 1.0
    // pre-intern every token any map can reference
    uniClean.foreach { case (w, _) => id(w) }
    bi.foreach { case (a, b, _, _) => if (a != null && b != null) { id(a); id(b) } }
    tri.foreach { case (a, b, c, _, _) =>
      if (a != null && b != null && c != null) { id(a); id(b); id(c) } }
    val k = ids.size()
    val lpUni6 = new Array[Long](k)
    val lpBack6 = new Array[Long](k)
    val lpBack26 = new Array[Long](k)
    val oovUni6 = fix6(math.log(1.0 / denom) * 1e6)
    val oovBack6 = fix6(math.log(backoff * (1.0 / denom)) * 1e6)
    val oovBack26 = fix6(math.log(backoff * backoff * (1.0 / denom)) * 1e6)
    java.util.Arrays.fill(lpUni6, oovUni6)
    java.util.Arrays.fill(lpBack6, oovBack6)
    java.util.Arrays.fill(lpBack26, oovBack26)
    uniClean.foreach { case (w, c) =>
      val i = id(w)
      val p = (c + 1.0) / denom
      lpUni6(i) = fix6(math.log(p) * 1e6)
      lpBack6(i) = fix6(math.log(backoff * p) * 1e6)
      lpBack26(i) = fix6(math.log(backoff * backoff * p) * 1e6)
    }
    val biMap = new scala.collection.mutable.LongMap[Long](math.max(8, bi.length * 2))
    val biBackMap = new scala.collection.mutable.LongMap[Long](math.max(8, bi.length * 2))
    bi.foreach { case (a, b, c, ctx) =>
      if (a != null && b != null) {
        val key = (id(a).toLong << 21) | id(b)
        require(!biMap.contains(key),
          s"LmModel: duplicate bigram ($a, $b) — pass a bigramLm-shaped model")
        val rel = c.toDouble / ctx.toDouble
        biMap(key) = fix6(math.log(rel) * 1e6)
        biBackMap(key) = fix6(math.log(backoff * rel) * 1e6)
      }
    }
    val triMap = new scala.collection.mutable.LongMap[Long](math.max(8, tri.length * 2))
    tri.foreach { case (a, b, c, cnt, ctx) =>
      if (a != null && b != null && c != null) {
        val key = (id(a).toLong << 42) | (id(b).toLong << 21) | id(c)
        require(!triMap.contains(key),
          s"LmModel: duplicate trigram ($a, $b, $c) — pass a " +
            "trigramLm-shaped model")
        triMap(key) = fix6(math.log(cnt.toDouble / ctx.toDouble) * 1e6)
      }
    }
    new LmModel(level, ids, lpUni6, lpBack6, lpBack26,
      oovUni6, oovBack6, oovBack26, biMap, biBackMap, triMap, null)
  }

  /** Build an interpolated Kneser–Ney bigram model (Kneser & Ney 1995;
    * Chen & Goodman 1999's interpolated form with one fixed absolute
    * discount `d`) from the SAME collected vocab-capped tables the
    * stupid-backoff builder takes — the continuation statistics derive
    * from the pair table itself, so a persisted `(unigramLm, bigramLm)`
    * model is KN-scorable with no retraining:
    *
    *   - N1+(w1, ·) = distinct pairs with context w1 in the table,
    *     N1+(·, w2) = distinct pairs ending in w2, NP = table rows;
    *   - Pcont(w) = (N1+(·, w) + 1) / (NP + V + 1) — Laplace-smoothed so
    *     OOV / continuation-free tokens stay scoreable (V = unigram
    *     vocab rows, the [[graft.llm.Quality.lmPerplexity]] convention);
    *   - token 1 scores the Laplace-smoothed UNIGRAM (the family's
    *     first-token contract — tx8/tx18/tx20 share it);
    *   - seen pair: p = max(c − d, 0)/c(w1) + d·N1+(w1,·)/c(w1) ·
    *     Pcont(w2), ONE rounding of the full interpolated value;
    *   - unseen pair: λ(w1) · Pcont(w2) as round(ln λ·10⁶) +
    *     round(ln Pcont·10⁶) — two rounded integer arms summed, with
    *     λ(w1) = d·N1+(w1,·)/c(w1), and λ = 1 (micro-log 0) when the
    *     context is OOV or has no table pairs (nothing was discounted
    *     from it).
    *
    * The capped table IS the model: counts need not sum to c(w1) — KN
    * over the top-`vocab` pair table is the deterministic contract both
    * engines replay. */
  def buildKn(uni: Array[(String, Long)], bi: Array[(String, String, Long, Long)],
      discount: Double): LmModel = {
    require(discount > 0.0 && discount < 1.0,
      s"LmModel.buildKn: discount must be in (0, 1), got $discount")
    val ids = new java.util.HashMap[UTF8String, Integer]()
    def id(w: String): Int = {
      val u = UTF8String.fromString(w)
      var v = ids.get(u)
      if (v == null) {
        require(ids.size() <= MaxIds,
          s"LmModel: > $MaxIds distinct model tokens — not a vocab-capped " +
            "LM table")
        v = Integer.valueOf(ids.size())
        ids.put(u, v)
      }
      v.intValue()
    }
    val uniClean = uni.filter(_._1 != null)
    require(uniClean.map(_._1).distinct.length == uniClean.length,
      "LmModel: duplicate tokens in the unigram table — pass a " +
        "unigramLm-shaped model (distinct tokens)")
    val biClean = bi.filter(r => r._1 != null && r._2 != null)
    var nSum = 0L
    uniClean.foreach { case (_, c) => nSum += c }
    val denom = nSum.toDouble + uniClean.length.toDouble + 1.0
    uniClean.foreach { case (w, _) => id(w) }
    biClean.foreach { case (a, b, _, _) => id(a); id(b) }
    val k = ids.size()
    // continuation statistics over the (distinct-by-require) pair table
    val n1fw = new Array[Long](k) // N1+(w1, ·)
    val ctxCnt = new Array[Long](k) // c(w1) carried on the rows
    val n1bw = new Array[Long](k) // N1+(·, w2)
    val seen = new java.util.HashSet[Long]()
    biClean.foreach { case (a, b, _, ctx) =>
      val ia = id(a); val ib = id(b)
      val key = (ia.toLong << 21) | ib
      require(seen.add(key),
        s"LmModel: duplicate bigram ($a, $b) — pass a bigramLm-shaped model")
      require(ctx > 0L && (n1fw(ia) == 0L || ctxCnt(ia) == ctx),
        s"LmModel: inconsistent w1_cnt for context '$a' — pass a " +
          "bigramLm-shaped model (one context count per w1)")
      n1fw(ia) += 1L
      ctxCnt(ia) = ctx
      n1bw(ib) += 1L
    }
    val npD = biClean.length.toDouble
    val contDenom = npD + uniClean.length.toDouble + 1.0
    val lpUni6 = new Array[Long](k)
    val lpCont6 = new Array[Long](k)
    val lam6 = new Array[Long](k)
    val oovUni6 = fix6(math.log(1.0 / denom) * 1e6)
    val oovCont6 = fix6(math.log(1.0 / contDenom) * 1e6)
    java.util.Arrays.fill(lpUni6, oovUni6)
    var i = 0
    while (i < k) {
      lpCont6(i) = fix6(math.log((n1bw(i) + 1.0) / contDenom) * 1e6)
      if (n1fw(i) > 0L)
        lam6(i) = fix6(
          math.log(discount * n1fw(i).toDouble / ctxCnt(i).toDouble) * 1e6)
      i += 1
    }
    uniClean.foreach { case (w, c) =>
      lpUni6(id(w)) = fix6(math.log((c + 1.0) / denom) * 1e6)
    }
    val biMap = new scala.collection.mutable.LongMap[Long](
      math.max(8, biClean.length * 2))
    biClean.foreach { case (a, b, c, ctx) =>
      val ia = id(a); val ib = id(b)
      val ctxD = ctx.toDouble
      val pc = (n1bw(ib) + 1.0) / contDenom
      val p = math.max(c.toDouble - discount, 0.0) / ctxD +
        discount * n1fw(ia).toDouble / ctxD * pc
      biMap((ia.toLong << 21) | ib) = fix6(math.log(p) * 1e6)
    }
    new LmModel(2, ids, lpUni6, lpCont6, new Array[Long](k),
      oovUni6, oovCont6, oovCont6, biMap,
      new scala.collection.mutable.LongMap[Long](8),
      new scala.collection.mutable.LongMap[Long](8), lam6)
  }
}

/** Per-document n-gram NLL sum over a LOWERCASED text column in ONE
  * compiled pass against a broadcast [[LmModel]] — struct(n_tokens, s6).
  * The expression splits tokens itself at the byte level (≡
  * `split(lower(text), " ")` with trailing empties — the engine-wide
  * [[graft.llm.Dedup.tokens]] contract; the caller lowers). The model
  * ships once per executor via the broadcast (the expression itself
  * carries only the handle), so plan/task binaries stay small at any
  * vocab size. The mean/nll/ppl algebra (integer half-up mean, 6-decimal
  * round, exp) stays in column math on top, so oracle hashes are
  * byte-identical to the explode-join form this replaces. */
case class NgramNll6(child: Expression, model: Broadcast[LmModel])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string (lowered text), got ${other.simpleString}")
    }

  override def dataType: DataType = NgramNll6.Schema
  override def prettyName: String = "ngram_nll6"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(text: Any): Any =
    model.value.nll6(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("lmModelBc", model,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, text => {
      s"${ev.value} = ((graft.expressions.LmModel) $bcRef.value())" +
        s".nll6($text);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramNll6 = copy(child = newChild)
}

object NgramNll6 {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("s6", LongType, nullable = false)))
}
