package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All of [[graft.llm.Quality.repetitionStats]]'s tallies over a token
  * array in ONE compiled pass — the within-document repetition counts the
  * Gopher/MassiveText filters threshold on. Replaces the declarative form
  * `explode(bigrams) → groupBy(doc_id, bigram).count → per-doc agg →
  * join back`, which paid a corpus-TOKEN-scale (doc_id, bigram) exchange
  * plus a doc_id join for a statistic that is DOC-LOCAL by definition
  * (repetition is within a document; cross-document span duplication is
  * [[graft.llm.Dedup.spanDupStats]]'s job). Same anti-pattern the
  * classifier scorer eliminated (`Quality.scoreTextClassifier`): at sf1
  * the shuffle form cost 9.6 s where a scan suffices.
  *
  * Counting is EXACT (no hashing): tokens intern to dense ids by string
  * equality, bigrams key an open Long map as (id << 32 | id) — two
  * bigrams collide iff both tokens are equal, exactly like the old
  * `concat(tok, ' ', tok₂)` string keys (split-derived tokens cannot
  * contain the joiner). Null tokens count as empty strings (split output
  * is never null; documented for completeness — the old form made a null
  * bigram from a null neighbor, unreachable for the same reason).
  *
  * Output: struct<n_tokens, n_distinct_tokens, n_bigrams,
  * n_distinct_bigrams, top_bigram_cnt> — all longs; n_bigrams =
  * max(0, n − 1), zeros when no bigram exists. The fraction algebra
  * (including Spark `round` semantics) stays in column math on top, so
  * oracle hashes are byte-identical to the shuffle form's. */
case class RepetitionCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = RepetitionCounts.Schema
  override def prettyName: String = "repetition_counts"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(toks: Any): Any =
    RepetitionCounts.compute(toks.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"${ev.value} = graft.expressions.RepetitionCounts.compute($toks);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionCounts = copy(child = newChild)
}

/** [[RepetitionCounts]] thresholded to one boolean in the same compiled
  * pass — the repetition FLOOR as a true scan filter (the `gopherPass`
  * shape): `docs.filter(repetitionPass(...))` folds into the scan, where
  * the old drop-list left-anti re-derived the stats AND shuffled both
  * corpus-sized sides. Thresholds are foldable literals; a doc passes iff
  * round(dup_word_frac, 6) ≤ maxDupWordFrac AND round(top_bigram_frac, 6)
  * ≤ maxTopBigramFrac — the identical rounded fixed point the stats path
  * publishes (java.math.BigDecimal.valueOf ∘ setScale(6, HALF_UP), the
  * exact algebra of Spark's `round` on doubles; spec-pinned equal), so
  * floor-then-stats compositions (`d11`'s oracle) cannot drift by a bit.
  * Evaluates null (≡ drop under `filter`) on null input, like
  * `gopherPass` — callers pass null-id/text rows through explicitly. */
case class RepetitionPass(first: Expression, second: Expression,
    third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), DoubleType, DoubleType)
        if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable double, foldable " +
          s"double), got ${first.dataType.simpleString}, " +
          s"${second.dataType.simpleString}, ${third.dataType.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "repetition_pass"
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override def nullSafeEval(toks: Any, maxW: Any, maxT: Any): Any =
    RepetitionCounts.pass(toks.asInstanceOf[ArrayData],
      maxW.asInstanceOf[Double], maxT.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, maxW, maxT) => {
      s"${ev.value} = graft.expressions.RepetitionCounts.pass(" +
        s"$toks, $maxW, $maxT);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RepetitionPass =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RepetitionCounts {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false),
    StructField("top_bigram_cnt", LongType, nullable = false)))

  /** The compiled kernel both eval paths share. O(n) time, doc-bounded
    * memory (one id per distinct token, one long count per distinct
    * bigram). */
  def compute(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val ids = new Array[Int](n)
    val tokMap = new java.util.HashMap[UTF8String, Integer](
      math.max(8, n * 2))
    var i = 0
    while (i < n) {
      val t = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8
        else tokens.getUTF8String(i)
      var id = tokMap.get(t)
      if (id == null) { id = Integer.valueOf(tokMap.size()); tokMap.put(t, id) }
      ids(i) = id.intValue()
      i += 1
    }
    val ndt = tokMap.size().toLong
    val m = n - 1
    var nb = 0L
    var ndb = 0L
    var mx = 0L
    if (m >= 1) {
      nb = m.toLong
      val bg = new scala.collection.mutable.LongMap[Long](
        math.max(8, m * 2))
      i = 0
      while (i < m) {
        val key = (ids(i).toLong << 32) | (ids(i + 1).toLong & 0xffffffffL)
        val c = bg.getOrElse(key, 0L) + 1L
        bg(key) = c
        if (c > mx) mx = c
        i += 1
      }
      ndb = bg.size.toLong
    }
    InternalRow(n.toLong, ndt, nb, ndb, mx)
  }

  /** Spark `round(x, 6)` on doubles, exactly: java BigDecimal.valueOf ∘
    * setScale(6, HALF_UP) (NaN/Infinity pass through untouched — the
    * fractions here are always finite, n_tokens ≥ 1). */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One-pass floor predicate sharing [[compute]]'s tallies. An EMPTY
    * token array passes (no tokens ⇒ no repetition evidence; the
    * explicit guard keeps the 0/0 fraction math unreachable —
    * `Quality.repetitionPass` can't produce it, split always yields ≥ 1
    * element, but `Cols.repetitionPass` is a public column API over
    * arbitrary array<string>). */
  def pass(tokens: ArrayData, maxDupWordFrac: Double,
      maxTopBigramFrac: Double): Boolean = {
    if (tokens.numElements() == 0) return true
    val r = compute(tokens)
    val nt = r.getLong(0).toDouble
    val ndt = r.getLong(1).toDouble
    val nb = r.getLong(2).toDouble
    val mx = r.getLong(4).toDouble
    val dwf = round6((nt - ndt) / nt)
    val tbf = if (nb == 0d) 0d else round6(mx / nb)
    dwf <= maxDupWordFrac && tbf <= maxTopBigramFrac
  }
}
