package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Gopher rule signals (Rae et al. 2021, Table A1) as compiled
  * byte scans — the last interpreted/allocating shapes in the
  * `Quality.gopherRules`/`gopherPass` plan (tx9 measured 2.8 s vs its
  * 0.12 s oracle at sf1 on exactly these):
  *
  *   - two `split()` calls materialized the word and line arrays (one
  *     java String per corpus token) only for counting kernels to walk
  *     them;
  *   - the bullet/ellipsis line tests ran a `java.util.regex` Matcher
  *     per LINE ([[TokenRegexHits]] — compiled pattern, but still a
  *     Matcher allocation and a String re-materialization each);
  *   - the `#`/`...` symbol counts rebuilt the full text per row
  *     (`translate` + `replace` allocate the stripped copies just to
  *     diff lengths).
  *
  * [[GopherWordCounts]] walks the LOWERED text once (words = `' '`-split
  * views, the [[graft.expressions.LmModel.nll6]] zero-copy discipline);
  * [[GopherRawCounts]] walks the RAW text (line structure by the literal
  * separator, symbol counts, codepoint length). Both emit integer count
  * structs; the fraction/rounding algebra stays in column math, so plans
  * and oracle hashes are byte-identical to the array forms they replace.
  * [[GopherPassExpr]] fuses both plus the threshold comparisons into one
  * boolean for the scan-filter form (`Corpus.prepare`'s gopher floor),
  * where staged struct columns are unavailable. */
object GopherCounts {

  /** One pass over the LOWERED text's bytes: words are `' '`-separated
    * byte views (trailing empties kept — `split(lower(t), " ")`'s
    * contract), `n_alpha` counts words containing ≥ 1 `[a-z]` byte
    * (≡ [[TokenAnyAsciiHits]] over lowered words: the input is already
    * lowercased), `stop_hits` probes each word's zero-copy view against
    * the bound set (≡ [[TokenSetHits]]). */
  def wordCounts(s: UTF8String, set: java.util.HashSet[UTF8String])
      : InternalRow = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var nWords = 0L
    var nAlpha = 0L
    var stopHits = 0L
    var start = 0
    var hasAlpha = false
    var i = 0
    while (i <= n) {
      val atEnd = i == n
      val b = if (atEnd) ' '.toByte
        else org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b == ' '.toByte) {
        nWords += 1L
        if (hasAlpha) nAlpha += 1L
        if (!set.isEmpty &&
            set.contains(UTF8String.fromAddress(base, off + start, i - start)))
          stopHits += 1L
        start = i + 1
        hasAlpha = false
      } else if (b >= 'a'.toByte && b <= 'z'.toByte) hasAlpha = true
      i += 1
    }
    InternalRow(nWords, nAlpha, stopHits)
  }

  /** Two passes over the RAW text's bytes, no allocation:
    *
    *   - `n_chars`: codepoints (non-continuation bytes) — `length(t)`;
    *   - `n_hash`: `'#'` bytes — `length(t) − length(translate(t, "#", ""))`;
    *   - `n_ellipsis`: non-overlapping left-to-right `"..."` matches —
    *     a run of k consecutive `'.'` contributes ⌊k/3⌋, exactly
    *     `replace`'s removal count;
    *   - line structure by the literal `sep` bytes (non-overlapping
    *     leftmost, trailing empty lines kept — `split(t, quote(sep))`):
    *     `n_bullet` counts lines starting `"- "` or `"* "` (the
    *     `\A- |\A\* ` test), `n_ell_lines` lines ending `"..."`
    *     (`\.\.\.\z`). ASCII literals ⇒ byte tests are exact on UTF-8. */
  def rawCounts(s: UTF8String, sep: Array[Byte]): InternalRow = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var nChars = 0L
    var nHash = 0L
    var nEll = 0L
    var dotRun = 0
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if ((b & 0xC0) != 0x80) nChars += 1L
      if (b == '#'.toByte) nHash += 1L
      if (b == '.'.toByte) dotRun += 1
      else { nEll += dotRun / 3; dotRun = 0 }
      i += 1
    }
    nEll += dotRun / 3
    val m = sep.length
    var nLines = 1L
    var nBullet = 0L
    var nEllLines = 0L
    var lineStart = 0
    def sepAt(p: Int): Boolean = {
      if (p + m > n) return false
      var j = 0
      while (j < m) {
        if (org.apache.spark.unsafe.Platform.getByte(base, off + p + j)
            != sep(j)) return false
        j += 1
      }
      true
    }
    def lineEnds(e: Int): Unit = {
      val len = e - lineStart
      if (len >= 2) {
        val b0 = org.apache.spark.unsafe.Platform.getByte(base, off + lineStart)
        val b1 = org.apache.spark.unsafe.Platform.getByte(base,
          off + lineStart + 1)
        if ((b0 == '-'.toByte || b0 == '*'.toByte) && b1 == ' '.toByte)
          nBullet += 1L
      }
      if (len >= 3 &&
          org.apache.spark.unsafe.Platform.getByte(base, off + e - 1) == '.'.toByte &&
          org.apache.spark.unsafe.Platform.getByte(base, off + e - 2) == '.'.toByte &&
          org.apache.spark.unsafe.Platform.getByte(base, off + e - 3) == '.'.toByte)
        nEllLines += 1L
    }
    i = 0
    while (i < n) {
      if (sepAt(i)) {
        lineEnds(i)
        nLines += 1L
        i += m
        lineStart = i
      } else i += 1
    }
    lineEnds(n)
    InternalRow(nChars, nHash, nEll, nLines, nBullet, nEllLines)
  }

  /** Spark `round(x, 6)` exactly: BigDecimal.valueOf ∘ setScale(6,
    * HALF_UP) — the [[RepetitionCounts]] fixed-point discipline. */
  def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  val WordSchema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))

  val RawSchema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_hash", LongType, nullable = false),
    StructField("n_ellipsis", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet", LongType, nullable = false),
    StructField("n_ell_lines", LongType, nullable = false)))
}

/** struct(n_words, n_alpha, stop_hits) over a LOWERCASED text column —
  * [[GopherCounts.wordCounts]] as an expression (the caller lowers,
  * the [[NgramNll6]] convention). The stop set hashes once at plan
  * construction and is part of the expression, not a child. */
case class GopherWordCounts(child: Expression, stops: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string (lowered text), got ${other.simpleString}")
    }

  override def dataType: DataType = GopherCounts.WordSchema
  override def prettyName: String = "gopher_word_counts"
  override def nullable: Boolean = child.nullable

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(8, stops.size * 2))
    stops.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override def nullSafeEval(s: Any): Any =
    GopherCounts.wordCounts(s.asInstanceOf[UTF8String], set)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.expressions.GopherCounts.wordCounts($s, $setRef);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): GopherWordCounts = copy(child = newChild)
}

/** struct(n_chars, n_hash, n_ellipsis, n_lines, n_bullet, n_ell_lines)
  * over the RAW text column — [[GopherCounts.rawCounts]] as an
  * expression; `sep` is matched as its literal UTF-8 bytes. */
case class GopherRawCounts(child: Expression, sep: String)
  extends UnaryExpression {
  require(sep.nonEmpty, "GopherRawCounts: sep must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = GopherCounts.RawSchema
  override def prettyName: String = "gopher_raw_counts"
  override def nullable: Boolean = child.nullable

  @transient private lazy val sepBytes: Array[Byte] =
    sep.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(s: Any): Any =
    GopherCounts.rawCounts(s.asInstanceOf[UTF8String], sepBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sepBytes", sepBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.expressions.GopherCounts.rawCounts($s, $sepRef);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): GopherRawCounts = copy(child = newChild)
}

/** The full Gopher pass decision as ONE boolean over (raw, lowered)
  * text — both count kernels plus the threshold algebra (the exact
  * `round(…, 6)` fixed point of the column form) fused, for the
  * scan-filter composition where staging struct columns is not an
  * option. Null text ⇒ null (≡ drop under `filter`). */
case class GopherPassExpr(left: Expression, right: Expression,
    stops: Seq[String], sep: String,
    minWords: Long, maxWords: Long,
    minMeanWordLen: Double, maxMeanWordLen: Double,
    maxSymbolRatio: Double, maxBulletFrac: Double, maxEllipsisFrac: Double,
    minAlphaWordFrac: Double, minStopHits: Long)
  extends BinaryExpression {
  require(sep.nonEmpty, "GopherPassExpr: sep must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string raw, string lowered), got $other")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "gopher_pass"
  override def nullable: Boolean = left.nullable || right.nullable

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(8, stops.size * 2))
    stops.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }
  @transient private lazy val sepBytes: Array[Byte] =
    sep.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(raw: Any, lowered: Any): Any =
    GopherPassExpr.pass(raw.asInstanceOf[UTF8String],
      lowered.asInstanceOf[UTF8String], set, sepBytes,
      minWords, maxWords, minMeanWordLen, maxMeanWordLen, maxSymbolRatio,
      maxBulletFrac, maxEllipsisFrac, minAlphaWordFrac, minStopHits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", set, "java.util.HashSet")
    val sepRef = ctx.addReferenceObj("sepBytes", sepBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, (raw, lowered) => {
      s"""${ev.value} = graft.expressions.GopherPassExpr.pass($raw, $lowered,
         |  $setRef, $sepRef, ${minWords}L, ${maxWords}L, $minMeanWordLen,
         |  $maxMeanWordLen, $maxSymbolRatio, $maxBulletFrac,
         |  $maxEllipsisFrac, $minAlphaWordFrac, ${minStopHits}L);
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GopherPassExpr =
    copy(left = newLeft, right = newRight)
}

object GopherPassExpr {
  /** The fused kernel both eval paths share — the threshold comparisons
    * run on the SAME rounded doubles the column form compares. */
  def pass(raw: UTF8String, lowered: UTF8String,
      set: java.util.HashSet[UTF8String], sep: Array[Byte],
      minWords: Long, maxWords: Long,
      minMeanWordLen: Double, maxMeanWordLen: Double,
      maxSymbolRatio: Double, maxBulletFrac: Double, maxEllipsisFrac: Double,
      minAlphaWordFrac: Double, minStopHits: Long): Boolean = {
    val w = GopherCounts.wordCounts(lowered, set)
    val nW = w.getLong(0)
    if (nW < minWords || nW > maxWords) return false
    val stopHits = w.getLong(2)
    if (stopHits < minStopHits) return false
    val r = GopherCounts.rawCounts(raw, sep)
    val nWi = nW.toInt
    val meanWl = GopherCounts.r6(
      (r.getLong(0).toInt - nWi + 1).toDouble / nWi)
    if (meanWl < minMeanWordLen || meanWl > maxMeanWordLen) return false
    val symbolRatio = GopherCounts.r6(
      (r.getLong(1).toInt + r.getLong(2).toInt).toDouble / nWi)
    if (symbolRatio > maxSymbolRatio) return false
    val nLi = r.getLong(3).toInt
    val bulletFrac = GopherCounts.r6(r.getLong(4).toDouble / nLi)
    if (bulletFrac > maxBulletFrac) return false
    val ellipsisFrac = GopherCounts.r6(r.getLong(5).toDouble / nLi)
    if (ellipsisFrac > maxEllipsisFrac) return false
    val alphaFrac = GopherCounts.r6(w.getLong(1).toDouble / nWi)
    alphaFrac >= minAlphaWordFrac
  }
}
