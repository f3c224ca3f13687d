package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `span`-token sliding-window keys of a token array in ONE pass — the
  * span-dedup family's window keying (`Dedup.spanDupStats` /
  * `removeDupSpans` / `SpanDupStream`), replacing
  * `transform(idxs, p -> xxhash64(concat_ws(' ', slice(tok, p, span))))`.
  * That form materializes every L-token window STRING just to hash it —
  * O(tokens × span) bytes built and thrown away per document, all inside
  * an interpreted HOF lambda (Catalyst does not codegen lambda bodies).
  * Here each token is xxhash64'd once and windows combine token hashes in
  * a Rabin-Karp roll (odd multiplier, Long wraparound — exact algebra, so
  * the roll is bit-deterministic): O(tokens) work total, no string
  * allocation, evaluated by one compiled call that whole-stage codegen
  * inlines.
  *
  * The keys are HASH KEYS with the same contract as the xxhash64-string
  * form they replace: equal windows always collide, unequal windows
  * collide with ~2⁻⁶⁴ probability. Values differ from the old form —
  * window keys never persist beyond a job except in the span stream's
  * state dirs, whose format version this expression bumps (state and
  * delivery keys always derive from the same code, so a work dir is
  * internally consistent; re-ingest, don't mix engine versions mid-state).
  * Null elements hash as empty strings (split-derived tokens are never
  * null; documented for completeness — the old concat_ws form SKIPPED
  * nulls instead).
  *
  * Output: array<long> of length max(0, n − span + 1) — empty for
  * documents shorter than the span, exactly like the sequence-guard form.
  */
case class WindowHashes(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(toks: Any, span: Any): Any =
    WindowHashes.compute(toks.asInstanceOf[ArrayData],
      span.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, span) => {
      s"${ev.value} = graft.expressions.WindowHashes.compute($toks, $span);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowHashes =
    copy(left = newLeft, right = newRight)
}

/** All `span`-token sliding-window STRINGS of a token array in one
  * compiled pass — [[WindowHashes]]'s sibling for the span family's
  * `hashWindows = false` mode, where keys must be the window text itself
  * (the no-hash-parity oracle replay). Replaces
  * `transform(idxs, p -> concat_ws(' ', slice(tok, p, span)))`, which
  * re-evaluates an interpreted lambda per window and allocates a fresh
  * slice + join per position. Here the tokens join ONCE into a single
  * byte buffer and every window is a zero-copy UTF8String view over it
  * (adjacent windows share all but one token, so views cost O(tokens)
  * where per-window copies cost O(tokens × span)).
  *
  * Byte-identical to the concat_ws form for non-null tokens (split-derived
  * tokens always are); a null token renders as an empty string, where
  * concat_ws would have skipped it entirely.
  *
  * Output: array<string> of length max(0, n − span + 1). */
case class WindowStrings(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "window_strings"
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(toks: Any, span: Any): Any =
    WindowStrings.compute(toks.asInstanceOf[ArrayData],
      span.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, span) => {
      s"${ev.value} = graft.expressions.WindowStrings.compute($toks, $span);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowStrings =
    copy(left = newLeft, right = newRight)
}

object WindowStrings {
  /** The compiled kernel both eval paths share. */
  def compute(tokens: ArrayData, span: Int): ArrayData = {
    require(span >= 1, s"window span must be >= 1, got $span")
    val n = tokens.numElements()
    val m = n - span + 1
    if (m <= 0) return new GenericArrayData(Array.empty[UTF8String])
    val toks = new Array[UTF8String](n)
    var total = 0L
    var i = 0
    while (i < n) {
      val t = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8
        else tokens.getUTF8String(i)
      toks(i) = t
      total += t.numBytes()
      i += 1
    }
    // single joined buffer: token i starts at starts(i); windows are
    // contiguous byte ranges of it
    val buf = new Array[Byte](math.toIntExact(total + (n - 1)))
    val starts = new Array[Int](n + 1)
    var off = 0
    i = 0
    while (i < n) {
      starts(i) = off
      val t = toks(i)
      t.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
      off += t.numBytes()
      if (i < n - 1) { buf(off) = ' '; off += 1 }
      i += 1
    }
    starts(n) = off + 1 // virtual next-token start (as if one more space)
    val out = new Array[UTF8String](m)
    i = 0
    while (i < m) {
      val lo = starts(i)
      val hi = starts(i + span) - 1 // end of token i+span-1
      out(i) = UTF8String.fromBytes(buf, lo, hi - lo)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-element xxhash64 of a string array in one compiled pass —
  * value-identical to `transform(arr, x => xxhash64(x))` (seed 42, null
  * elements hash to the seed, Spark's null contract), replacing the
  * interpreted lambda in the hashed line/shingle key paths. Because the
  * VALUES are unchanged, persisted stream state keyed by these hashes
  * stays valid across the swap. */
case class ElementXxHash(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "element_xxhash64"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(arr: Any): Any =
    ElementXxHash.compute(arr.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.expressions.ElementXxHash.compute($arr);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): ElementXxHash = copy(child = newChild)
}

object ElementXxHash {
  private val Seed = 42L
  /** The compiled kernel both eval paths share. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) Seed
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, Seed)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-element CROSS-ENGINE hash of a string array in one compiled
  * pass: the first 60 bits of md5 (15 hex chars — first 8 digest bytes,
  * big-endian, unsigned, >> 4), which DuckDB reproduces as
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`. [[ElementXxHash]]'s
  * sibling for hashed key paths that must stay DIFFERENTIALLY
  * REPLAYABLE (the d4-simhash md5-low-64 convention, one nibble shorter
  * to stay inside a signed BIGINT): same 8-byte-key exchange shape as
  * the xxhash64 path, a pricier hash, a replayable oracle. Null
  * elements hash as empty strings. */
case class ElementMd5Low60(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "element_md5_low60"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(arr: Any): Any =
    ElementMd5Low60.compute(arr.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.expressions.ElementMd5Low60.compute($arr);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): ElementMd5Low60 = copy(child = newChild)
}

object ElementMd5Low60 {
  // MessageDigest is stateful but reset-able: one per task thread, not
  // one per row (getInstance walks the provider registry)
  private val LocalMd =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The compiled kernel both eval paths share. */
  def compute(arr: ArrayData): ArrayData = {
    val md = LocalMd.get()
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
        else arr.getUTF8String(i)
      md.reset()
      val d = md.digest(s.getBytes)
      out(i) = java.nio.ByteBuffer.wrap(d).getLong >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }
}

object WindowHashes {
  /** Odd multiplier (golden-ratio constant): odd ⇒ invertible mod 2⁶⁴, so
    * distinct hash sequences stay distinct under the roll. */
  private val R = 0x9e3779b97f4a7c15L
  private val Seed = 42L

  /** The compiled kernel both eval paths share. */
  def compute(tokens: ArrayData, span: Int): ArrayData = {
    require(span >= 1, s"window span must be >= 1, got $span")
    val n = tokens.numElements()
    val m = n - span + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8
        else tokens.getUTF8String(i)
      th(i) = XxHash64Function.hash(s, StringType, Seed)
      i += 1
    }
    var powR = 1L
    i = 1
    while (i < span) { powR *= R; i += 1 }
    val out = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < span) { h = h * R + th(i); i += 1 }
    out(0) = h
    i = 1
    while (i < m) {
      h = (h - th(i - 1) * powR) * R + th(i + span - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
