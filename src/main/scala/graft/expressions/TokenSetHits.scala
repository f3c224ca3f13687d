package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of a token array's members that fall in a BOUND string set, in
  * one compiled pass — the `size(filter(toks, t => t.isInCollection(set)))`
  * shape of the stopword/marker scans (`TextStats.stopwordRatio`,
  * `langVotes`, the Gopher stop-hit signal) without the interpreted
  * higher-order lambda: Catalyst never codegens lambda bodies, and
  * `filter` additionally materializes the kept-token array just to take
  * its size (tx2 at sf1 measured 4.7 s vs DuckDB 0.3 s on that path).
  * Here the set is hashed ONCE at plan construction into a shared
  * `java.util.HashSet` referenced from generated code, and each row is a
  * single counting loop — no allocation.
  *
  * Identical semantics to the filter/isInCollection form: exact string
  * equality, duplicates each count, null tokens never match (split
  * output is never null; documented for completeness). The set is part
  * of the expression (not a child), so two instances with different sets
  * never compare equal. */
case class TokenSetHits(child: Expression, tokens: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "token_set_hits"
  override def nullable: Boolean = child.nullable

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(8, tokens.size * 2))
    tokens.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override def nullSafeEval(toks: Any): Any =
    TokenSetHits.count(toks.asInstanceOf[ArrayData], set)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, toks => {
      s"${ev.value} = graft.expressions.TokenSetHits.count($toks, $setRef);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenSetHits = copy(child = newChild)
}

object TokenSetHits {
  /** The compiled kernel both eval paths share. */
  def count(toks: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = toks.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) c += 1L
      i += 1
    }
    c
  }
}

/** [[TokenSetHits]] against a RUNTIME broadcast set (data-derived, too
  * large to inline into the plan as literals — the decontamination
  * bench-shingle set): count of a string array's members present in the
  * broadcast `HashSet`, multiplicity included. The old shape exploded
  * one row per corpus shingle into a broadcast hash JOIN and re-grouped
  * by doc_id just to count the survivors — this is the same probe
  * against the same hash set, done per row with no generator, no join
  * operator, and no aggregate (d12 measured 2.7 s vs its 0.5 s oracle
  * at sf1 on that). The set ships once per executor via the broadcast;
  * the expression carries only the handle. */
case class BcStringSetHits(child: Expression,
    set: org.apache.spark.broadcast.Broadcast[java.util.HashSet[UTF8String]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "bc_string_set_hits"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(toks: Any): Any =
    TokenSetHits.count(toks.asInstanceOf[ArrayData], set.value)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcStringSet", set,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, toks => {
      s"${ev.value} = graft.expressions.TokenSetHits.count($toks, " +
        s"(java.util.HashSet) $bcRef.value());"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BcStringSetHits = copy(child = newChild)
}

/** [[BcStringSetHits]] for hashed keys: count of an array<long>'s
  * members present in a broadcast unboxed long set. */
case class BcLongSetHits(child: Expression,
    set: org.apache.spark.broadcast.Broadcast[
      scala.collection.mutable.LongMap[Unit]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "bc_long_set_hits"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(arr: Any): Any =
    BcLongSetHits.count(arr.asInstanceOf[ArrayData], set.value)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcLongSet", set,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.expressions.BcLongSetHits.count($arr, " +
        s"(scala.collection.mutable.LongMap) $bcRef.value());"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BcLongSetHits = copy(child = newChild)
}

object BcLongSetHits {
  /** The compiled kernel both eval paths share. */
  def count(arr: ArrayData, set: scala.collection.mutable.LongMap[Unit])
      : Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getLong(i))) c += 1L
      i += 1
    }
    c
  }
}

/** Count of a string array's members matching a BOUND regex (java
  * `find()` = `rlike` semantics), in one compiled pass — the
  * `size(filter(arr, x => x.rlike(p)))` / startsWith / endsWith shapes
  * of the Gopher line scans without the interpreted lambda or the
  * filtered-array allocation. The pattern compiles once per task; use
  * `\A` / `\z` anchors for prefix/suffix tests (`$` would also match
  * before a final `\r`, where `endsWith` does not). */
case class TokenRegexHits(child: Expression, pattern: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "token_regex_hits"
  override def nullable: Boolean = child.nullable

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  override def nullSafeEval(toks: Any): Any =
    TokenRegexHits.count(toks.asInstanceOf[ArrayData], compiled)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("tokenPattern", compiled,
      "java.util.regex.Pattern")
    nullSafeCodeGen(ctx, ev, toks => {
      s"${ev.value} = graft.expressions.TokenRegexHits.count($toks, $pRef);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenRegexHits = copy(child = newChild)
}

object TokenRegexHits {
  /** The compiled kernel both eval paths share. */
  def count(toks: ArrayData, p: java.util.regex.Pattern): Long = {
    val n = toks.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) &&
        p.matcher(toks.getUTF8String(i).toString).find()) c += 1L
      i += 1
    }
    c
  }
}

/** Count of a token array's members that CONTAIN at least one byte from
  * a bound ASCII set — the `size(filter(arr, x => x.rlike("[a-z]")))`
  * single-char-class shape (the Gopher alpha-word signal) as one
  * compiled byte scan per token: no Matcher, no per-token String
  * conversion. Exact for ASCII classes: a multi-byte codepoint's UTF-8
  * bytes are all ≥ 0x80 and can never alias an ASCII member. */
case class TokenAnyAsciiHits(child: Expression, chars: String)
  extends UnaryExpression {
  require(chars.forall(_ < 128),
    s"TokenAnyAsciiHits: set must be ASCII-only, got '$chars'")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "token_any_ascii_hits"
  override def nullable: Boolean = child.nullable

  @transient private lazy val table: Array[Boolean] = {
    val t = new Array[Boolean](128)
    chars.foreach(c => t(c.toInt) = true)
    t
  }

  override def nullSafeEval(toks: Any): Any =
    TokenAnyAsciiHits.count(toks.asInstanceOf[ArrayData], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("asciiTable", table, "boolean[]")
    nullSafeCodeGen(ctx, ev, toks => {
      s"${ev.value} = graft.expressions.TokenAnyAsciiHits.count($toks, $tRef);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenAnyAsciiHits = copy(child = newChild)
}

object TokenAnyAsciiHits {
  /** The compiled kernel both eval paths share. */
  def count(toks: ArrayData, table: Array[Boolean]): Long = {
    val n = toks.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        val m = t.numBytes()
        val base = t.getBaseObject
        val off = t.getBaseOffset
        var j = 0
        var hit = false
        while (j < m && !hit) {
          val b = org.apache.spark.unsafe.Platform.getByte(base, off + j)
          if (b >= 0 && table(b)) hit = true
          j += 1
        }
        if (hit) c += 1L
      }
      i += 1
    }
    c
  }
}

/** The BPE-ish token estimate (`[a-z0-9]+|[^a-z0-9 ]` match count over
  * lowered text) as one compiled byte scan: alphanumeric RUNS count one
  * each, every other non-space CODEPOINT counts one. Exact vs the
  * regexp_extract_all form: the run class is ASCII (multi-byte bytes
  * are all ≥ 0x80, so they never extend a run), and "other codepoints"
  * are counted by skipping UTF-8 continuation bytes (0b10xxxxxx). No
  * match array is materialized. */
case class AlnumRunCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "alnum_run_count"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    AlnumRunCount.count(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.expressions.AlnumRunCount.count($s);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): AlnumRunCount = copy(child = newChild)
}

object AlnumRunCount {
  private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** The compiled kernel both eval paths share. */
  def count(s: UTF8String): Long = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var c = 0L
    var inRun = false
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (isAlnum(b)) {
        if (!inRun) { c += 1L; inRun = true }
      } else {
        inRun = false
        // count every non-space, non-continuation byte as one codepoint
        if (b != ' ' && (b & 0xC0) != 0x80) c += 1L
      }
      i += 1
    }
    c
  }
}

/** Text canonicalization (control-strip → whitespace-collapse → trim)
  * as ONE compiled byte scan — `Quality.normalizeText`'s kernel,
  * replacing two full-text regex replaces plus trim (three string
  * rebuilds per evaluation; predicate pushdown can replicate the
  * normalize expression into quality/language filters several times per
  * row, so the per-evaluation cost is the lever). Byte-exact to the
  * regex form: control chars ([\x00-\x08\x0E-\x1F\x7F]) vanish without
  * splitting words, whitespace runs ([ \t\n\r\f\x0B]+, control chars
  * inside a run notwithstanding) collapse to one space, leading/trailing
  * whitespace drops. ASCII classes only — multi-byte UTF-8 units are
  * all ≥ 0x80 and pass through untouched. */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    NormalizeTextExpr.compute(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.expressions.NormalizeTextExpr.compute($s);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeTextExpr = copy(child = newChild)
}

object NormalizeTextExpr {
  private def isCtrl(b: Byte): Boolean =
    (b >= 0x00 && b <= 0x08) || (b >= 0x0E && b <= 0x1F) || b == 0x7F
  private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 0x09 && b <= 0x0D)

  /** The compiled kernel both eval paths share: one pass, one output
    * buffer (≤ input size). */
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val out = new Array[Byte](n)
    var o = 0
    var pending = false
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (isCtrl(b)) { /* stripped; never splits a word or a ws run */ }
      else if (isWs(b)) pending = true
      else {
        if (pending && o > 0) { out(o) = ' '; o += 1 }
        pending = false
        out(o) = b; o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }
}

/** The winnowing document sketch (Schleimer et al. 2003, the MOSS
  * fingerprint) as an expression — array<long> of the distinct sliding-
  * window minima over the rolling k-gram hashes of the lowercased text.
  * Value-identical to [[graft.llm.TextStats.winnow]] (the property-
  * tested reference kernel: Java-long wrapping 31-base polynomial over
  * UTF-16 code units, full windows, ≤-window texts sketch to their
  * single minimum, sub-k texts to an empty sketch) — spec-pinned equal
  * on randomized strings, reimplemented allocation-lean for corpus
  * scale (see [[WinnowSketchExpr.compute]]). */
case class WinnowSketchExpr(child: Expression, k: Int, window: Int)
  extends UnaryExpression {
  require(k >= 1, s"WinnowSketchExpr: k must be >= 1, got $k")
  require(window >= 1, s"WinnowSketchExpr: window must be >= 1, got $window")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_sketch"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    WinnowSketchExpr.compute(s.asInstanceOf[UTF8String], k, window)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.expressions.WinnowSketchExpr.compute($s, " +
        s"$k, $window);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowSketchExpr = copy(child = newChild)
}

object WinnowSketchExpr {
  /** The compiled kernel both eval paths share — value-identical to
    * [[graft.llm.TextStats.winnow]] (spec-pinned on randomized strings)
    * but allocation-lean: one long[] of gram hashes, window minima by
    * direct scan (window is small by contract), first-occurrence
    * dedup via an open long set. The reference kernel's
    * `sliding(window).map(_.min).distinct` allocated a Seq per WINDOW —
    * 47 s for 1 M docs at probe scale; this runs the same corpus in
    * ~3 s. */
  def compute(s: UTF8String, k: Int, window: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val n = str.length
    if (n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    val nh = n - k + 1
    val hashes = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      var h = 1125899906842597L
      var j = i
      while (j < i + k) { h = 31 * h + str.charAt(j); j += 1 }
      hashes(i) = h
      i += 1
    }
    val seen = new scala.collection.mutable.LongMap[Unit](64)
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    if (nh <= window) {
      var m = hashes(0)
      i = 1
      while (i < nh) { if (hashes(i) < m) m = hashes(i); i += 1 }
      out += m
    } else {
      var p = 0
      while (p <= nh - window) {
        var m = hashes(p)
        var j = p + 1
        while (j < p + window) { if (hashes(j) < m) m = hashes(j); j += 1 }
        if (!seen.contains(m)) { seen(m) = (); out += m }
        p += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }
}

/** The fingerprint normalization (`trim(regexp_replace(lower(t),
  * "[^a-z0-9]+", " "))`, falling back to the RAW text when the
  * normalization is empty — non-Latin documents must not collapse into
  * one dedup bucket) as ONE compiled byte scan over (raw, lowered) —
  * `TextStats.fingerprint`'s kernel, replacing a full-text regex
  * rebuild per row (tx4 measured 1.7 s vs its 0.12 s oracle at sf1).
  * Byte-exact: runs of non-`[a-z0-9]` bytes collapse to one space (a
  * multi-byte codepoint's bytes are all ≥ 0x80, so the whole codepoint
  * run is a separator exactly as the codepoint-level regex treats it),
  * edges trim. */
case class AlnumNormExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string raw, string lowered), got $other")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "alnum_norm"
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(raw: Any, lowered: Any): Any =
    AlnumNormExpr.compute(raw.asInstanceOf[UTF8String],
      lowered.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (raw, lowered) => {
      s"${ev.value} = graft.expressions.AlnumNormExpr.compute($raw, $lowered);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AlnumNormExpr =
    copy(left = newLeft, right = newRight)
}

object AlnumNormExpr {
  private def isKeep(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** The compiled kernel both eval paths share: one pass over the
    * lowered bytes, one output buffer; the raw text is returned
    * UNTOUCHED (zero-copy) when nothing survives. */
  def compute(raw: UTF8String, lowered: UTF8String): UTF8String = {
    val n = lowered.numBytes()
    val base = lowered.getBaseObject
    val off = lowered.getBaseOffset
    val out = new Array[Byte](n)
    var o = 0
    var pending = false
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (isKeep(b)) {
        if (pending && o > 0) { out(o) = ' '; o += 1 }
        pending = false
        out(o) = b; o += 1
      } else pending = true
      i += 1
    }
    if (o == 0) raw else UTF8String.fromBytes(out, 0, o)
  }
}

/** Count of a string's CODEPOINTS that fall in a bound ASCII character
  * set, as one compiled byte scan — the
  * `length(regexp_replace(t, "[^...]", ""))` counting shape (tx2's
  * alphaRatio) without the regex pass or the replaced-string
  * allocation, and the delimiter count behind `size(split(t, " ")) =
  * count(' ') + 1` (tokenCount without materializing the token array).
  * Exact because the set is ASCII-only: in UTF-8 a multi-byte
  * codepoint's bytes are all ≥ 0x80, so an ASCII byte IS a codepoint
  * and bytes outside ASCII can never spuriously match. Callers must
  * pass only ASCII characters in `chars` (require-guarded). */
case class AsciiSetCount(child: Expression, chars: String)
  extends UnaryExpression {
  require(chars.forall(_ < 128),
    s"AsciiSetCount: set must be ASCII-only, got '$chars'")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "ascii_set_count"
  override def nullable: Boolean = child.nullable

  @transient private lazy val table: Array[Boolean] = {
    val t = new Array[Boolean](128)
    chars.foreach(c => t(c.toInt) = true)
    t
  }

  override def nullSafeEval(s: Any): Any =
    AsciiSetCount.count(s.asInstanceOf[UTF8String], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("asciiTable", table, "boolean[]")
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.expressions.AsciiSetCount.count($s, $tRef);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): AsciiSetCount = copy(child = newChild)
}

object AsciiSetCount {
  /** The compiled kernel both eval paths share: one pass over the
    * UTF-8 bytes, no allocation. */
  def count(s: UTF8String, table: Array[Boolean]): Long = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var c = 0L
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b >= 0 && table(b)) c += 1L
      i += 1
    }
    c
  }
}
