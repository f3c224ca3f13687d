package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The PII scrub/count family (`Quality.EmailRe` / `Ipv4Re` / `PhoneRe`)
  * as hand-rolled BYTE SCANS — semantically identical to java.util.regex
  * over the same patterns (property-pinned in MixSpec against the regex
  * forms on randomized inputs), without per-row Matcher machinery or the
  * three UTF8String → String → UTF8String round-trips of chained
  * `regexp_replace` (tx6 measured 58× its RE2 oracle at sf1 on exactly
  * that). The patterns are alternation-free by contract — character
  * classes + bounded quantifiers — which is what makes the exact
  * backtracking semantics reproducible in a linear scan:
  *
  *   - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: a match
  *     attempt anchors on a maximal local-set run; if the run is not
  *     followed by `@` (or no `.tld` split exists) every start inside
  *     the run provably fails too, so the scan resumes after it —
  *     linear even on adversarial base64-like runs. The domain
  *     backtracks longest-first: the split point is the LAST `.`
  *     followed by ≥ 2 letters.
  *   - IPv4 `\b\d{1,3}\.` ×3 `\d{1,3}\b`: octet runs must be ≤ 3 digits
  *     exactly (a longer run can never backtrack onto the required `.`
  *     or word boundary); attempts are ≤ 16 bytes, failures advance one
  *     byte (matching Java's start-by-start scan bit for bit).
  *   - phone `\+\d{1,2} \d{3} \d{3} \d{4}`: fixed shape; the final
  *     `{4}` has NO trailing boundary, so a longer digit run matches
  *     its first 4 digits — preserved.
  *
  * All pattern bytes are ASCII; multi-byte UTF-8 sequences (every byte
  * ≥ 0x80) are outside every character class, so byte-level scanning is
  * safe on UTF-8 — with ONE decode point: Java's `\b` word test is
  * Unicode-aware (see the word-test section below), so the two boundary
  * checks decode their non-ASCII neighbor.
  *
  * Scrub order email → IP → phone is the [[graft.llm.Quality.scrubPii]]
  * contract (each pass scans the PREVIOUS pass's output); counts are per
  * pattern on the ORIGINAL text ([[graft.llm.Quality.piiCount]]'s
  * independent-count semantics).
  */
object PiiScrub {
  private val EmailRepl = "<EMAIL>".getBytes("US-ASCII")
  private val IpRepl = "<IP>".getBytes("US-ASCII")
  private val PhoneRepl = "<PHONE>".getBytes("US-ASCII")

  private val Alpha: Array[Boolean] =
    Array.tabulate(128)(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))
  private val Digit: Array[Boolean] =
    Array.tabulate(128)(c => c >= '0' && c <= '9')
  private val Word: Array[Boolean] =
    Array.tabulate(128)(c => Alpha(c) || Digit(c) || c == '_')
  private val Domain: Array[Boolean] =
    Array.tabulate(128)(c => Alpha(c) || Digit(c) || c == '.' || c == '-')
  private val Local: Array[Boolean] =
    Array.tabulate(128)(c => Domain(c) || c == '_' || c == '%' || c == '+')
  @inline private def is(set: Array[Boolean], b: Byte): Boolean =
    b >= 0 && set(b)

  // --- \b word test, Java semantics ---------------------------------
  // java.util.regex's \b (without UNICODE_CHARACTER_CLASS) calls
  // `ch == '_' || Character.isLetterOrDigit(codepoint)` — UNICODE-aware
  // even though \w stays ASCII (a documented Java asymmetry; RE2's \b
  // is ASCII-only, but the oracle fixtures are ASCII so the engines
  // agree there, and the engine contract is the Java behavior the
  // regexp_replace form shipped). Non-ASCII neighbors therefore decode
  // to a codepoint before the word test.
  @inline private def isWordCp(cp: Int): Boolean =
    cp == '_'.toInt || Character.isLetterOrDigit(cp)

  private def decodeCp(b: Array[Byte], s: Int): Int = {
    val b0 = b(s) & 0xFF
    val n = b.length
    if (b0 < 0xC0) 0xFFFD // continuation/invalid lead: not a letter
    else if (b0 < 0xE0) {
      if (s + 1 >= n) 0xFFFD
      else ((b0 & 0x1F) << 6) | (b(s + 1) & 0x3F)
    } else if (b0 < 0xF0) {
      if (s + 2 >= n) 0xFFFD
      else ((b0 & 0x0F) << 12) | ((b(s + 1) & 0x3F) << 6) | (b(s + 2) & 0x3F)
    } else {
      if (s + 3 >= n) 0xFFFD
      else ((b0 & 0x07) << 18) | ((b(s + 1) & 0x3F) << 12) |
        ((b(s + 2) & 0x3F) << 6) | (b(s + 3) & 0x3F)
    }
  }

  /** Is the codepoint ENDING just before byte `i` a word char? */
  private def wordBefore(b: Array[Byte], i: Int): Boolean = {
    if (i <= 0) return false
    val p = b(i - 1)
    if (p >= 0) return Word(p)
    var s = i - 1
    while (s > 0 && (b(s) & 0xC0) == 0x80) s -= 1
    isWordCp(decodeCp(b, s))
  }

  /** Is the codepoint STARTING at byte `i` a word char? */
  private def wordAt(b: Array[Byte], i: Int): Boolean = {
    if (i >= b.length) return false
    val c = b(i)
    if (c >= 0) return Word(c)
    isWordCp(decodeCp(b, i))
  }

  /** Match ranges (start, end interleaved) of one pattern over `b`. */
  private def ranges(b: Array[Byte], kind: Int)
      : scala.collection.mutable.ArrayBuffer[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    val n = b.length
    kind match {
      case 0 => // email
        var i = 0
        while (i < n) {
          if (!is(Local, b(i))) i += 1
          else {
            var j = i
            while (j < n && is(Local, b(j))) j += 1
            if (j < n && b(j) == '@') {
              // maximal domain run
              var d = j + 1
              while (d < n && is(Domain, b(d))) d += 1
              // largest '.' split with >= 2 letters after and a
              // non-empty domain part before
              var p = d - 1
              var end = -1
              while (end < 0 && p >= j + 2) {
                if (b(p) == '.') {
                  var q = p + 1
                  while (q < n && is(Alpha, b(q))) q += 1
                  if (q - (p + 1) >= 2) end = q
                }
                p -= 1
              }
              if (end >= 0) { out += i; out += end; i = end }
              else i = j + 1
            } else i = j
          }
        }
      case 1 => // IPv4 with \b boundaries
        var i = 0
        while (i < n) {
          if (is(Digit, b(i)) && !wordBefore(b, i)) {
            // four octet runs of <= 3 digits; 1-3 end on '.', 4 on \b
            var ok = true
            var pos = i
            var oct = 0
            while (ok && oct < 4) {
              var r = 0
              while (pos + r < n && r <= 3 && is(Digit, b(pos + r))) r += 1
              if (r < 1 || r > 3) ok = false
              else if (oct < 3) {
                if (pos + r < n && b(pos + r) == '.') pos += r + 1
                else ok = false
              } else {
                if (!wordAt(b, pos + r)) pos += r
                else ok = false
              }
              oct += 1
            }
            if (ok) { out += i; out += pos; i = pos } else i += 1
          } else i += 1
        }
      case 2 => // phone
        var i = 0
        while (i < n) {
          if (b(i) == '+') {
            var ok = true
            var pos = i + 1
            // \d{1,2} then ' ': run must be exactly 1 or 2
            var r = 0
            while (pos + r < n && r <= 2 && is(Digit, b(pos + r))) r += 1
            if (r >= 1 && r <= 2 && pos + r < n && b(pos + r) == ' ')
              pos += r + 1
            else ok = false
            var g = 0
            while (ok && g < 2) { // two '\d{3} ' groups
              if (pos + 3 < n && is(Digit, b(pos)) && is(Digit, b(pos + 1)) &&
                  is(Digit, b(pos + 2)) && b(pos + 3) == ' ') pos += 4
              else ok = false
              g += 1
            }
            if (ok) { // final \d{4}, no trailing boundary
              if (pos + 3 < n && is(Digit, b(pos)) && is(Digit, b(pos + 1)) &&
                  is(Digit, b(pos + 2)) && is(Digit, b(pos + 3))) pos += 4
              else ok = false
            }
            if (ok) { out += i; out += pos; i = pos } else i += 1
          } else i += 1
        }
    }
    out
  }

  /** Rebuild with each range replaced; null when there is no match (the
    * zero-copy fast path — most corpus text carries no PII). */
  private def rebuild(b: Array[Byte],
      rs: scala.collection.mutable.ArrayBuffer[Int],
      repl: Array[Byte]): Array[Byte] = {
    if (rs.isEmpty) return null
    val m = rs.length / 2
    var kept = b.length
    var k = 0
    while (k < m) { kept -= rs(2 * k + 1) - rs(2 * k); k += 1 }
    val out = new Array[Byte](kept + m * repl.length)
    var src = 0
    var dst = 0
    k = 0
    while (k < m) {
      val s = rs(2 * k); val e = rs(2 * k + 1)
      System.arraycopy(b, src, out, dst, s - src); dst += s - src
      System.arraycopy(repl, 0, out, dst, repl.length); dst += repl.length
      src = e
      k += 1
    }
    System.arraycopy(b, src, out, dst, b.length - src)
    out
  }

  /** Scrub only (email → IP → phone, sequential semantics). */
  def scrub(text: UTF8String): UTF8String = {
    val b0 = text.getBytes
    val b1 = rebuild(b0, ranges(b0, 0), EmailRepl)
    val e1 = if (b1 != null) b1 else b0
    val b2 = rebuild(e1, ranges(e1, 1), IpRepl)
    val e2 = if (b2 != null) b2 else e1
    val b3 = rebuild(e2, ranges(e2, 2), PhoneRepl)
    val e3 = if (b3 != null) b3 else e2
    if (e3 eq b0) text else UTF8String.fromBytes(e3)
  }

  /** Counts on the ORIGINAL text + the sequential scrub, one call:
    * struct(n_email, n_ip, n_phone, scrubbed). Count scans are reused as
    * scrub scans whenever the preceding pass changed nothing. */
  def stats(text: UTF8String): InternalRow = {
    val b0 = text.getBytes
    val er = ranges(b0, 0)
    val b1 = rebuild(b0, er, EmailRepl)
    val e1 = if (b1 != null) b1 else b0
    val ir0 = ranges(b0, 1)
    val ir = if (e1 eq b0) ir0 else ranges(e1, 1)
    val b2 = rebuild(e1, ir, IpRepl)
    val e2 = if (b2 != null) b2 else e1
    val pr0 = if (e2 eq b0) null else ranges(b0, 2)
    val pr = if (e2 eq b0) ranges(b0, 2) else ranges(e2, 2)
    val nPhone = if (pr0 == null) pr.length / 2 else pr0.length / 2
    val b3 = rebuild(e2, pr, PhoneRepl)
    val e3 = if (b3 != null) b3 else e2
    InternalRow((er.length / 2).toLong, (ir0.length / 2).toLong,
      nPhone.toLong,
      if (e3 eq b0) text else UTF8String.fromBytes(e3))
  }

  val StatsSchema: StructType = StructType(Seq(
    StructField("n_email", LongType, nullable = false),
    StructField("n_ip", LongType, nullable = false),
    StructField("n_phone", LongType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))
}

/** `Quality.scrubPii` as one compiled pass — string → string. */
case class PiiScrubExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "pii_scrub"
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any =
    PiiScrub.scrub(t.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.PiiScrub.scrub($t);")
  override protected def withNewChildInternal(
      newChild: Expression): PiiScrubExpr = copy(child = newChild)
}

/** Counts + scrub in one compiled pass — struct(n_email, n_ip, n_phone,
  * scrubbed). The per-category counts are over the ORIGINAL text
  * (independent patterns, `piiCount` semantics); the scrub is
  * sequential. */
case class PiiStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString}")
    }
  override def dataType: DataType = PiiScrub.StatsSchema
  override def prettyName: String = "pii_stats"
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any =
    PiiScrub.stats(t.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.PiiScrub.stats($t);")
  override protected def withNewChildInternal(
      newChild: Expression): PiiStatsExpr = copy(child = newChild)
}
