package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The line-chunk staging `regexp_replace(text, "((\S+ ){n-1}\S+) ",
  * "$1\n")` as ONE compiled byte scan — the fixture shape shared by the
  * line-dedup family (chunk every n tokens into a line; the synthetic
  * corpus carries no newlines). Semantically identical to the java
  * regex (property-pinned in MixSpec on randomized inputs, multi-space
  * and multi-byte included): each match consumes n maximal non-space
  * runs separated by SINGLE spaces plus one trailing space, whose byte
  * becomes `\n`; scanning resumes after the consumed space; a failed
  * attempt advances one position. Replacement length equals match
  * length, so the output is an equal-length copy with some `' '` bytes
  * flipped to `'\n'` — one allocation, no Matcher machinery.
  *
  * `\S`/`' '` are the java ASCII classes (`\s` = space, tab, LF, VT,
  * FF, CR); every byte ≥ 0x80 is non-space, and a byte-level attempt
  * starting mid-run reaches the same run boundaries as the char-level
  * attempt at the run's start, so byte scanning replaces the identical
  * space positions. */
case class ChunkLines(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "chunk_lines"
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(text: Any, n: Any): Any =
    ChunkLines.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, n) => {
      s"${ev.value} = graft.expressions.ChunkLines.compute($text, $n);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChunkLines =
    copy(left = newLeft, right = newRight)
}

object ChunkLines {
  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** The compiled kernel both eval paths share. */
  def compute(text: UTF8String, n: Int): UTF8String = {
    require(n >= 1, s"chunk_lines: n must be >= 1, got $n")
    val src = text.getBytes
    val len = src.length
    var out: Array[Byte] = null
    var i = 0
    while (i < len) {
      // attempt a match at i: n maximal \S+ runs, single ' ' between,
      // one trailing ' '
      var j = i
      var ok = true
      var k = 0
      while (ok && k < n) {
        val runStart = j
        while (j < len && !isSpace(src(j))) j += 1
        if (j == runStart) ok = false
        else if (k < n - 1) {
          if (j < len && src(j) == ' ') j += 1 else ok = false
        }
        k += 1
      }
      if (ok && j < len && src(j) == ' ') {
        if (out == null) out = src.clone()
        out(j) = '\n'
        i = j + 1
      } else i += 1
    }
    if (out == null) text else UTF8String.fromBytes(out)
  }
}
