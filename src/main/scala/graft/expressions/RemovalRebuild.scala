package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The span-removal text rebuild in ONE compiled pass — interval merge,
  * complement, and reassembly fused ([[graft.llm.Dedup.removeDupSpans]]'
  * tail). Inputs: the token array, the ASCENDING duplicated start
  * positions (1-based), and the span length (foldable int). Output:
  * struct<clean_text string, n_removed bigint> where clean_text joins
  * every UNCOVERED token with single spaces and n_removed counts covered
  * positions under the merged-interval coverage (span [s, s+L−1],
  * touching intervals merge).
  *
  * Replaces the declarative tail — an `aggregate` lambda that re-copied
  * the accumulator array per start (interpreted, O(intervals²) copies
  * for heavily-duplicated docs), a zip_with complement, and a
  * transform-of-slice reassembly — with one O(tokens + starts) walk and
  * a single output buffer. Byte-identical: split-derived tokens rejoin
  * with the same single-space separator, so range-wise join ≡ flat join
  * of kept tokens. Null tokens render as empty strings (split output is
  * never null; documented for completeness). */
case class SpanRemoveRebuild(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _), IntegerType)
        if third.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>, foldable int), " +
          s"got ${first.dataType.simpleString}, " +
          s"${second.dataType.simpleString}, ${third.dataType.simpleString}")
    }

  override def dataType: DataType = SpanRemoveRebuild.Schema
  override def prettyName: String = "span_remove_rebuild"
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override def nullSafeEval(toks: Any, starts: Any, span: Any): Any =
    SpanRemoveRebuild.compute(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], span.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, starts, span) => {
      s"${ev.value} = graft.expressions.SpanRemoveRebuild.compute(" +
        s"$toks, $starts, $span);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SpanRemoveRebuild =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SpanRemoveRebuild {
  val Schema: StructType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  /** The compiled kernel both eval paths share. `starts` must be
    * ascending (the caller derives it from an ascending sequence via
    * array_except, which preserves left order). */
  def compute(tokens: ArrayData, starts: ArrayData, span: Int): InternalRow = {
    require(span >= 1, s"span must be >= 1, got $span")
    val n = tokens.numElements()
    val ns = starts.numElements()
    // merged coverage intervals from the sorted starts
    val los = new Array[Int](ns)
    val his = new Array[Int](ns)
    var k = 0
    var i = 0
    while (i < ns) {
      val s = starts.getInt(i)
      val e = s + span - 1
      if (k > 0 && s <= his(k - 1) + 1) {
        if (e > his(k - 1)) his(k - 1) = e
      } else {
        los(k) = s; his(k) = e; k += 1
      }
      i += 1
    }
    var removed = 0L
    i = 0
    while (i < k) { removed += his(i) - los(i) + 1; i += 1 }
    // kept tokens = positions outside every interval; single pass with
    // an interval cursor. First measure bytes, then fill.
    val toks = new Array[UTF8String](n)
    var keptBytes = 0L
    var keptCount = 0
    var cursor = 0
    var p = 1
    while (p <= n) {
      while (cursor < k && his(cursor) < p) cursor += 1
      val covered = cursor < k && los(cursor) <= p && p <= his(cursor)
      if (!covered) {
        val t = if (tokens.isNullAt(p - 1)) UTF8String.EMPTY_UTF8
          else tokens.getUTF8String(p - 1)
        toks(p - 1) = t
        keptBytes += t.numBytes()
        keptCount += 1
      }
      p += 1
    }
    val total = keptBytes + math.max(0, keptCount - 1)
    val buf = new Array[Byte](math.toIntExact(total))
    var off = 0
    var emitted = 0
    p = 1
    while (p <= n) {
      val t = toks(p - 1)
      if (t != null) {
        if (emitted > 0) { buf(off) = ' '; off += 1 }
        t.writeToMemory(buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += t.numBytes()
        emitted += 1
      }
      p += 1
    }
    InternalRow(UTF8String.fromBytes(buf), removed)
  }
}

/** The line-removal text rebuild in one compiled pass
  * ([[graft.llm.Dedup.removeDupLines]]' tail): given the line array and
  * the ASCENDING kept positions (1-based), join the kept lines with the
  * bound separator and count the removals. Replaces the interpreted
  * `transform(kpos, p => element_at(lines, p))` + array_join tail with
  * one measured-and-filled buffer. Null lines render as empty strings
  * (split output is never null). */
case class LineRemoveRebuild(left: Expression, right: Expression,
    sep: String) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LineRemoveRebuild.Schema
  override def prettyName: String = "line_remove_rebuild"
  override def nullable: Boolean = left.nullable || right.nullable

  @transient private lazy val sepU: UTF8String = UTF8String.fromString(sep)

  override def nullSafeEval(lines: Any, kpos: Any): Any =
    LineRemoveRebuild.compute(lines.asInstanceOf[ArrayData],
      kpos.asInstanceOf[ArrayData], sepU)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("sep", sepU,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, (lines, kpos) => {
      s"${ev.value} = graft.expressions.LineRemoveRebuild.compute(" +
        s"$lines, $kpos, $sRef);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LineRemoveRebuild =
    copy(left = newLeft, right = newRight)
}

object LineRemoveRebuild {
  val Schema: StructType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  /** The compiled kernel both eval paths share. */
  def compute(lines: ArrayData, kpos: ArrayData, sep: UTF8String):
      InternalRow = {
    val n = lines.numElements()
    val nk = kpos.numElements()
    var bytes = 0L
    var i = 0
    while (i < nk) {
      val p = kpos.getInt(i)
      if (p >= 1 && p <= n && !lines.isNullAt(p - 1))
        bytes += lines.getUTF8String(p - 1).numBytes()
      i += 1
    }
    bytes += sep.numBytes().toLong * math.max(0, nk - 1)
    val buf = new Array[Byte](math.toIntExact(bytes))
    var off = 0
    i = 0
    while (i < nk) {
      if (i > 0) {
        sep.writeToMemory(buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += sep.numBytes()
      }
      val p = kpos.getInt(i)
      if (p >= 1 && p <= n && !lines.isNullAt(p - 1)) {
        val l = lines.getUTF8String(p - 1)
        l.writeToMemory(buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += l.numBytes()
      }
      i += 1
    }
    InternalRow(UTF8String.fromBytes(buf, 0, off), n.toLong - nk)
  }
}
