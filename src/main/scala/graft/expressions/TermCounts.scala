package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document (term, tf) pairs of a token array in ONE compiled pass —
  * array<struct<term, tf>> in first-occurrence order. Term frequency is
  * DOC-LOCAL, so the TF-IDF/BM25 family's old
  * `explode → groupBy(doc_id, term).count` paid a corpus-TOKEN-scale
  * exchange for per-row counting (the [[RepetitionCounts]]
  * anti-pattern): exploding THIS array yields the identical
  * (doc, term, tf) rows with no exchange at all — the only remaining
  * shuffles in those plans are the genuinely corpus-level ones (the
  * document-frequency aggregate and its term join). Exact interned
  * counting by string equality, no hashing; null elements count as
  * empty strings (filtered-split tokens are never null). */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = TermCounts.Schema
  override def prettyName: String = "term_counts"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(toks: Any): Any =
    TermCounts.compute(toks.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"${ev.value} = graft.expressions.TermCounts.compute($toks);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): TermCounts = copy(child = newChild)
}

object TermCounts {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  /** The compiled kernel both eval paths share. O(n) time, doc-bounded
    * memory. */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val idx = new java.util.LinkedHashMap[UTF8String, Array[Long]](
      math.max(8, n * 2))
    var i = 0
    while (i < n) {
      val t = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8
        else tokens.getUTF8String(i)
      val c = idx.get(t)
      if (c == null) idx.put(t, Array(1L)) else c(0) += 1L
      i += 1
    }
    val out = new Array[Any](idx.size())
    val it = idx.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(e.getKey, e.getValue()(0))
      k += 1
    }
    new GenericArrayData(out)
  }
}
