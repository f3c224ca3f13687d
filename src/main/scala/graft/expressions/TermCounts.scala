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

/** Per-document counts of a BOUND query-term set over LOWERED text, in
  * one compiled byte pass — struct(dl, counts): `dl` is the non-empty
  * token count (`size(filter(split(lower(t), " "), _ =!= ""))`) and
  * `counts(i)` the occurrences of `terms(i)` among those tokens. The
  * BM25 operators' old shape materialized the token array and EXPLODED
  * every corpus token just to keep the handful matching the query set
  * ([[TermCounts]]' general counter measured slower there — it builds a
  * per-doc map of ALL distinct terms; this probes a fixed K-term map
  * and fills a long[K]). Zero-copy token views, no array, no explode:
  * `posexplode(counts)` yields the identical query-term tf rows with K
  * elements per document instead of one per corpus token. */
case class QueryTermCounts(child: Expression, terms: Seq[String])
  extends UnaryExpression {
  require(terms.nonEmpty, "QueryTermCounts: terms must be non-empty")
  require(terms.distinct.length == terms.length,
    "QueryTermCounts: terms must be distinct")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string (lowered text), got ${other.simpleString}")
    }

  override def dataType: DataType = QueryTermCounts.Schema
  override def prettyName: String = "query_term_counts"
  override def nullable: Boolean = child.nullable

  @transient private lazy val idx: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](
      math.max(8, terms.size * 2))
    terms.zipWithIndex.foreach { case (t, i) =>
      m.put(UTF8String.fromString(t), Integer.valueOf(i))
    }
    m
  }

  override def nullSafeEval(s: Any): Any =
    QueryTermCounts.compute(s.asInstanceOf[UTF8String], idx, terms.size)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("termIdx", idx, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.expressions.QueryTermCounts.compute($s, " +
        s"$idxRef, ${terms.size});"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): QueryTermCounts = copy(child = newChild)
}

object QueryTermCounts {
  val Schema: DataType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false)))

  /** The compiled kernel both eval paths share: one pass over the
    * lowered bytes, one long[K] output. */
  def compute(s: UTF8String, idx: java.util.HashMap[UTF8String, Integer],
      k: Int): InternalRow = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val counts = new Array[Long](k)
    var dl = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || org.apache.spark.unsafe.Platform.getByte(base, off + i)
          == ' '.toByte) {
        if (i > start) {
          dl += 1L
          val h = idx.get(UTF8String.fromAddress(base, off + start, i - start))
          if (h != null) counts(h.intValue()) += 1L
        }
        start = i + 1
      }
      i += 1
    }
    InternalRow(dl, new GenericArrayData(counts))
  }
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
