package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Collect input values into an array, KEEPING AT MOST `cap + 1`
  * elements — the skew-proof building block behind the span-duplication
  * operators ([[graft.llm.Dedup.spanDupStats]] /
  * [[graft.llm.Dedup.removeDupSpans]]): a per-window collect whose
  * buffer CANNOT grow with the window's document frequency, so a viral
  * boilerplate key (present in 10⁷⁺ documents at the 100 TB shape)
  * costs each aggregation task a bounded buffer instead of an
  * unbounded `collect_list` — and partial aggregation (this is a
  * [[TypedImperativeAggregate]], planned into ObjectHashAggregate with
  * map-side partials exactly like `collect_list`) ships at most
  * `cap + 1` elements per key per map task.
  *
  * The contract callers rely on: a group with AT MOST `cap` input rows
  * keeps EVERY row (update and merge only stop appending once the
  * buffer exceeds `cap`, and merges never drop below it), so the
  * result is exact for small groups; a group beyond the cap yields a
  * truncated array whose one extra element (`cap + 1`) marks the
  * overflow — callers pair this with a plain `count` column and ignore
  * the array for groups over the threshold. Element order is merge-
  * order-dependent; callers must treat the array as a SET.
  *
  * Values are copied on update (inputs are reused mutable rows) and
  * serialized between partial and final aggregation as length-prefixed
  * single-field UnsafeRows — the standard typed-aggregate wire shape. */
case class CollectCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(cap >= 0, s"cap must be >= 0, got $cap")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(buf: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buf.length <= cap) {
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    var i = 0
    while (i < other.length && buf.length <= cap) {
      buf += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](child.dataType))

  override def serialize(obj: mutable.ArrayBuffer[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    val writeBuffer = new Array[Byte](4096)
    obj.foreach { v =>
      val u = projection.apply(InternalRow(v))
      dos.writeInt(u.getSizeInBytes)
      u.writeToStream(dos, writeBuffer)
    }
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buf = mutable.ArrayBuffer.empty[Any]
    val dis = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    while (dis.available() > 0) {
      val sz = dis.readInt()
      val arr = new Array[Byte](sz)
      dis.readFully(arr)
      val r = new UnsafeRow(1)
      r.pointTo(arr, sz)
      buf += InternalRow.copyValue(r.get(0, child.dataType))
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_capped"

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCapped =
    copy(child = newChild)
}
