package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Skew-proof per-group "collect BY KEY, unless too many distinct keys"
  * aggregates — the single-shuffle building block behind the span-
  * duplication operators ([[graft.llm.Dedup.spanDupStats]] /
  * [[graft.llm.Dedup.removeDupSpans]]).
  *
  * Semantics shared by both aggregates: values are grouped by a
  * sub-key (the document id, inside a per-window group); while the
  * group holds AT MOST `cap` DISTINCT sub-keys the result is EXACT;
  * the moment a `cap + 1`-th distinct sub-key appears the buffer is
  * DISCARDED and the group evaluates to NULL ("overflowed" — for the
  * span operators: the window is duplicated, nothing about it is
  * needed). This is what makes a viral boilerplate window (present in
  * 10⁷⁺ documents at the 100 TB shape) free: every aggregation task
  * carries at most `cap` map entries (or a 1-byte overflow marker) per
  * key, partial aggregation ships at most `cap` entries per key per
  * map task, and the merge of two overflowed/large partials is O(1).
  * Compared to the earlier two-shuffle form (pre-group by (window,
  * doc), then a capped collect by window) this folds BOTH window-key
  * aggregations into ONE exchange — at corpus scale the (window, doc)
  * pre-group's shuffle was the same size as the window shuffle, so
  * this halves the dominant shuffle bytes.
  *
  * Planned into ObjectHashAggregate with map-side partials exactly
  * like `collect_list`; buffers serialize as length-prefixed
  * two-field UnsafeRows behind a 1-byte overflow marker. Entry and
  * value order are accumulation-order-dependent; callers must treat
  * the result as a set (the span operators only ever feed it into
  * set-shaped consumers: `array_except`, sums). Null sub-keys are
  * ignored (the span operators filter null doc ids upstream).
  */
private[graft] final class KeyedCapBuffer {
  var overflow = false
  val m = mutable.LinkedHashMap.empty[Any, mutable.ArrayBuffer[Any]]
}

/** array<struct<key, vals: array<value>>> per group, or NULL once the
  * group exceeds `cap` distinct keys — see the file header for the
  * contract. Used by [[graft.llm.Dedup.removeDupSpans]] with
  * key = doc id, value = window start position. */
case class CollectByKeyCapped(
    left: Expression,
    right: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KeyedCapBuffer]
  with BinaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  private def key: Expression = left
  private def value: Expression = right

  override def createAggregationBuffer(): KeyedCapBuffer = new KeyedCapBuffer

  override def update(buf: KeyedCapBuffer, input: InternalRow): KeyedCapBuffer = {
    if (!buf.overflow) {
      val k = key.eval(input)
      // the value guard matches the declared ArrayType(..., containsNull
      // = false): a null value appended here would NPE in the buffer
      // serializer (or corrupt a non-null array read downstream) — skip
      // the row like the key guard does (current callers feed non-null
      // positions; the guard keeps the contract honest for new ones)
      val v = if (k == null) null else value.eval(input)
      if (k != null && v != null) {
        val existing = buf.m.get(k)
        existing match {
          case Some(vs) => vs += InternalRow.copyValue(v)
          case None =>
            if (buf.m.size == cap) { buf.overflow = true; buf.m.clear() }
            else buf.m.put(InternalRow.copyValue(k),
              mutable.ArrayBuffer[Any](InternalRow.copyValue(v)))
        }
      }
    }
    buf
  }

  override def merge(buf: KeyedCapBuffer, other: KeyedCapBuffer): KeyedCapBuffer = {
    if (buf.overflow || other.overflow) {
      buf.overflow = true; buf.m.clear()
    } else {
      val it = other.m.iterator
      while (it.hasNext && !buf.overflow) {
        val (k, vs) = it.next()
        buf.m.get(k) match {
          case Some(acc) => acc ++= vs
          case None =>
            if (buf.m.size == cap) { buf.overflow = true; buf.m.clear() }
            else buf.m.put(k, vs)
        }
      }
    }
    buf
  }

  override def eval(buf: KeyedCapBuffer): Any =
    if (buf.overflow) null
    else new GenericArrayData(buf.m.iterator.map { case (k, vs) =>
      InternalRow(k, new GenericArrayData(vs.toArray)): Any
    }.toArray)

  @transient private lazy val projection = UnsafeProjection.create(
    Array[DataType](key.dataType, ArrayType(value.dataType, containsNull = false)))

  /** The span operators' exact shape (long doc id, int position) gets a
    * fixed-width direct encoding: one exact-size buffer, no per-entry
    * UnsafeProjection or stream — buffer (de)serialization is the
    * measured floor of the single-exchange span family at bench scale
    * (hundreds of thousands of tiny buffers per query). The choice is
    * static in the expression's child types, so both sides of a shuffle
    * always agree on the wire format. */
  @transient private lazy val primitiveLI =
    key.dataType == LongType && value.dataType == IntegerType

  override def serialize(obj: KeyedCapBuffer): Array[Byte] = {
    if (primitiveLI) {
      if (obj.overflow) return Array[Byte](1)
      var size = 1
      obj.m.foreach { case (_, vs) => size += 12 + 4 * vs.length }
      val bb = java.nio.ByteBuffer.allocate(size)
      bb.put(0: Byte)
      obj.m.foreach { case (k, vs) =>
        bb.putLong(k.asInstanceOf[Long])
        bb.putInt(vs.length)
        var i = 0
        while (i < vs.length) { bb.putInt(vs(i).asInstanceOf[Int]); i += 1 }
      }
      return bb.array()
    }
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeBoolean(obj.overflow)
    if (!obj.overflow) {
      val writeBuffer = new Array[Byte](4096)
      obj.m.foreach { case (k, vs) =>
        val u = projection.apply(InternalRow(k, new GenericArrayData(vs.toArray)))
        dos.writeInt(u.getSizeInBytes)
        u.writeToStream(dos, writeBuffer)
      }
    }
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KeyedCapBuffer = {
    val buf = new KeyedCapBuffer
    if (primitiveLI) {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      buf.overflow = bb.get() != 0
      if (!buf.overflow) {
        while (bb.hasRemaining) {
          val k = bb.getLong
          val n = bb.getInt
          val acc = new mutable.ArrayBuffer[Any](n)
          var i = 0
          while (i < n) { acc += bb.getInt; i += 1 }
          buf.m.put(k, acc)
        }
      }
      return buf
    }
    val dis = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    buf.overflow = dis.readBoolean()
    if (!buf.overflow) {
      val vt = ArrayType(value.dataType, containsNull = false)
      while (dis.available() > 0) {
        val sz = dis.readInt()
        val arr = new Array[Byte](sz)
        dis.readFully(arr)
        val r = new UnsafeRow(2)
        r.pointTo(arr, sz)
        val k = InternalRow.copyValue(r.get(0, key.dataType))
        val vs = r.getArray(1)
        val acc = mutable.ArrayBuffer.empty[Any]
        var i = 0
        while (i < vs.numElements()) {
          acc += InternalRow.copyValue(vs.get(i, value.dataType))
          i += 1
        }
        buf.m.put(k, acc)
      }
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", key.dataType),
    StructField("vals", ArrayType(value.dataType, containsNull = false)))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "collect_by_key_capped"

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectByKeyCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectByKeyCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CollectByKeyCapped =
    copy(left = newLeft, right = newRight)
}

/** array<struct<key, cnt: long>> per group (cnt = input rows carrying
  * that key), or NULL once the group exceeds `cap` distinct keys — the
  * counting sibling of [[CollectByKeyCapped]], used by
  * [[graft.llm.Dedup.spanDupStats]] at `minDocs > 2` (the `minDocs = 2`
  * fast path needs no typed aggregate at all: one distinct doc ⇔
  * `min(doc) = max(doc)`, plain codegen'd min/max/count). */
case class CountByKeyCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KeyedCapBuffer]
  with UnaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def createAggregationBuffer(): KeyedCapBuffer = new KeyedCapBuffer

  // counts ride the shared buffer as a single-element ArrayBuffer(Long)
  private def cnt(vs: mutable.ArrayBuffer[Any]): Long =
    vs(0).asInstanceOf[Long]

  override def update(buf: KeyedCapBuffer, input: InternalRow): KeyedCapBuffer = {
    if (!buf.overflow) {
      val k = child.eval(input)
      if (k != null) {
        buf.m.get(k) match {
          case Some(vs) => vs(0) = cnt(vs) + 1L
          case None =>
            if (buf.m.size == cap) { buf.overflow = true; buf.m.clear() }
            else buf.m.put(InternalRow.copyValue(k), mutable.ArrayBuffer[Any](1L))
        }
      }
    }
    buf
  }

  override def merge(buf: KeyedCapBuffer, other: KeyedCapBuffer): KeyedCapBuffer = {
    if (buf.overflow || other.overflow) {
      buf.overflow = true; buf.m.clear()
    } else {
      val it = other.m.iterator
      while (it.hasNext && !buf.overflow) {
        val (k, vs) = it.next()
        buf.m.get(k) match {
          case Some(acc) => acc(0) = cnt(acc) + cnt(vs)
          case None =>
            if (buf.m.size == cap) { buf.overflow = true; buf.m.clear() }
            else buf.m.put(k, vs)
        }
      }
    }
    buf
  }

  override def eval(buf: KeyedCapBuffer): Any =
    if (buf.overflow) null
    else new GenericArrayData(buf.m.iterator.map { case (k, vs) =>
      InternalRow(k, cnt(vs)): Any
    }.toArray)

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](child.dataType, LongType))

  /** Fixed-width direct encoding for the long-keyed shape — see
    * [[CollectByKeyCapped]]'s twin comment; static in the child type, so
    * shuffle writers and readers always agree. */
  @transient private lazy val primitiveL = child.dataType == LongType

  override def serialize(obj: KeyedCapBuffer): Array[Byte] = {
    if (primitiveL) {
      if (obj.overflow) return Array[Byte](1)
      val bb = java.nio.ByteBuffer.allocate(1 + 16 * obj.m.size)
      bb.put(0: Byte)
      obj.m.foreach { case (k, vs) =>
        bb.putLong(k.asInstanceOf[Long]); bb.putLong(cnt(vs))
      }
      return bb.array()
    }
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeBoolean(obj.overflow)
    if (!obj.overflow) {
      val writeBuffer = new Array[Byte](4096)
      obj.m.foreach { case (k, vs) =>
        val u = projection.apply(InternalRow(k, cnt(vs)))
        dos.writeInt(u.getSizeInBytes)
        u.writeToStream(dos, writeBuffer)
      }
    }
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KeyedCapBuffer = {
    val buf = new KeyedCapBuffer
    if (primitiveL) {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      buf.overflow = bb.get() != 0
      if (!buf.overflow) {
        while (bb.hasRemaining) {
          buf.m.put(bb.getLong, mutable.ArrayBuffer[Any](bb.getLong))
        }
      }
      return buf
    }
    val dis = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    buf.overflow = dis.readBoolean()
    if (!buf.overflow) {
      while (dis.available() > 0) {
        val sz = dis.readInt()
        val arr = new Array[Byte](sz)
        dis.readFully(arr)
        val r = new UnsafeRow(2)
        r.pointTo(arr, sz)
        buf.m.put(InternalRow.copyValue(r.get(0, child.dataType)),
          mutable.ArrayBuffer[Any](r.getLong(1)))
      }
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", child.dataType),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "count_by_key_capped"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountByKeyCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountByKeyCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountByKeyCapped =
    copy(child = newChild)
}
