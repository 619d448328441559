package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch over a string column: at most
  * `capacity` (item, count) entries of state per aggregation buffer, with
  * the mergeable-summaries merge (pointwise add, then subtract the
  * (capacity+1)-th largest count and drop non-positive entries — Agarwal
  * et al., PODS'12). Estimated counts are within n/capacity of truth and
  * EXACT when the number of distinct items is <= capacity (no decrement
  * ever fires) — the contract the oracle-checked query relies on.
  *
  * The point at scale: corpus-wide heavy hitters with O(capacity) state
  * per partition and one tiny final merge — no shuffle keyed on the item
  * (a groupBy(token) moves every distinct token through an exchange; this
  * moves `capacity` entries per partition).
  */
case class MisraGries(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]]
  with ExpectsInputTypes {

  require(capacity >= 1, "capacity >= 1")

  // java.lang.Long, NOT scala Long: j.u.HashMap.get on a missing key
  // returns null, which scala Long silently unboxes to 0 — the null
  // check must see the box
  private type Buf = java.util.HashMap[UTF8String, java.lang.Long]

  override def children: Seq[Expression] = Seq(item)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = item.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String]
      val cur: java.lang.Long = buf.get(k)
      if (cur != null) buf.put(k, java.lang.Long.valueOf(cur.longValue() + 1L))
      else if (buf.size() < capacity) buf.put(k.clone(), java.lang.Long.valueOf(1L))
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur: java.lang.Long = buf.get(e.getKey)
      val base = if (cur == null) 0L else cur.longValue()
      buf.put(if (cur == null) e.getKey.clone() else e.getKey,
        java.lang.Long.valueOf(base + e.getValue.longValue()))
    }
    if (buf.size() > capacity) {
      // subtract the (capacity+1)-th largest count, drop <= 0
      val counts = new Array[Long](buf.size())
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next().longValue(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(buf, counts(buf.size() - capacity - 1))
    }
    buf
  }

  private def decrementAll(buf: Buf, by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue.longValue() - by
      if (nv <= 0L) it.remove() else e.setValue(java.lang.Long.valueOf(nv))
    }
  }

  override def eval(buf: Buf): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size())
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue.longValue()); i += 1
    }
    val sorted = entries.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2 else a._1.compareTo(b._1) < 0
    }
    new GenericArrayData(sorted.map { case (k, c) =>
      new GenericInternalRow(Array[Any](k, c))
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    var bytes = 4
    val it0 = buf.keySet().iterator()
    while (it0.hasNext) bytes += 4 + it0.next().numBytes() + 8
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      bb.putInt(kb.length); bb.put(kb); bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.put(UTF8String.fromBytes(kb), java.lang.Long.valueOf(bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}
