package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import java.util.PriorityQueue

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-memory grouped top-k: the k payload ids with the highest
  * scores per group, ordered (score desc, payload asc); ties on score
  * keep the smaller payload.
  *
  * A TypedImperativeAggregate holding a size-k heap per group: O(k)
  * state regardless of group size, partial aggregation on the map side
  * (each partition ships at most k candidates into the shuffle), and
  * incremental updates — usable in Structured Streaming update mode,
  * where a window-rank formulation (sort every group on every trigger)
  * cannot run. This is the "incremental top-k similarity" shape from the
  * EDBT'20 / ICDE'21 top-k literature (see PAPERS.md), expressed as a
  * native Spark aggregate.
  */
case class TopKByScore(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[(Double, Long)]]
  with ExpectsInputTypes {

  require(k >= 1, "k >= 1")

  override def children: Seq[Expression] = Seq(score, payload)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by"

  // heap head = the entry to evict first = lowest score, then largest
  // payload (since ties prefer the smaller payload)
  private def ordering = new java.util.Comparator[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  override def createAggregationBuffer(): PriorityQueue[(Double, Long)] =
    new PriorityQueue[(Double, Long)](k + 1, ordering)

  private def offer(heap: PriorityQueue[(Double, Long)], s: Double, p: Long): Unit = {
    heap.add((s, p))
    if (heap.size() > k) heap.poll()
  }

  override def update(heap: PriorityQueue[(Double, Long)],
      input: InternalRow): PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    // NaN compares above every real score — skip it rather than let a
    // broken score occupy top-k slots
    if (s != null && p != null && !s.asInstanceOf[Double].isNaN)
      offer(heap, s.asInstanceOf[Double], p.asInstanceOf[Long])
    heap
  }

  override def merge(heap: PriorityQueue[(Double, Long)],
      other: PriorityQueue[(Double, Long)]): PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (s, p) = it.next(); offer(heap, s, p) }
    heap
  }

  override def eval(heap: PriorityQueue[(Double, Long)]): Any = {
    val arr = new Array[(Double, Long)](heap.size())
    heap.toArray(arr)
    val sorted = arr.sortWith { (a, b) =>
      if (a._1 != b._1) a._1 > b._1 else a._2 < b._2
    }
    new GenericArrayData(sorted.map(_._2))
  }

  override def serialize(heap: PriorityQueue[(Double, Long)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + heap.size() * 16)
    buf.putInt(heap.size())
    val it = heap.iterator()
    while (it.hasNext) { val (s, p) = it.next(); buf.putDouble(s); buf.putLong(p) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[(Double, Long)] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val heap = createAggregationBuffer()
    (0 until n).foreach(_ => heap.add((buf.getDouble, buf.getLong)))
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), payload = newChildren(1))
}
