package org.apache.spark.sql.graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bit-set kernels shared by the aggregate, the probe expression, and
  * generated Java. Probe index j is floorMod(xxh64(h, seed=j), numBits) —
  * k cheap long remixes of an already-hashed key, the standard
  * partitioned-seed bloom construction.
  */
object BloomUtil {

  def set(bits: Array[Long], h: Long, numHashes: Int): Unit = {
    val numBits = bits.length.toLong * 64L
    var j = 0
    while (j < numHashes) {
      val idx = java.lang.Math.floorMod(XXH64.hashLong(h, j.toLong), numBits).toInt
      bits(idx >> 6) |= (1L << (idx & 63))
      j += 1
    }
  }

  /** [[mightContain]] over a SET of pre-hashed keys: true when ANY may be
    * in the filter. One call per (filter, key set) instead of a key-count
    * OR-chain of probe expressions — the codegen-safe shape for a
    * 100k-key runtime file-pruning probe ([[BloomMightContainAny]]). */
  def mightContainAny(bytes: Array[Byte],
      hashes: org.apache.spark.sql.catalyst.util.ArrayData,
      numHashes: Int): Boolean = {
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      if (!hashes.isNullAt(i) &&
          mightContain(bytes, hashes.getLong(i), numHashes)) return true
      i += 1
    }
    false
  }

  /** Probe directly on the serialized little-endian bytes — no
    * deserialization per row (byte b of an LE word holds bits b*8..b*8+7,
    * so global bit idx lives at bytes[idx >> 3] bit (idx & 7)). */
  def mightContain(bytes: Array[Byte], h: Long, numHashes: Int): Boolean = {
    val numBits = bytes.length.toLong * 8L
    if (numBits == 0) return false
    var j = 0
    while (j < numHashes) {
      val idx = java.lang.Math.floorMod(XXH64.hashLong(h, j.toLong), numBits).toInt
      if (((bytes(idx >> 3) >> (idx & 7)) & 1) == 0) return false
      j += 1
    }
    true
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(bits.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.asLongBuffer().put(bits)
    buf.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bits = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(bits)
    bits
  }
}

/** Bloom filter over a pre-hashed long column, as a TypedImperativeAggregate
  * producing the filter's bytes (BinaryType). The distributed-join killer
  * for "new batch vs. historical corpus" membership at scale: the filter is
  * built with map-side partials (merge = word-wise OR), broadcast once
  * (numBits/8 bytes regardless of corpus size), and probed per row without
  * shuffling the probe side. False positives are expected — callers must
  * exact-verify the survivors (see Dedup.incrementalDups); false negatives
  * cannot happen.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes >= 1, "numHashes >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_filter_build"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(bits: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.set(bits, v.asInstanceOf[Long], numHashes)
    bits
  }

  override def merge(bits: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits.length) { bits(i) |= other(i); i += 1 }
    bits
  }

  override def eval(bits: Array[Long]): Any = BloomUtil.toBytes(bits)

  override def serialize(bits: Array[Long]): Array[Byte] = BloomUtil.toBytes(bits)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomUtil.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Codegen'd bloom probe: true when `hash` may be in the filter built by
  * [[BloomFilterAgg]] with the same numHashes. Reads the filter bytes in
  * place — no per-row deserialization.
  */
case class BloomMightContain(bloom: Expression, hash: Expression, numHashes: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(numHashes >= 1, "numHashes >= 1")

  override def left: Expression = bloom
  override def right: Expression = hash
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(b: Any, h: Any): Any =
    BloomUtil.mightContain(b.asInstanceOf[Array[Byte]], h.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = org.apache.spark.sql.graft.BloomUtil.mightContain($b, $h, $numHashes);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(bloom = l, hash = r)
}

/** Codegen'd any-of-set bloom probe: true when ANY hash of an
  * array<long> key set may be in the filter. The runtime-file-pruning
  * probe shape: a lookup-join's collected key hashes travel as ONE array
  * literal evaluated once per manifest row, where the equivalent
  * per-key OR-chain would hand codegen a key-count-sized expression tree
  * (10k+ keys = method-size blowup or compile failure). Same
  * no-false-negatives contract as [[BloomMightContain]]; null hash
  * entries are skipped; an empty set is contained nowhere (false).
  */
case class BloomMightContainAny(bloom: Expression, hashes: Expression, numHashes: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(numHashes >= 1, "numHashes >= 1")

  override def left: Expression = bloom
  override def right: Expression = hashes
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, ArrayType(LongType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_any"

  override def nullSafeEval(b: Any, hs: Any): Any =
    BloomUtil.mightContainAny(b.asInstanceOf[Array[Byte]],
      hs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, hs) =>
      s"${ev.value} = org.apache.spark.sql.graft.BloomUtil.mightContainAny($b, $hs, $numHashes);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(bloom = l, hashes = r)
}
