package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.core.Hashing

/** MinHash signature aggregate: one pass over (pre-hashed) shingle values per
  * group -> ARRAY<BIGINT> of `numHashes` minimums.
  *
  * The k hash functions are derived from the single input hash with a
  * splitmix64-style remix of (shingleHash + j * GOLDEN), so update cost is
  * O(k) integer ops with zero allocation; merge is elementwise min — fully
  * partial-aggregatable, no shuffle of raw shingles.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numHashes > 0 && numHashes <= 1024, "numHashes must be in (0, 1024]")

  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"minhash_agg requires a BIGINT hash argument, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < numHashes) {
        // independent-ish hash family: murmur finalizer of (h + j*golden)
        val hj = Hashing.murmur64(h + j * 0x9e3779b97f4a7c15L)
        if (java.lang.Long.compareUnsigned(hj, buf(j)) < 0) buf(j) = hj
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      if (java.lang.Long.compareUnsigned(other(j), buf(j)) < 0) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.forall(_ == Long.MaxValue)) null else new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](8 * numHashes)
    ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().put(buf)
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val arr = new Array[Long](numHashes)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(arr)
    arr
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

/** SimHash aggregate: 64-bit document fingerprint from per-token hashes.
  * Each token hash votes +1/-1 on each of 64 bit positions; the sign of each
  * accumulated vote becomes the fingerprint bit. Near-duplicate documents
  * have fingerprints within a small Hamming distance.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"simhash_agg requires a BIGINT hash argument, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  // votes[64] + a count slot to distinguish the empty group
  override def createAggregationBuffer(): Array[Int] = new Array[Int](65)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
        b += 1
      }
      buf(64) += 1
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var b = 0
    while (b < 65) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any =
    if (buf(64) == 0) null
    else {
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (buf(b) > 0) fp |= 1L << b
        b += 1
      }
      fp
    }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](4 * 65)
    ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN).asIntBuffer().put(buf)
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val arr = new Array[Int](65)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asIntBuffer().get(arr)
    arr
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}
