package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.core.Hashing

/** Deterministic affine-permutation parameters for SQL-portable MinHash:
  * `perm_j(h) = (a_j * h + b_j) mod 2^61-1` with a_j in [1, p-1], b_j in
  * [0, p-1] drawn from a fixed splitmix64 stream. Exposed so oracle SQL can
  * embed the identical constants and replay signatures in another engine
  * with exact 128-bit integer arithmetic.
  */
object MinHashPerm {
  import graft.core.Hashing.Mersenne61

  /** (a, b) arrays for k permutations; all a values first, then all b. */
  def params(k: Int): (Array[Long], Array[Long]) = {
    val rng = new Hashing.SplitMix64(0x6d696e68617368L) // ascii "minhash"
    val a = Array.fill(k)(java.lang.Long.remainderUnsigned(rng.next(), Mersenne61 - 1) + 1)
    val b = Array.fill(k)(java.lang.Long.remainderUnsigned(rng.next(), Mersenne61))
    (a, b)
  }
}

/** MinHash signature aggregate: one pass over (pre-hashed) shingle values per
  * group -> ARRAY<BIGINT> of `numHashes` minimums.
  *
  * Two permutation families, both O(k) integer ops per row with zero
  * allocation; merge is elementwise min — fully partial-aggregatable, no
  * shuffle of raw shingles:
  *  - default: murmur64 remix of (shingleHash + j * GOLDEN) — fastest;
  *  - `affine`: [[MinHashPerm]] permutations mod 2^61-1 — SQL-portable, so
  *    an independent engine can recompute identical signatures.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    affine: Boolean = false,
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

  @transient private lazy val (permA, permB) =
    if (affine) MinHashPerm.params(numHashes) else (null, null)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      if (affine) {
        val h61 = h & Hashing.Mersenne61
        while (j < numHashes) {
          val hj = Hashing.affineMod61(permA(j), h61, permB(j))
          if (hj < buf(j)) buf(j) = hj // affine values are < 2^61: signed min
          j += 1
        }
      } else {
        while (j < numHashes) {
          // independent-ish hash family: murmur finalizer of (h + j*golden)
          val hj = Hashing.murmur64(h + j * 0x9e3779b97f4a7c15L)
          if (java.lang.Long.compareUnsigned(hj, buf(j)) < 0) buf(j) = hj
          j += 1
        }
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
