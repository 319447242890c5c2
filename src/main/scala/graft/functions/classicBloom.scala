package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import graft.core.ClassicBloomFilter

/** Mutable classic-bloom aggregation state — SPARSE-UNTIL-DENSE (see
  * [[graft.functions.SparseKeys]]; a dense bit array per partial buffer
  * is per-core memory at large capacities). Value-mode buffers hold the
  * 64-bit value hashes (the filter derives its probe positions from that
  * hash, so replay is lossless).
  */
final class ClassicBloomBuf(var filter: ClassicBloomFilter) extends SparseKeys {
  def isEmpty: Boolean = filter == null && keyCount == 0
}

/** SQL: `bloomfilter(capacity, fpr, value_or_blob)` — the reference's
  * written-but-disabled classic bloom family
  * (src/bitfilters_bloom_filter.cpp, disabled at CMakeLists.txt:18-19),
  * shipped here for surface completeness. Like the reference: capacity/fpr
  * are constants, a BINARY third argument switches to the OR-merge overload
  * (cpp:180-218), typed values are accepted directly (hashed internally, no
  * pre-hash step needed — the only family with that property, cpp:336-345).
  */
case class ClassicBloomFilterAgg(
    capacityExpr: Expression,
    fprExpr: Expression,
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ClassicBloomBuf] {

  override def children: Seq[Expression] = Seq(capacityExpr, fprExpr, child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bloomfilter"

  private lazy val capacity: Long = AggUtil.foldableLong(capacityExpr, "Bloom filter capacity")
  private lazy val fpr: Double = capacityToDouble(fprExpr.eval(null))
  private lazy val mergeMode: Boolean = child.dataType == BinaryType
  @transient private lazy val hasher: Any => Long =
    if (mergeMode) null else HashDispatch.hasherFor(child.dataType, "bloomfilter")

  private def capacityToDouble(v: Any): Double = v match {
    case null => throw new IllegalArgumentException("Bloom false positive rate cannot be NULL")
    case d: Double => d
    case f: Float => f.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case other => throw new IllegalArgumentException(s"Bloom false positive rate must be numeric, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val f0 = AggUtil.checkFoldable(capacityExpr, "Bloom filter capacity")
    if (f0 != TypeCheckResult.TypeCheckSuccess) return f0
    val f1 = AggUtil.checkFoldable(fprExpr, "Bloom false positive rate")
    if (f1 != TypeCheckResult.TypeCheckSuccess) return f1
    if (child.dataType == BinaryType || HashDispatch.supported(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloomfilter value must be a numeric/string/binary type or BINARY filter blob, got ${child.dataType.sql}")
  }

  override def createAggregationBuffer(): ClassicBloomBuf = new ClassicBloomBuf(null)

  /** Keys beyond this outgrow the dense bit array (8 B/key vs bits/8). */
  private lazy val denseThreshold: Long =
    math.max(1L, ClassicBloomFilter.capacityFor(capacity, fpr) / 64)

  private def densify(buf: ClassicBloomBuf): Unit = {
    if (buf.filter == null) buf.filter = ClassicBloomFilter.create(capacity, fpr)
    var i = 0
    while (i < buf.keyCount) { buf.filter.insert(buf.keys(i)); i += 1 }
    buf.clearKeys()
  }

  override def update(buf: ClassicBloomBuf, input: InternalRow): ClassicBloomBuf = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeMode) {
        if (buf.filter == null) buf.filter = ClassicBloomFilter.create(capacity, fpr)
        buf.filter.orMerge(ClassicBloomFilter.deserialize(v.asInstanceOf[Array[Byte]]))
      } else if (buf.filter != null) {
        buf.filter.insert(hasher(v))
      } else {
        buf.appendKey(hasher(v))
        if (buf.keyCount >= denseThreshold) densify(buf)
      }
    }
    buf
  }

  override def merge(buf: ClassicBloomBuf, other: ClassicBloomBuf): ClassicBloomBuf = {
    if (!other.isEmpty) {
      if (buf.filter == null && other.filter == null) {
        var i = 0
        while (i < other.keyCount) { buf.appendKey(other.keys(i)); i += 1 }
        if (buf.keyCount >= denseThreshold) densify(buf)
      } else if (buf.filter == null) {
        if (buf.keyCount == 0) buf.filter = other.filter
        else { densify(buf); buf.filter.orMerge(other.filter) }
      } else if (other.filter == null) {
        var i = 0
        while (i < other.keyCount) { buf.filter.insert(other.keys(i)); i += 1 }
      } else {
        buf.filter.orMerge(other.filter)
      }
    }
    buf
  }

  override def eval(buf: ClassicBloomBuf): Any =
    if (buf.isEmpty) null
    else {
      if (buf.filter == null) densify(buf)
      buf.filter.serialize()
    }

  // shuffle wire format (internal): [mode:1][mode=0: keyCount×8 hashes |
  // mode=1: filter blob]
  override def serialize(buf: ClassicBloomBuf): Array[Byte] =
    if (buf.isEmpty) Array.emptyByteArray
    else if (buf.filter == null) {
      val out = java.nio.ByteBuffer.allocate(1 + 8 * buf.keyCount)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(0.toByte)
      var i = 0
      while (i < buf.keyCount) { out.putLong(buf.keys(i)); i += 1 }
      out.array()
    } else {
      val blob = buf.filter.serialize()
      val out = java.nio.ByteBuffer.allocate(1 + blob.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(1.toByte).put(blob)
      out.array()
    }
  override def deserialize(bytes: Array[Byte]): ClassicBloomBuf =
    if (bytes.isEmpty) new ClassicBloomBuf(null)
    else if (bytes(0) == 0) {
      val bb = java.nio.ByteBuffer.wrap(bytes, 1, bytes.length - 1)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val buf = new ClassicBloomBuf(null)
      while (bb.remaining() >= 8) buf.appendKey(bb.getLong())
      if (buf.keyCount >= denseThreshold) densify(buf)
      buf
    } else
      new ClassicBloomBuf(ClassicBloomFilter.deserialize(
        java.util.Arrays.copyOfRange(bytes, 1, bytes.length)))

  override def withNewMutableAggBufferOffset(newOffset: Int): ClassicBloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ClassicBloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ClassicBloomFilterAgg =
    copy(capacityExpr = newChildren(0), fprExpr = newChildren(1), child = newChildren(2))
}

/** SQL: `bloom_filter_contains(filter, value)` — typed-value probe for the
  * classic bloom family (reference cpp:246-294).
  */
case class ClassicBloomContains(left: Expression, right: Expression)
  extends FilterContainsExpression {

  override def prettyName: String = "bloom_filter_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"bloom_filter_contains filter argument must be BINARY, got ${left.dataType.sql}")
    else if (!HashDispatch.supported(right.dataType))
      TypeCheckResult.TypeCheckFailure(s"bloom_filter_contains: unsupported value type ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val hasher: Any => Long =
    HashDispatch.hasherFor(right.dataType, "bloom_filter_contains")

  override protected def probe(blob: Array[Byte], hash: Long): Boolean =
    ClassicBloomFilter.probeBlob(blob, hash)
  override protected def probeCall(f: String, h: String): String =
    s"graft.core.ClassicBloomFilter.probeBlob($f, $h)"
  override protected def hashOf(v: Any): Long = hasher(v)
  override protected def hashCall(term: String): String =
    HashDispatch.hashCallJava(right.dataType, term)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ClassicBloomContains =
    copy(left = l, right = r)
}
