package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core._

/** Growable unboxed key buffer used by the xor/fuse aggregates: construction
  * happens only at finalize, so partial-aggregate state is just the raw keys
  * (reference buffers identically: src/bitfilters_xor_filter.cpp:127-132).
  */
final class LongKeyBuffer(var arr: Array[Long], var n: Int) {
  def this() = this(new Array[Long](16), 0)

  def add(v: Long): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(n) = v
    n += 1
  }

  def addAll(o: LongKeyBuffer): Unit = {
    if (n + o.n > arr.length) {
      val target = math.max(arr.length * 2L, (n + o.n).toLong)
      if (target > Int.MaxValue - 8) throw new IllegalStateException(
        "filter aggregate key buffer exceeds 2^31 keys per group; split the group")
      arr = java.util.Arrays.copyOf(arr, target.toInt)
    }
    System.arraycopy(o.arr, 0, arr, n, o.n)
    n += o.n
  }

  def serialize(): Array[Byte] = {
    val out = new Array[Byte](8 * n)
    ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().put(arr, 0, n)
    out
  }
}

object LongKeyBuffer {
  def deserialize(bytes: Array[Byte]): LongKeyBuffer = {
    val n = bytes.length / 8
    val arr = new Array[Long](math.max(n, 16))
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(arr, 0, n)
    new LongKeyBuffer(arr, n)
  }
}

private[graft] object AggUtil {
  /** Evaluate a required-foldable constructor argument. */
  def foldableLong(e: Expression, what: String): Long = e.eval(null) match {
    case null => throw new IllegalArgumentException(s"$what cannot be NULL")
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalArgumentException(s"$what must be an integer constant, got $other")
  }

  /** Evaluate a required-foldable boolean constructor argument. */
  def foldableBoolean(e: Expression, what: String): Boolean = e.eval(null) match {
    case null => throw new IllegalArgumentException(s"$what cannot be NULL")
    case b: Boolean => b
    case other => throw new IllegalArgumentException(s"$what must be a boolean constant, got $other")
  }

  def foldableString(e: Expression, what: String): String = e.eval(null) match {
    case null => throw new IllegalArgumentException(s"$what cannot be NULL")
    case s: UTF8String => s.toString
    case s: String => s
    case other => throw new IllegalArgumentException(s"$what must be a string constant, got $other")
  }

  def checkFoldable(e: Expression, what: String): TypeCheckResult =
    if (!e.foldable) TypeCheckResult.TypeCheckFailure(s"$what must be a foldable constant expression")
    else TypeCheckResult.TypeCheckSuccess

  def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  def checkHashInput(prettyName: String, child: Expression): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a BIGINT hash argument, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
}

/** SQL: `xor8_filter(hash)` / `xor16_filter(hash)` — aggregates pre-hashed
  * u64 keys into a serialized xor filter BLOB.
  * Reference: src/bitfilters_xor_filter.cpp:104-183,263-289.
  */
case class XorFilterAgg(
    child: Expression,
    bits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongKeyBuffer] {

  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult = AggUtil.checkHashInput(prettyName, child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = s"xor${bits}_filter"

  override def createAggregationBuffer(): LongKeyBuffer = new LongKeyBuffer()

  override def update(buf: LongKeyBuffer, input: InternalRow): LongKeyBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long]) // aggregates ignore NULL inputs
    buf
  }

  override def merge(buf: LongKeyBuffer, other: LongKeyBuffer): LongKeyBuffer = {
    buf.addAll(other); buf
  }

  override def eval(buf: LongKeyBuffer): Any =
    if (buf.n == 0) null // empty group finalizes to NULL
    else XorFilter.build(bits, java.util.Arrays.copyOf(buf.arr, buf.n), buf.n).serialize()

  override def serialize(buf: LongKeyBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): LongKeyBuffer = LongKeyBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): XorFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): XorFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): XorFilterAgg =
    copy(child = newChildren.head)
}

/** SQL: `binary_fuse8_filter(hash)` / `binary_fuse16_filter(hash)`.
  * Reference: src/bitfilters_binary_fuse_filter.cpp:104-184,265-291.
  */
case class BinaryFuseFilterAgg(
    child: Expression,
    bits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongKeyBuffer] {

  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult = AggUtil.checkHashInput(prettyName, child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = s"binary_fuse${bits}_filter"

  override def createAggregationBuffer(): LongKeyBuffer = new LongKeyBuffer()

  override def update(buf: LongKeyBuffer, input: InternalRow): LongKeyBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: LongKeyBuffer, other: LongKeyBuffer): LongKeyBuffer = {
    buf.addAll(other); buf
  }

  override def eval(buf: LongKeyBuffer): Any =
    if (buf.n == 0) null
    else BinaryFuseFilter.build(bits, java.util.Arrays.copyOf(buf.arr, buf.n), buf.n).serialize()

  override def serialize(buf: LongKeyBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): LongKeyBuffer = LongKeyBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BinaryFuseFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BinaryFuseFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BinaryFuseFilterAgg =
    copy(child = newChildren.head)
}

/** Mutable quotient aggregation state — SPARSE-UNTIL-DENSE (see
  * [[SparseKeys]]; a dense 2^q table per partial buffer is per-core
  * memory: q=28, r=8 is ~370 MB per buffer). Hash-mode buffers hold raw
  * keys (insert only uses the low q+r bits, so raw keys replay
  * losslessly); the blob-merge overload is dense from the first row by
  * nature.
  */
final class QuotientBuf(var filter: QuotientFilter) extends SparseKeys {
  def isEmpty: Boolean = filter == null && keyCount == 0
}

/** SQL: `quotient_filter(q, r, hash_or_blob[, strict])` — like the
  * reference, a single name with two overloads resolved by the third
  * argument's type (src/bitfilters_quotient_filter.cpp:269-289): LongType
  * input inserts hashes; BinaryType input union-merges existing filter
  * blobs. `strict` (default false = reference parity) makes a merge that
  * overflows the destination table RAISE instead of silently dropping
  * keys (the reference ignores insert() failures during merge,
  * quotient_filter.cpp:399,403).
  */
case class QuotientFilterAgg(
    qExpr: Expression,
    rExpr: Expression,
    child: Expression,
    strict: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuotientBuf] {

  override def children: Seq[Expression] = Seq(qExpr, rExpr, child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "quotient_filter"

  private lazy val q: Int = AggUtil.foldableLong(qExpr, "quotient_filter q").toInt
  private lazy val r: Int = AggUtil.foldableLong(rExpr, "quotient_filter r").toInt
  private lazy val mergeMode: Boolean = child.dataType == BinaryType

  override def checkInputDataTypes(): TypeCheckResult = {
    val f1 = AggUtil.checkFoldable(qExpr, "quotient_filter q")
    if (f1 != TypeCheckResult.TypeCheckSuccess) return f1
    val f2 = AggUtil.checkFoldable(rExpr, "quotient_filter r")
    if (f2 != TypeCheckResult.TypeCheckSuccess) return f2
    if (!AggUtil.isIntegral(qExpr.dataType) || !AggUtil.isIntegral(rExpr.dataType))
      return TypeCheckResult.TypeCheckFailure("quotient_filter q and r must be integers")
    child.dataType match {
      case LongType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quotient_filter third argument must be BIGINT (hashes) or BINARY (filter blobs), got ${other.sql}")
    }
  }

  override def createAggregationBuffer(): QuotientBuf = new QuotientBuf(null)

  /** Key list longer than this outgrows the dense table (8 B/key vs
    * 2^q*(r+3)/8 table bytes); tiny q floors at 1 so full-filter errors
    * still surface during update.
    */
  private lazy val denseThreshold: Long = math.max(1L, ((1L << q) * (r + 3)) / 64)

  private def insertOrThrow(f: QuotientFilter, h: Long): Unit =
    if (!f.insert(h))
      throw new IllegalStateException(
        "Failed to insert item into quotient filter, likely it is full")

  private def densify(buf: QuotientBuf): Unit = {
    if (buf.filter == null) buf.filter = QuotientFilter.create(q, r)
    var i = 0
    while (i < buf.keyCount) { insertOrThrow(buf.filter, buf.keys(i)); i += 1 }
    buf.clearKeys()
  }

  override def update(buf: QuotientBuf, input: InternalRow): QuotientBuf = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeMode) {
        if (buf.filter == null) buf.filter = QuotientFilter.create(q, r)
        buf.filter = buf.filter.merge(
          QuotientFilter.deserialize(v.asInstanceOf[Array[Byte]]), strict)
      } else if (buf.filter != null) {
        insertOrThrow(buf.filter, v.asInstanceOf[Long])
      } else {
        buf.appendKey(v.asInstanceOf[Long])
        if (buf.keyCount >= denseThreshold) densify(buf)
      }
    }
    buf
  }

  override def merge(buf: QuotientBuf, other: QuotientBuf): QuotientBuf = {
    if (!other.isEmpty) {
      if (buf.filter == null && other.filter == null) {
        var i = 0
        while (i < other.keyCount) { buf.appendKey(other.keys(i)); i += 1 }
        if (buf.keyCount >= denseThreshold) densify(buf)
      } else if (buf.filter == null) {
        if (buf.keyCount == 0) buf.filter = other.filter
        else { densify(buf); buf.filter = buf.filter.merge(other.filter, strict) }
      } else if (other.filter == null) {
        var i = 0
        while (i < other.keyCount) { insertOrThrow(buf.filter, other.keys(i)); i += 1 }
      } else {
        buf.filter = buf.filter.merge(other.filter, strict)
      }
    }
    buf
  }

  override def eval(buf: QuotientBuf): Any =
    if (buf.isEmpty) null
    else {
      if (buf.filter == null) densify(buf)
      buf.filter.serialize()
    }

  // Partial-state shuffle format: compact [u8 q][u8 r][u64 values...] —
  // stored (quotient<<r | remainder) values for dense buffers, raw keys for
  // sparse ones (insert() masks to the low q+r bits, so both replay
  // identically). NOT the dense table blob: a near-full q=24 filter is
  // ~22MB dense but entries*8 bytes compact, and the final-side rebuild
  // costs the same inserts an absorb-merge pays anyway.
  override def serialize(buf: QuotientBuf): Array[Byte] =
    if (buf.isEmpty) Array.emptyByteArray
    else if (buf.filter == null) {
      val out = ByteBuffer.allocate(2 + 8 * buf.keyCount).order(ByteOrder.LITTLE_ENDIAN)
      out.put(q.toByte).put(r.toByte)
      var i = 0
      while (i < buf.keyCount) { out.putLong(buf.keys(i)); i += 1 }
      out.array()
    } else {
      val f = buf.filter
      val out = ByteBuffer.allocate(2 + 8 * f.entries.toInt).order(ByteOrder.LITTLE_ENDIAN)
      out.put(f.qbits.toByte).put(f.rbits.toByte)
      val it = new graft.core.QuotientFilterIterator(f)
      while (!it.done) out.putLong(it.next())
      out.array()
    }
  override def deserialize(bytes: Array[Byte]): QuotientBuf =
    if (bytes.isEmpty) new QuotientBuf(null)
    else {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val sq = bb.get() & 0xff
      val sr = bb.get() & 0xff
      if (sq == q && sr == r) {
        // stay sparse across the shuffle: the final task then densifies
        // once, instead of once per incoming partial
        val buf = new QuotientBuf(null)
        while (bb.remaining() >= 8) buf.appendKey(bb.getLong())
        if (buf.keyCount >= denseThreshold) densify(buf)
        buf
      } else {
        // merge-overload partials can carry grown (q,r); rebuild dense
        val f = QuotientFilter.create(sq, sr)
        while (bb.remaining() >= 8) f.insert(bb.getLong())
        new QuotientBuf(f)
      }
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuotientFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuotientFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuotientFilterAgg =
    copy(qExpr = newChildren(0), rExpr = newChildren(1), child = newChildren(2))
}

/** Growable raw-key list shared by the SPARSE-UNTIL-DENSE aggregation
  * buffers (bloom / quotient / classic bloom). Rationale: dense filter
  * state is allocated per partial-aggregation buffer — i.e. PER CORE — so
  * at 2^26 bloom sectors every core holds 512 MB during the partial phase
  * (16 GB on a 32-core executor, an OOM observed in the 50M-key smoke,
  * graft.tools.BigGroupSmoke). Buffers therefore start as this raw key
  * list (8 B per inserted key — also far smaller on the shuffle wire for
  * small groups) and DENSIFY once the list would outgrow the dense
  * structure, capping partial memory at min(8*keys, dense size) + O(1).
  * Insertion order never affects the final bits (pure OR / set union), so
  * results are byte-identical on every path.
  */
trait SparseKeys {
  var keys: Array[Long] = null
  var keyCount: Int = 0

  final def appendKey(h: Long): Unit = {
    if (keys == null) keys = new Array[Long](64)
    else if (keyCount == keys.length) keys = java.util.Arrays.copyOf(keys, keys.length * 2)
    keys(keyCount) = h
    keyCount += 1
  }

  final def clearKeys(): Unit = { keys = null; keyCount = 0 }
}

/** Mutable bloom aggregation state (see [[SparseKeys]]). */
final class BloomBuf(var filter: DuckDbBloomFilter, var count: Long) extends SparseKeys {

  def densify(numSectors: Int): Unit = {
    if (filter == null) filter = DuckDbBloomFilter.create(numSectors)
    var i = 0
    while (i < keyCount) { filter.insert(keys(i)); i += 1 }
    clearKeys()
  }

  def isEmpty: Boolean = filter == null && keyCount == 0
}

/** SQL: `bitfilters_duckdb_bloom_filter_create(version, num_sectors, hash)`.
  * Reference: src/bitfilters_duckdb_bloom_filter.cpp:474-626.
  */
case class DuckDbBloomFilterCreateAgg(
    versionExpr: Expression,
    sectorsExpr: Expression,
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuf] {

  override def children: Seq[Expression] = Seq(versionExpr, sectorsExpr, child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bitfilters_duckdb_bloom_filter_create"

  private lazy val numSectors: Int = {
    val n = AggUtil.foldableLong(sectorsExpr, "num_sectors")
    if (n <= 0 || (n & (n - 1)) != 0)
      throw new IllegalArgumentException(
        s"bitfilters_duckdb_bloom_filter_create: num_sectors must be a power of 2, got $n")
    n.toInt
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val f0 = AggUtil.checkFoldable(versionExpr, "version")
    if (f0 != TypeCheckResult.TypeCheckSuccess) return f0
    if (versionExpr.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure("version must be a constant string")
    DuckDbHash.requireSupported(AggUtil.foldableString(versionExpr, "version"))
    val f1 = AggUtil.checkFoldable(sectorsExpr, "num_sectors")
    if (f1 != TypeCheckResult.TypeCheckSuccess) return f1
    if (!AggUtil.isIntegral(sectorsExpr.dataType))
      return TypeCheckResult.TypeCheckFailure("num_sectors must be a constant integer")
    if (child.dataType != LongType)
      return TypeCheckResult.TypeCheckFailure(
        s"hash argument must be BIGINT (use bitfilters_duckdb_hash), got ${child.dataType.sql}")
    TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): BloomBuf = new BloomBuf(null, 0L)

  override def update(buf: BloomBuf, input: InternalRow): BloomBuf = {
    val v = child.eval(input)
    if (v != null) {
      buf.count += 1
      if (buf.filter != null) buf.filter.insert(v.asInstanceOf[Long])
      else {
        buf.appendKey(v.asInstanceOf[Long])
        if (buf.keyCount >= numSectors) buf.densify(numSectors)
      }
    }
    buf
  }

  override def merge(buf: BloomBuf, other: BloomBuf): BloomBuf = {
    if (!other.isEmpty) {
      buf.count += other.count
      if (buf.filter == null && other.filter == null) {
        var i = 0
        while (i < other.keyCount) { buf.appendKey(other.keys(i)); i += 1 }
        if (buf.keyCount >= numSectors) buf.densify(numSectors)
      } else {
        if (buf.filter == null) buf.densify(numSectors)
        if (other.filter != null) buf.filter.orMerge(other.filter)
        else {
          var i = 0
          while (i < other.keyCount) { buf.filter.insert(other.keys(i)); i += 1 }
        }
      }
    }
    buf
  }

  override def eval(buf: BloomBuf): Any =
    if (buf.isEmpty) null
    else {
      if (buf.filter == null) buf.densify(numSectors)
      buf.filter.serialize()
    }

  // shuffle wire format (internal, same-version only):
  //   [count:8][mode:1][mode=0: keyCount×8 raw keys | mode=1: filter blob]
  override def serialize(buf: BloomBuf): Array[Byte] =
    if (buf.isEmpty) Array.emptyByteArray
    else if (buf.filter == null) {
      val out = ByteBuffer.allocate(9 + 8 * buf.keyCount).order(ByteOrder.LITTLE_ENDIAN)
      out.putLong(buf.count).put(0.toByte)
      var i = 0
      while (i < buf.keyCount) { out.putLong(buf.keys(i)); i += 1 }
      out.array()
    } else {
      val blob = buf.filter.serialize()
      val out = ByteBuffer.allocate(9 + blob.length).order(ByteOrder.LITTLE_ENDIAN)
      out.putLong(buf.count).put(1.toByte).put(blob)
      out.array()
    }

  override def deserialize(bytes: Array[Byte]): BloomBuf =
    if (bytes.isEmpty) new BloomBuf(null, 0L)
    else {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val count = bb.getLong
      val mode = bb.get()
      if (mode == 0) {
        val buf = new BloomBuf(null, count)
        while (bb.remaining() >= 8) buf.appendKey(bb.getLong())
        buf
      } else
        new BloomBuf(DuckDbBloomFilter.deserialize(java.util.Arrays.copyOfRange(bytes, 9, bytes.length)), count)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): DuckDbBloomFilterCreateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DuckDbBloomFilterCreateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DuckDbBloomFilterCreateAgg =
    copy(versionExpr = newChildren(0), sectorsExpr = newChildren(1), child = newChildren(2))
}
