package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Upper-triangle Gram accumulator state: one flat array of
  * dim·(dim+1)/2 running sums (doubles, or exact e6-micropoint longs in
  * replay mode), laid out row-major over pairs (i, j), i <= j. Grows if a
  * longer vector arrives (entries are remapped; ragged inputs contribute
  * to the pairs they have).
  */
final class GramBuf(var dim: Int, var d: Array[Double], var l: Array[Long]) {
  def this() = this(0, null, null)

  @inline def idx(i: Int, j: Int): Int = i * dim - i * (i - 1) / 2 + (j - i)

  private def ensure(n: Int, longs: Boolean): Unit = {
    if (n <= dim) return
    val od = dim; val odArr = d; val olArr = l
    dim = n
    val size = n * (n + 1) / 2
    if (longs) l = new Array[Long](size) else d = new Array[Double](size)
    var i = 0
    while (i < od) {
      var j = i
      while (j < od) {
        val oi = i * od - i * (i - 1) / 2 + (j - i)
        if (longs) l(idx(i, j)) = olArr(oi) else d(idx(i, j)) = odArr(oi)
        j += 1
      }
      i += 1
    }
  }

  /** Accumulate one vector's upper-triangle products. Entries with a NULL
    * element on either side are skipped — the semantics of the SQL form
    * this replaces (`sum` ignores NULL products).
    */
  def addRow(arr: ArrayData, roundE6: Boolean): Unit = {
    val n = arr.numElements()
    if (n == 0) return
    ensure(n, roundE6)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val xi = arr.getDouble(i)
        var j = i
        while (j < n) {
          if (!arr.isNullAt(j)) {
            val p = xi * arr.getDouble(j)
            val k = idx(i, j)
            if (roundE6) l(k) += math.floor(p * 1000000.0 + 0.5).toLong
            else d(k) += p
          }
          j += 1
        }
      }
      i += 1
    }
  }

  def merge(other: GramBuf, roundE6: Boolean): Unit = {
    if (other.dim == 0) return
    ensure(other.dim, roundE6)
    var i = 0
    while (i < other.dim) {
      var j = i
      while (j < other.dim) {
        val k = idx(i, j); val ok = other.idx(i, j)
        if (roundE6) l(k) += other.l(ok) else d(k) += other.d(ok)
        j += 1
      }
      i += 1
    }
  }
}

/** One-pass upper-triangle Gram (second-moment) aggregate over an
  * ARRAY<DOUBLE> column: one fused multiply-add sweep per row over dim
  * fields, state is dim·(dim+1)/2 numbers per (partition, group) — the
  * partial phase collapses every partition to ONE buffer before the
  * exchange, so the shuffle carries O(dim² · partitions), never O(rows).
  * Replaces the explode-into-2,080-structs-per-row Generate + hash-agg
  * form, which paid row-machinery costs ~3 orders of magnitude above the
  * arithmetic.
  *
  * `roundE6 = true` is the cross-engine replay mode: each per-row product
  * is rounded to an integer micropoint (`floor(p·1e6 + 0.5)` — half-up
  * via floor, the only rounding identical in every engine) and summed as
  * exact BIGINT, independent of partitioning and summation order.
  *
  * Returns ARRAY<STRUCT<i INT, j INT, v DOUBLE|BIGINT>> for 0 <= i <= j
  * < dim, or NULL on empty input.
  */
case class GramAgg(
    child: Expression,
    roundE6: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("i", IntegerType), StructField("j", IntegerType),
      StructField("v", if (roundE6) LongType else DoubleType))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gram_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_agg requires ARRAY<DOUBLE>, got ${other.sql}")
  }

  override def createAggregationBuffer(): GramBuf = new GramBuf()

  override def update(buf: GramBuf, input: InternalRow): GramBuf = {
    val v = child.eval(input)
    if (v != null) buf.addRow(v.asInstanceOf[ArrayData], roundE6)
    buf
  }

  override def merge(buf: GramBuf, other: GramBuf): GramBuf = {
    buf.merge(other, roundE6)
    buf
  }

  override def eval(buf: GramBuf): Any = {
    if (buf.dim == 0) return null
    val rows = new Array[Any](buf.dim * (buf.dim + 1) / 2)
    var i = 0; var k = 0
    while (i < buf.dim) {
      var j = i
      while (j < buf.dim) {
        rows(k) = InternalRow(i, j, if (roundE6) buf.l(k) else buf.d(k))
        j += 1; k += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  // shuffle wire: [i32 dim][dim·(dim+1)/2 × i64/f64], little-endian;
  // the untouched buffer serializes as the empty byte array
  override def serialize(buf: GramBuf): Array[Byte] = {
    if (buf.dim == 0) return Array.emptyByteArray
    val n = buf.dim * (buf.dim + 1) / 2
    val out = ByteBuffer.allocate(4 + 8 * n).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(buf.dim)
    var k = 0
    while (k < n) {
      if (roundE6) out.putLong(buf.l(k)) else out.putDouble(buf.d(k))
      k += 1
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuf = {
    val buf = new GramBuf()
    if (bytes.isEmpty) return buf
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.dim = bb.getInt
    val n = buf.dim * (buf.dim + 1) / 2
    if (roundE6) {
      buf.l = new Array[Long](n)
      var k = 0
      while (k < n) { buf.l(k) = bb.getLong; k += 1 }
    } else {
      buf.d = new Array[Double](n)
      var k = 0
      while (k < n) { buf.d(k) = bb.getDouble; k += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren(0))
}
