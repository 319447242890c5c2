package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core._

/** Base for the `*_contains` probe expressions: (filter BLOB, hash BIGINT) ->
  * BOOLEAN with standard null propagation.
  *
  * All probes are ZERO-COPY against the serialized blob bytes (no filter
  * materialization per row) and implement `doGenCode`, so `WHERE
  * xyz_contains(...)` predicates stay inside whole-stage codegen. This
  * matters twice at scale: (a) the probe is a handful of inlined integer ops,
  * and (b) an expression that falls back to interpreted mode would eject its
  * whole operator from codegen, forcing joined rows (which carry the filter
  * blobs) to be materialized at stage boundaries — at 100k+ rows x 100KB+
  * blobs that is gigabytes of row copies. Mirrors the reference's
  * constant-vector fast path intent (src/bitfilters_xor_filter.cpp:223-232)
  * with Spark's compilation model.
  */
abstract class FilterContainsExpression extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName filter argument must be BINARY, got " + left.dataType.sql)
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName hash argument must be BIGINT, got " + right.dataType.sql)
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable

  /** Probe a serialized filter blob (zero-copy). */
  protected def probe(blob: Array[Byte], hash: Long): Boolean

  /** Java source for the static probe call used by codegen. */
  protected def probeCall(blobTerm: String, hashTerm: String): String

  override def eval(input: InternalRow): Any = {
    val h = right.eval(input)
    if (h == null) return null
    val blob = left.eval(input).asInstanceOf[Array[Byte]]
    if (blob == null) return null
    probe(blob, h.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, h) => probeCall(f, h))
}

/** SQL: `quotient_filter_contains(filter, hash)`;
  * reference src/bitfilters_quotient_filter.cpp:246-267. */
case class QuotientFilterContains(left: Expression, right: Expression)
  extends FilterContainsExpression {
  override def prettyName: String = "quotient_filter_contains"
  override protected def probe(blob: Array[Byte], hash: Long): Boolean =
    QuotientFilter.probeBlob(blob, hash)
  override protected def probeCall(f: String, h: String): String =
    s"graft.core.QuotientFilter.probeBlob($f, $h)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuotientFilterContains =
    copy(left = l, right = r)
}

/** SQL: `xor8_filter_contains` / `xor16_filter_contains`;
  * reference src/bitfilters_xor_filter.cpp:214-245. */
case class XorFilterContains(left: Expression, right: Expression, bits: Int)
  extends FilterContainsExpression {
  override def prettyName: String = s"xor${bits}_filter_contains"
  override protected def probe(blob: Array[Byte], hash: Long): Boolean =
    XorFilter.probeBlob(bits, blob, hash)
  override protected def probeCall(f: String, h: String): String =
    s"graft.core.XorFilter.probeBlob($bits, $f, $h)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): XorFilterContains =
    copy(left = l, right = r)
}

/** SQL: `binary_fuse8_filter_contains` / `binary_fuse16_filter_contains`;
  * reference src/bitfilters_binary_fuse_filter.cpp:215-246. */
case class BinaryFuseFilterContains(left: Expression, right: Expression, bits: Int)
  extends FilterContainsExpression {
  override def prettyName: String = s"binary_fuse${bits}_filter_contains"
  override protected def probe(blob: Array[Byte], hash: Long): Boolean =
    BinaryFuseFilter.probeBlob(bits, blob, hash)
  override protected def probeCall(f: String, h: String): String =
    s"graft.core.BinaryFuseFilter.probeBlob($bits, $f, $h)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BinaryFuseFilterContains =
    copy(left = l, right = r)
}

private[functions] object HashDispatch {
  /** Per-type hasher matching DuckDB physical-type dispatch
    * (reference src/bitfilters_duckdb_bloom_filter.cpp:193-235). NULL inputs
    * never reach these: the expressions propagate NULL first, matching
    * DuckDB's default scalar null handling
    * (test/sql/duckdb_bloom_filter.test:137-141).
    */
  def hasherFor(dt: DataType, name: String): Any => Long = dt match {
    case BooleanType => v => DuckDbHash.hashBoolean(v.asInstanceOf[Boolean])
    case ByteType => v => DuckDbHash.hashInt32Like(v.asInstanceOf[Byte].toInt)
    case ShortType => v => DuckDbHash.hashInt32Like(v.asInstanceOf[Short].toInt)
    case IntegerType => v => DuckDbHash.hashInt32Like(v.asInstanceOf[Int])
    case LongType => v => DuckDbHash.hashLong(v.asInstanceOf[Long])
    case FloatType => v => DuckDbHash.hashFloat(v.asInstanceOf[Float])
    case DoubleType => v => DuckDbHash.hashDouble(v.asInstanceOf[Double])
    case _: StringType => v => DuckDbHash.hashBytes(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => v => DuckDbHash.hashBytes(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(s"$name: unsupported type ${other.sql}")
  }

  /** Java source computing the hash of a (non-null) value term of type dt. */
  def hashCallJava(dt: DataType, v: String): String = dt match {
    case BooleanType => s"graft.core.DuckDbHash.hashBoolean($v)"
    case ByteType | ShortType | IntegerType => s"graft.core.DuckDbHash.hashInt32Like((int) $v)"
    case LongType => s"graft.core.DuckDbHash.hashLong($v)"
    case FloatType => s"graft.core.DuckDbHash.hashFloat($v)"
    case DoubleType => s"graft.core.DuckDbHash.hashDouble($v)"
    case _: StringType => s"graft.core.DuckDbHash.hashBytes($v.getBytes())"
    case BinaryType => s"graft.core.DuckDbHash.hashBytes($v)"
    case other => throw new IllegalArgumentException(s"unsupported type ${other.sql}")
  }

  def supported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         BinaryType => true
    case _: StringType => true
    case _ => false
  }

  /** Generate Java leaving the combined hash in `hVar` and the NULL flag in
    * `anyNullVar` (any NULL value argument -> NULL result, like DuckDB's
    * default scalar null handling).
    */
  def genCombinedHash(ctx: CodegenContext, values: Seq[Expression],
      hVar: String, anyNullVar: String): String = {
    val pieces = values.zipWithIndex.map { case (child, i) =>
      val c = child.genCode(ctx)
      val hashed = hashCallJava(child.dataType, c.value.toString)
      val combineStmt =
        if (i == 0) s"$hVar = $hashed;"
        else s"$hVar = graft.core.DuckDbHash.combine($hVar, $hashed);"
      val guarded =
        if (child.nullable) s"if (${c.isNull}) { $anyNullVar = true; } else { $combineStmt }"
        else combineStmt
      c.code.toString + "\n" + guarded
    }
    s"long $hVar = 0L;\nboolean $anyNullVar = false;\n" + pieces.mkString("\n")
  }
}

/** SQL: `bitfilters_duckdb_hash(version, v1[, v2, ...])` -> BIGINT carrying
  * the unsigned 64-bit DuckDB hash. Multi-value hashing folds left with
  * CombineHash. Reference src/bitfilters_duckdb_bloom_filter.cpp:263-321.
  */
case class DuckDbHashExpr(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  private def versionExpr = children.head
  private def valueExprs = children.tail

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2)
      return TypeCheckResult.TypeCheckFailure(
        "bitfilters_duckdb_hash requires at least 2 arguments: version and value(s)")
    if (!versionExpr.foldable || !versionExpr.dataType.isInstanceOf[StringType])
      return TypeCheckResult.TypeCheckFailure("bitfilters_duckdb_hash: version must be a constant string")
    DuckDbHash.requireSupported(AggUtil.foldableString(versionExpr, "version"))
    valueExprs.find(e => !HashDispatch.supported(e.dataType)) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"bitfilters_duckdb_hash: unsupported type ${bad.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  @transient private lazy val hashers: Array[Any => Long] =
    valueExprs.map(e => HashDispatch.hasherFor(e.dataType, "bitfilters_duckdb_hash")).toArray
  @transient private lazy val valueArr: Array[Expression] = valueExprs.toArray

  override def eval(input: InternalRow): Any = {
    var h = 0L
    var i = 0
    while (i < valueArr.length) {
      val v = valueArr(i).eval(input)
      if (v == null) return null // NULL propagates (duckdb_bloom_filter.test:137-141)
      h = if (i == 0) hashers(0)(v) else DuckDbHash.combine(h, hashers(i)(v))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hVar = ctx.freshName("ddbHash")
    val nullVar = ctx.freshName("ddbAnyNull")
    val hashCode = HashDispatch.genCombinedHash(ctx, valueExprs, hVar, nullVar)
    ev.copy(code = code"""
        $hashCode
        boolean ${ev.isNull} = $nullVar;
        long ${ev.value} = $hVar;
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DuckDbHashExpr =
    copy(children = newChildren)
}

/** SQL: `bitfilters_duckdb_bloom_filter_probe(version, filter, v1[, v2, ...])`.
  * Hashes the value arguments with the versioned algorithm (CombineHash for
  * multi-key) and probes the serialized bloom filter. Unlike the reference
  * (which rejects non-constant filter vectors,
  * src/bitfilters_duckdb_bloom_filter.cpp:444-446) we also accept a
  * per-row filter column. Reference cpp:327-468.
  */
case class DuckDbBloomFilterProbe(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  private def versionExpr = children.head
  private def filterExpr = children(1)
  private def valueExprs = children.drop(2)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 3)
      return TypeCheckResult.TypeCheckFailure(
        "bitfilters_duckdb_bloom_filter_probe requires at least 3 arguments: version, filter, value(s)")
    if (!versionExpr.foldable || !versionExpr.dataType.isInstanceOf[StringType])
      return TypeCheckResult.TypeCheckFailure(
        "bitfilters_duckdb_bloom_filter_probe: version must be a constant string")
    DuckDbHash.requireSupported(AggUtil.foldableString(versionExpr, "version"))
    if (filterExpr.dataType != BinaryType)
      return TypeCheckResult.TypeCheckFailure(
        s"bitfilters_duckdb_bloom_filter_probe: filter must be BINARY, got ${filterExpr.dataType.sql}")
    valueExprs.find(e => !HashDispatch.supported(e.dataType)) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"bitfilters_duckdb_bloom_filter_probe: unsupported type ${bad.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  @transient private lazy val hashers: Array[Any => Long] =
    valueExprs.map(e => HashDispatch.hasherFor(e.dataType, "bitfilters_duckdb_bloom_filter_probe")).toArray
  @transient private lazy val valueArr: Array[Expression] = valueExprs.toArray

  override def eval(input: InternalRow): Any = {
    val blob = filterExpr.eval(input).asInstanceOf[Array[Byte]]
    if (blob == null) return null
    var h = 0L
    var i = 0
    while (i < valueArr.length) {
      val v = valueArr(i).eval(input)
      if (v == null) return null // NULL propagates like the hash function
      h = if (i == 0) hashers(0)(v) else DuckDbHash.combine(h, hashers(i)(v))
      i += 1
    }
    DuckDbBloomFilter.probeBlob(blob, h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = filterExpr.genCode(ctx)
    val hVar = ctx.freshName("ddbHash")
    val nullVar = ctx.freshName("ddbAnyNull")
    val hashCode = HashDispatch.genCombinedHash(ctx, valueExprs, hVar, nullVar)
    val isNullVar = ctx.freshName("probeIsNull")
    val valueVar = ctx.freshName("probeValue")
    ev.copy(code = code"""
      ${f.code}
      boolean $isNullVar = true;
      boolean $valueVar = false;
      if (!(${f.isNull})) {
        $hashCode
        if (!$nullVar) {
          $isNullVar = false;
          $valueVar = graft.core.DuckDbBloomFilter.probeBlob(${f.value}, $hVar);
        }
      }
      boolean ${ev.isNull} = $isNullVar;
      boolean ${ev.value} = $valueVar;
    """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DuckDbBloomFilterProbe =
    copy(children = newChildren)
}
