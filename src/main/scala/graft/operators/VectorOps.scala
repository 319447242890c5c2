package graft.operators

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for embedding columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * materializes an intermediate array per row pair and walks it with
  * per-element lambda dispatch; on an all-pairs similarity join that is
  * ~22 us/pair (measured: 45 s for 2M pairs at sf0.1). These kernels are a
  * single fused loop (~50 ns/pair) with identical IEEE semantics: strictly
  * sequential left-to-right double accumulation, so results are bit-equal
  * to the HOF form and to DuckDB's list_cosine_similarity decomposition.
  */
object VectorOps {

  def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  def isFloatVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Sequential dot product over min(|a|, |b|) elements. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** sqrt of the sequential sum of squares. */
  def norm(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }
}

/** SQL: `vec_dot(a, b)` -> DOUBLE. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "vec_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorOps.isVec(left.dataType) || !VectorOps.isVec(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires ARRAY<FLOAT>/ARRAY<DOUBLE> arguments, got ${left.dataType.sql}, ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private def aF = VectorOps.isFloatVec(left.dataType)
  private def bF = VectorOps.isFloatVec(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.operators.VectorOps.dot($a, $b, $aF, $bF)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** SQL: `vec_norm(a)` -> DOUBLE. */
case class VecNorm(child: Expression) extends UnaryExpression {

  override def prettyName: String = "vec_norm"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorOps.isVec(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"vec_norm requires an ARRAY<FLOAT>/ARRAY<DOUBLE> argument, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private def aF = VectorOps.isFloatVec(child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    VectorOps.norm(a.asInstanceOf[ArrayData], aF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.VectorOps.norm($a, $aF)")

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}
