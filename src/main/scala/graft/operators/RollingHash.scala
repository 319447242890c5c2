package graft.operators

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Rabin-Karp) rolling-hash document fingerprint over Unicode
  * code points: `h = fold(cp => (h * 257 + cp) mod 1e9+7)`.
  *
  * Code points (not UTF-8 bytes) and a sub-2^31 modulus are deliberate: both
  * are exactly expressible in portable SQL (`string_split(text, '')` +
  * `list_reduce` in DuckDB) with no 64-bit overflow, so fingerprints can be
  * verified across engines. Intermediate `h * 257 + cp` is at most
  * ~2.57e11, far inside Long range.
  */
object RollingHash {
  final val Mod = 1000000007L
  final val Base = 257L

  /** Static-callable from generated code. */
  def hash(text: UTF8String): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** SQL: `rolling_hash(text)` -> BIGINT polynomial fingerprint. */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"rolling_hash requires STRING, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.operators.RollingHash.hash($t)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}
