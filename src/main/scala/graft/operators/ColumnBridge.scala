package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression <-> Column bridge for Spark 4's opaque Column API (goes
  * through a Java shim because ExpressionUtils is Scala-private[sql]).
  */
private[graft] object ColumnBridge {
  def column(e: Expression): Column = ColumnBridgeJ.column(e)
  def expression(c: Column): Expression = ColumnBridgeJ.expression(c)
}
