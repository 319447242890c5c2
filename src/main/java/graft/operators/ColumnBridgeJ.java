package graft.operators;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Java shim around org.apache.spark.sql.classic.ExpressionUtils: the Scala
 * compiler enforces its private[sql] scope, but the JVM-level static methods
 * are public, so a Java caller bridges Expression <-> Column cleanly.
 */
final class ColumnBridgeJ {
    private ColumnBridgeJ() {}

    static Column column(Expression e) {
        return org.apache.spark.sql.classic.ExpressionUtils.column(e);
    }

    static Expression expression(Column c) {
        return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
    }
}
