package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column data-quality profile — the curation dashboard a pipeline runs
  * over every new corpus drop: row/null/distinct counts plus exact
  * micro-unit numeric ranges, one row per column.
  *
  * One aggregation pass computes every metric; the per-column results ride
  * a single aggregate row as structs and explode into rows afterwards
  * (no per-column jobs, no repeated scans).
  *
  * Distinct counts: `exact = true` uses COUNT(DISTINCT col) — each
  * distinct aggregate adds an Expand duplication of the scan, so the cost
  * grows with the column count; right for gates/small tables. The default
  * approximate mode feeds the column's 64-bit hash into the [[HllSketchAgg]]
  * aggregate (single pass, no Expand, mergeable partials) — the 100 TB
  * path, with relative error ~1.04/sqrt(2^p).
  *
  * Numeric ranges are exact micro-unit integers (`round(x * 1e6)` as
  * BIGINT): min/max involve no summation-order issues and integer
  * rendering is engine-portable, so the profile replays exactly in any
  * SQL engine.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String] = Nil,
      exact: Boolean = false, hllP: Int = 14): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))

    def distinctAgg(c: String): Column =
      if (exact) countDistinct(col(c)).cast("long")
      // NULL-gate the hash: xxhash64(NULL) returns the seed, which would
      // count null rows as one phantom distinct; the sketch aggregate
      // skips NULL inputs, matching COUNT(DISTINCT) semantics
      // all-null column: the empty sketch finalizes to NULL; exact mode
      // says 0, so coalesce for mode-consistent output
      else coalesce(
        ColumnBridge.column(graft.functions.HllEstimate(ColumnBridge.expression(
          ColumnBridge.column(graft.functions.HllSketchAgg(
            ColumnBridge.expression(lit(hllP)),
            ColumnBridge.expression(when(col(c).isNotNull, xxhash64(col(c)))))
            .toAggregateExpression())))).cast("long"),
        lit(0L))

    def numericRange(c: String): (Column, Column) = df.schema(c).dataType match {
      case _: NumericType =>
        (round(min(col(c)).cast("double") * 1e6).cast("long"),
          round(max(col(c)).cast("double") * 1e6).cast("long"))
      case _ => (lit(null).cast("long"), lit(null).cast("long"))
    }

    val perCol = cols.map { c =>
      val (mn, mx) = numericRange(c)
      struct(
        lit(c).as("column"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as("n_nulls"),
        distinctAgg(c).as("n_distinct"),
        mn.as("min_e6"), mx.as("max_e6"))
    }
    df.agg(count(lit(1)).cast("long").as("n_rows"),
        array(perCol: _*).as("cols"))
      .select(col("n_rows"), explode(col("cols")).as("c"))
      .select(col("c.column").as("column"), col("n_rows"),
        col("c.n_nulls").as("n_nulls"), col("c.n_distinct").as("n_distinct"),
        col("c.min_e6").as("min_e6"), col("c.max_e6").as("max_e6"))
  }
}
