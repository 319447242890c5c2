package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrderKey
import graft.operators.ColumnBridge

/** Write-path layout clustering.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * parquet min/max row-group stats (and file-level partition pruning) skip
  * data only when rows with similar key values sit together. A plain
  * `sortWithinPartitions(a, b)` clusters on `a` and leaves `b` scattered;
  * Z-ordering interleaves the key bits so BOTH predicates prune.
  *
  * `clusterByZOrder` is a one-shuffle operation (range repartition on the
  * z-key, then an in-partition sort) — the standard shape for a layout
  * rewrite job. It changes only row ORDER, never content; the gate asserts
  * content invariance and the spec asserts the pruning-relevant property
  * (per-file key ranges shrink in both dimensions).
  */
object DataLayout {

  /** The z-key as a Column — `zorder_key(bits, dims...)` with each
    * dimension masked into range by the caller.
    */
  def zorderKey(bits: Int, dims: Column*): Column =
    ColumnBridge.column(ZOrderKey(
      ColumnBridge.expression(lit(bits)) +: dims.map(ColumnBridge.expression)))

  /** Range-partition and sort `df` by the Morton key of `dims` (each an
    * integral Column already normalized into `[0, 2^bits)`). Write the
    * result with `.write.parquet(...)` to get z-clustered files.
    */
  def clusterByZOrder(df: DataFrame, bits: Int, dims: Seq[Column],
      numPartitions: Int): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    require(!df.columns.contains("__zkey"),
      "clusterByZOrder input contains reserved helper column __zkey; rename it first")
    val key = zorderKey(bits, dims: _*)
    df.withColumn("__zkey", key)
      .repartitionByRange(numPartitions, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }
}
