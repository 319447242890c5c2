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

  /** Z-order clustering for ARBITRARY numeric distributions: each dimension
    * is first rank-normalized into `[0, 2^bits)` equi-depth buckets (via
    * one `approx_percentile` pass — GK sketch, mergeable partials, no
    * global sort), then Morton-interleaved as in [[clusterByZOrder]]. Raw
    * interleaving wastes key bits on skewed columns (a heavy-tailed dim
    * collapses into a handful of bucket values); equi-depth buckets spread
    * every dimension uniformly, so the z-curve actually localizes.
    *
    * Two driver actions (the quantile collect, then the layout shuffle) —
    * the normal shape for a write-path layout job. Bucket lookup is an
    * O(2^bits) filter-count per row, so keep `bits` ≤ 10 (1024 boundaries).
    */
  def clusterByZOrderEquiDepth(df: DataFrame, bits: Int, dims: Seq[Column],
      numPartitions: Int): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    require(bits >= 1 && bits <= 10, s"bits must be in [1, 10] for equi-depth buckets, got $bits")
    require(!df.columns.contains("__zkey"),
      "clusterByZOrderEquiDepth input contains reserved helper column __zkey; rename it first")
    val nb = 1 << bits
    // interior boundaries at ranks 1/nb .. (nb-1)/nb, one pass for all dims
    val probs = (1 until nb).map(_.toDouble / nb)
    val qCols = dims.zipWithIndex.map { case (d, i) =>
      percentile_approx(d.cast("double"), lit(probs.toArray), lit(10000)).as(s"__q_$i")
    }
    val qRow = df.agg(qCols.head, qCols.tail: _*).head()
    val bucketed = dims.zipWithIndex.map { case (d, i) =>
      val bounds = qRow.getSeq[Double](i)
      // bucket = |{boundary <= x}|, clamped to the top bucket
      least(lit(nb - 1), size(filter(lit(bounds.toArray), b => b <= d.cast("double"))))
        .cast("long")
    }
    clusterByZOrder(df, bits, bucketed, numPartitions)
  }
}
