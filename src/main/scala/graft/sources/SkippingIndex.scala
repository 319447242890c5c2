package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-FILE data-skipping index: min/max range plus a binary-fuse16
  * filter of every key in each parquet file, built in one pass and
  * persisted beside the data. A point-lookup (or small-key-set) read then
  * prunes at FILE granularity before any scan task launches — the data
  * lake answer to "fetch these million keys out of 100 TB" without a full
  * scan, and the engine-agnostic analog of the reference's
  * store-the-filter-blob workflow (docs/README.md:174,463: build once,
  * persist the blob, probe elsewhere) applied to Spark's own scan
  * planning.
  *
  * Layout at `indexPath`: one row per data file —
  * `(file STRING, n_rows BIGINT, min_key BIGINT, max_key BIGINT,
  * filter BINARY)`. The index is file-listing-sized (one row per file,
  * ~100k rows for a 100 TB table of 1 GB files), so it broadcasts.
  *
  * Pruning is sound, not heuristic: fuse filters have no false negatives,
  * so every file containing a sought key survives [[candidateFiles]]; the
  * final exact semi-join in [[prunedRead]] removes the false-positive
  * rows. Row-identical to the full-scan semi-join (spec-asserted).
  *
  * Scale shape: the candidate decision is `keys x broadcast(index)` with
  * the min/max range check BEFORE the filter probe (most (key, file)
  * pairs die on two long comparisons and never touch the blob), then a
  * distinct on the surviving file names — output bounded by the file
  * count, which is what the driver collects to plan the pruned scan.
  */
object SkippingIndex {

  /** One pass over the table: group rows by their physical file
    * (`_metadata.file_path`) and build each file's key filter + range.
    */
  def build(spark: SparkSession, dataDir: String, keyCol: String,
      indexPath: String): Unit =
    spark.read.parquet(dataDir)
      .select(col("_metadata.file_path").as("file"),
        col(keyCol).cast("long").as("k"))
      .selectExpr("file", "k", "bitfilters_duckdb_hash('v1.5.1', k) AS h")
      .groupBy("file")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min("k").as("min_key"), max("k").as("max_key"),
        expr("binary_fuse16_filter(h)").as("filter"))
      .write.mode("overwrite").parquet(indexPath)

  /** The files that MAY contain any of `keys` (a one-column LONG frame):
    * range check, then fuse16 probe. No false negatives; bounded by the
    * file count.
    */
  def candidateFiles(spark: SparkSession, indexPath: String,
      keys: DataFrame): Seq[String] = {
    val k = keys.toDF("k").distinct()
    k.join(broadcast(spark.read.parquet(indexPath)),
        col("k") >= col("min_key") && col("k") <= col("max_key"))
      .where(expr("binary_fuse16_filter_contains(filter, bitfilters_duckdb_hash('v1.5.1', k))"))
      .select("file").distinct()
      .collect().map(_.getString(0)).toSeq
  }

  /** Read only the candidate files and keep exactly the sought keys (the
    * exact semi-join removes filter false positives). Row-identical to
    * `spark.read.parquet(dataDir).join(keys, keyCol, "left_semi")`.
    * Returns an empty-but-correctly-schemed frame when nothing survives.
    */
  def prunedRead(spark: SparkSession, dataDir: String, indexPath: String,
      keyCol: String, keys: DataFrame): DataFrame = {
    val files = candidateFiles(spark, indexPath, keys)
    val schema = spark.read.parquet(dataDir).schema
    val data =
      if (files.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files: _*)
    data.join(keys.toDF("__k").distinct(),
      col(keyCol).cast("long") === col("__k"), "left_semi")
  }
}
