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
  * Layout at `indexPath`:
  *  - `index/` — one row per data file: `(file STRING, n_rows BIGINT,
  *    min_key BIGINT, max_key BIGINT, filter BINARY)`.
  *  - `bins/` — the file's [min_key, max_key] exploded over a fixed-width
  *    coarse key grid: `(file STRING, bin BIGINT)`; a degenerate
  *    wide-span file (> `MaxBinsPerFile` bins — impossible in a
  *    range-clustered layout) contributes ONE row with `bin` NULL and is
  *    paired with every key instead.
  *  - `meta/` — one row `(bin_width BIGINT)`.
  *
  * Pruning is sound, not heuristic: fuse filters have no false negatives,
  * so every file containing a sought key survives [[candidateFiles]]; the
  * final exact semi-join in [[prunedRead]] removes the false-positive
  * rows. Row-identical to the full-scan semi-join (spec-asserted).
  *
  * Scale shape (the round-9 fix): the keys-to-files match is an
  * EQUI-join — `k div bin_width` against the exploded bins relation —
  * not a key×file range predicate, so a million keys against 100k files
  * is a hash join producing only the (key, candidate-file) pairs that
  * share a grid cell (range-clustered: ~1-2 per key), instead of a
  * BroadcastNestedLoopJoin evaluating 10^11 range tests. Survivors then
  * join the index ON FILE (so the blob-carrying index rows never
  * broadcast per key) for the exact [min,max] check — killing grid-edge
  * pairs on two long comparisons — and the fuse16 probe. The output is a
  * distinct on file names, bounded by the file count, which is what the
  * driver collects to plan the pruned scan. The bins relation is
  * file-listing-sized × ~`targetBinsPerFile` and carries no blobs, so it
  * broadcasts even at 100k files.
  */
object SkippingIndex {

  /** Bin-explosion guard: a file spanning more grid cells than this gets
    * `bin` NULL (always-candidate, per-key range-checked). With the
    * default auto width (~`targetBinsPerFile` bins per file on average)
    * only a pathologically unclustered file — one overlapping ~1000
    * files' worth of key space — hits the cap.
    */
  val MaxBinsPerFile = 4096

  /** One pass over the table: group rows by their physical file
    * (`_metadata.file_path`) and build each file's key filter + range,
    * then lay the bins grid over the per-file ranges. `binWidth <= 0`
    * auto-sizes the grid so the average file covers `targetBinsPerFile`
    * bins (global key range / (files × target)).
    */
  def build(spark: SparkSession, dataDir: String, keyCol: String,
      indexPath: String, binWidth: Long = 0L,
      targetBinsPerFile: Int = 4): Unit = {
    val idx = spark.read.parquet(dataDir)
      .select(col("_metadata.file_path").as("file"),
        col(keyCol).cast("long").as("k"))
      .selectExpr("file", "k", "bitfilters_duckdb_hash('v1.5.1', k) AS h")
      .groupBy("file")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min("k").as("min_key"), max("k").as("max_key"),
        expr("binary_fuse16_filter(h)").as("filter"))
    writeIndex(spark, idx, indexPath, binWidth, targetBinsPerFile)
  }

  /** Persist a prepared per-file index relation as index/bins/meta —
    * [[build]]'s write half, separable so tests can lay grids over
    * synthetic file inventories without staging real parquet files.
    */
  private[sources] def writeIndex(spark: SparkSession, idx: DataFrame,
      indexPath: String, binWidth: Long = 0L,
      targetBinsPerFile: Int = 4): Unit = {
    import spark.implicits._
    idx.write.mode("overwrite").parquet(s"$indexPath/index")
    val stored = spark.read.parquet(s"$indexPath/index")
    val w =
      if (binWidth > 0) binWidth
      else {
        // auto grid: global span / (files × target), clamped to >= 1.
        // The stats aggregate runs on the file-count-sized index, not data.
        val g = stored.agg(min("min_key").as("lo"), max("max_key").as("hi"),
          count(lit(1)).as("nf")).head()
        if (g.isNullAt(0)) 1L // empty table: no files, any width works
        else {
          val span = g.getLong(1) - g.getLong(0) + 1
          math.max(1L, span / math.max(1L, g.getLong(2) * targetBinsPerFile))
        }
      }
    // `div` (integer division), not floor(a / w): long-exact and monotone,
    // so min <= k <= max implies bin(min) <= bin(k) <= bin(max) and the
    // sequence covers every bin a member key can land in (the
    // Events.rangeJoin discipline)
    val spanBins = expr(s"(max_key div ${w}L) - (min_key div ${w}L) + 1")
    val narrow = stored.where(spanBins <= MaxBinsPerFile)
      .select(col("file"), explode(expr(
        s"sequence(min_key div ${w}L, max_key div ${w}L)")).as("bin"))
    val wide = stored.where(spanBins > MaxBinsPerFile)
      .select(col("file"), lit(null).cast("long").as("bin"))
    narrow.union(wide).write.mode("overwrite").parquet(s"$indexPath/bins")
    Seq(w).toDF("bin_width").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/meta")
  }

  /** The files that MAY contain any of `keys` (a one-column LONG frame):
    * bin equi-join, range check, fuse16 probe. No false negatives;
    * bounded by the file count.
    */
  def candidateFiles(spark: SparkSession, indexPath: String,
      keys: DataFrame): Seq[String] =
    candidateFilesDF(spark, indexPath, keys)
      .collect().map(_.getString(0)).toSeq

  /** The pre-collect candidate relation — exposed to tests so the plan
    * shape (equi-joins only, no BroadcastNestedLoopJoin) is assertable.
    */
  private[sources] def candidateFilesDF(spark: SparkSession,
      indexPath: String, keys: DataFrame): DataFrame = {
    val w = spark.read.parquet(s"$indexPath/meta").head().getLong(0)
    val bins = spark.read.parquet(s"$indexPath/bins")
    val k = keys.toDF("k").distinct()
    // grid-cell equi-join: only (key, file) pairs sharing a bin survive.
    // The blob-free bins relation is the broadcast side; wide-span files
    // (bin NULL) pair with every key — the sound fallback for layouts
    // with no clustering to exploit.
    val narrowPairs = k.withColumn("bin", expr(s"k div ${w}L"))
      .join(broadcast(bins.where(col("bin").isNotNull)), "bin")
      .select("k", "file")
    // the wide-file fallback only enters the plan when wide files EXIST
    // (a cheap limit-probe on the file-sized bins relation) — otherwise
    // the empty crossJoin branch would still plan a BroadcastNestedLoopJoin
    val wideFiles = bins.where(col("bin").isNull).select("file")
    val anyWide = wideFiles.limit(1).count() > 0
    val pairs =
      if (anyWide) narrowPairs.union(k.crossJoin(broadcast(wideFiles)))
      else narrowPairs
    // survivors join the index ON FILE — an equi-join, so the
    // blob-carrying rows ship once per matched file, never per key
    pairs
      .join(spark.read.parquet(s"$indexPath/index"), "file")
      .where(col("k") >= col("min_key") && col("k") <= col("max_key"))
      .where(expr("binary_fuse16_filter_contains(filter, bitfilters_duckdb_hash('v1.5.1', k))"))
      .select("file").distinct()
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
