package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file / compaction planner for a parquet table directory — the
  * operational companion to the write-path layout tools (zorder_key,
  * BucketedTables): at 100 TB the difference between 1 GB files and
  * 10 MB files is 100× the driver's listing/planning work and a scan
  * task per tiny file, so compaction decisions need numbers first.
  *
  * Driver-side FileSystem listing only (file-count-sized, no Spark job,
  * no data read — the same listing the scan planner itself performs);
  * recursed one level for partition directories.
  *
  * @return one-row DataFrame: files, total_bytes, small_files (under
  *         half the target), largest/smallest/avg bytes,
  *         recommended_files = ceil(total / target) — the `coalesce`/
  *         `repartition` argument a compaction pass should use.
  */
object LayoutReport {

  def fileReport(spark: SparkSession, dataDir: String,
      targetFileBytes: Long = 512L * 1024 * 1024): DataFrame = {
    require(targetFileBytes >= 1, "targetFileBytes must be >= 1")
    import spark.implicits._
    val fs = new Path(dataDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: Path): Seq[Long] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) parquetFiles(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getLen)
        else Nil
      }
    val sizes = parquetFiles(new Path(dataDir))
    val total = sizes.sum
    val recommended =
      if (total == 0) 0L else (total + targetFileBytes - 1) / targetFileBytes
    Seq((sizes.size.toLong, total,
        sizes.count(_ < targetFileBytes / 2).toLong,
        if (sizes.isEmpty) 0L else sizes.max,
        if (sizes.isEmpty) 0L else sizes.min,
        if (sizes.isEmpty) 0L else total / sizes.size,
        recommended))
      .toDF("files", "total_bytes", "small_files", "largest_bytes",
        "smallest_bytes", "avg_bytes", "recommended_files")
  }

  /** Execute what [[fileReport]] recommends: rewrite the SMALL-FILE TAIL
    * of a flat parquet directory — every top-level file under half the
    * target coalesces into ceil(small_bytes / target) files — and leave
    * already-right-sized files untouched (a 100 TB table's healthy
    * gigabyte files must not be rewritten to fix its tail). Pass
    * `zorderBits`/`zorderDims` to keep (or introduce) z-clustering in
    * the rewritten files via [[DataLayout.clusterByZOrder]]; otherwise
    * the rewrite is a plain size-targeted repartition.
    *
    * Scope and failure contract (documented, not hidden): this operates
    * on a PLAIN parquet directory — no transaction log — so the swap is
    * copy-in-then-delete: new `part-compacted-*` files land first, then
    * the originals delete. A crash between the two steps leaves
    * DUPLICATE rows visible (never missing rows); re-listing the
    * `part-compacted-` prefix of the interrupted run is the manual
    * recovery. Hive-partitioned tables: call per partition directory
    * (top-level files only are compacted; partition values live in
    * directory names and would be lost by a cross-partition rewrite).
    *
    * @return the post-compaction [[fileReport]] of the directory
    */
  def compact(spark: SparkSession, dataDir: String,
      targetFileBytes: Long = 512L * 1024 * 1024,
      zorderBits: Int = 0, zorderDims: Seq[String] = Nil): DataFrame = {
    require(targetFileBytes >= 1, "targetFileBytes must be >= 1")
    require(zorderDims.isEmpty || zorderBits >= 1,
      "zorderDims needs zorderBits >= 1")
    val fs = new Path(dataDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val small = fs.listStatus(new Path(dataDir)).toSeq
      .filter(st => !st.isDirectory && st.getPath.getName.endsWith(".parquet")
        && st.getLen < targetFileBytes / 2)
    if (small.size > 1) {
      val smallBytes = small.map(_.getLen).sum
      val nOut = math.max(1L,
        (smallBytes + targetFileBytes - 1) / targetFileBytes).toInt
      val df0 = spark.read.parquet(small.map(_.getPath.toString): _*)
      val df =
        if (zorderDims.nonEmpty)
          DataLayout.clusterByZOrder(df0, zorderBits,
            zorderDims.map(org.apache.spark.sql.functions.col), nOut)
        else df0.repartition(nOut)
      val runId = java.util.UUID.randomUUID.toString.take(8)
      // dot-prefixed staging dir: hidden from every parquet reader
      val tmp = new Path(dataDir, s".compact-tmp-$runId")
      df.write.mode("overwrite").parquet(tmp.toString)
      val staged = fs.listStatus(tmp).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
      staged.zipWithIndex.foreach { case (st, i) =>
        require(fs.rename(st.getPath,
          new Path(dataDir, s"part-compacted-$runId-$i.parquet")),
          s"rename failed for ${st.getPath}")
      }
      // a silently failed delete would leave the row permanently
      // duplicated with a clean-looking report — fail loudly instead,
      // like the rename step (the documented crash-window recovery
      // applies: re-list the part-compacted prefix of this run)
      small.foreach(st => require(fs.delete(st.getPath, false),
        s"compact: delete failed for ${st.getPath} — rows are duplicated " +
          s"until it is removed (compacted files carry prefix part-compacted-$runId)"))
      fs.delete(tmp, true): Unit
    }
    fileReport(spark, dataDir, targetFileBytes)
  }
}
