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
}
