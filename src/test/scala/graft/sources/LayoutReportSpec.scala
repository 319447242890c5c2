package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class LayoutReportSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-layout-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("fileReport counts files (incl. partition dirs), flags small ones, sizes compaction") {
    val sps = spark; import sps.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_").toString
    (1 to 1000).map(i => (i.toLong, i % 4, s"payload_$i")).toDF("id", "p", "s")
      .repartition(8).write.partitionBy("p").mode("overwrite").parquet(dir)
    val actual = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    val r = LayoutReport.fileReport(spark, dir, targetFileBytes = 1024 * 1024).head()
    assert(r.getLong(0) == actual.toLong, s"files ${r.getLong(0)} != listed $actual")
    assert(r.getLong(1) > 0 && r.getLong(3) >= r.getLong(5) && r.getLong(5) >= r.getLong(4))
    // every file here is far under half a MiB target -> all flagged small;
    // total < 1 target file -> recommend exactly 1
    assert(r.getLong(2) == r.getLong(0))
    assert(r.getLong(6) == 1L)
    // a tight target recommends ceil(total/target)
    val tight = LayoutReport.fileReport(spark, dir, targetFileBytes = 1024).head()
    assert(tight.getLong(6) == (tight.getLong(1) + 1023) / 1024)
    // empty dir: zeros
    val empty = java.nio.file.Files.createTempDirectory("graft_layout_empty_").toString
    val e = LayoutReport.fileReport(spark, empty).head()
    assert(e.getLong(0) == 0L && e.getLong(6) == 0L)
  }
}
