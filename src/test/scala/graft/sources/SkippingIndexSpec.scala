package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.GraftFunctions

class SkippingIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private var dataDir: String = _
  private var indexPath: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-skipping-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(spark)
    // stage lineitem as 8 range-partitioned files (the clustered layout a
    // real lake maintains on its primary key)
    dataDir = java.nio.file.Files.createTempDirectory("graft_skip_data_").toString
    indexPath = java.nio.file.Files.createTempDirectory("graft_skip_idx_").toString
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .repartitionByRange(8, col("l_orderkey"))
      .write.mode("overwrite").parquet(dataDir)
    SkippingIndex.build(spark, dataDir, "l_orderkey", indexPath)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("index has one row per data file with sane ranges") {
    val idx = spark.read.parquet(indexPath).collect()
    val nFiles = new java.io.File(dataDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(idx.length == nFiles && nFiles == 8)
    idx.foreach { r =>
      assert(r.getAs[Long]("min_key") <= r.getAs[Long]("max_key"))
      assert(r.getAs[Long]("n_rows") > 0)
      assert(r.getAs[Array[Byte]]("filter").nonEmpty)
    }
  }

  test("candidateFiles prunes but never misses a file holding a sought key") {
    val sps = spark; import sps.implicits._
    val all = spark.read.parquet(dataDir)
    val someKeys = all.select(col("l_orderkey")).distinct()
      .orderBy("l_orderkey").limit(3).as[Long].collect().toSeq
    val keys = someKeys.toDF("k")
    val cand = SkippingIndex.candidateFiles(spark, indexPath, keys).toSet
    // ground truth: the files that actually hold those keys
    val truth = all.select(col("_metadata.file_path").as("f"), col("l_orderkey"))
      .where(col("l_orderkey").isin(someKeys: _*))
      .select("f").distinct().as[String].collect().toSet
    assert(truth.subsetOf(cand), s"missed ${truth -- cand}")
    // range clustering on the key means 3 low keys cannot touch all 8 files
    assert(cand.size < 8, s"no pruning: $cand")
  }

  test("prunedRead is row-identical to the full-scan semi-join") {
    val sps = spark; import sps.implicits._
    val all = spark.read.parquet(dataDir)
    val someKeys = all.select(col("l_orderkey")).distinct()
      .orderBy(col("l_orderkey").desc).limit(5).as[Long].collect().toSeq ++
      Seq(-1L, 999999999L) // absent keys exercise the FP-removal join
    val keys = someKeys.toDF("k")
    val got = SkippingIndex.prunedRead(spark, dataDir, indexPath, "l_orderkey", keys)
      .select("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSet
    val want = all.join(keys, col("l_orderkey") === col("k"), "left_semi")
      .select("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("absent keys read nothing (or only FP files) and return zero rows") {
    val sps = spark; import sps.implicits._
    val keys = Seq(-5L, -6L, 123456789L).toDF("k")
    val got = SkippingIndex.prunedRead(spark, dataDir, indexPath, "l_orderkey", keys)
    assert(got.count() == 0L)
  }
}
