package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only micro-profiler: times ad-hoc SQL against a prepared sf dir.
  * Usage: sbt "runMain graft.tools.Scratch [sfDir]" — edit the query list
  * below while investigating; keep the task-metrics listener pattern (see
  * git history) for per-stage breakdowns.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.prepare(spark, args.headOption.getOrElse("/root/testdata/sf0.1"))

    def t(name: String)(q: String): Unit = {
      val t0 = System.nanoTime()
      spark.sql(q).write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    t("warmup")("SELECT COUNT(*), MAX(l_orderkey) FROM lineitem")
    val h = "bitfilters_duckdb_hash('v1.5.1', l_orderkey)"
    for (round <- 1 to 2) {
      t(s"fuse16 6M keys r$round")(s"SELECT binary_fuse16_filter($h) FROM lineitem")
      t(s"bloom 2^18 6M keys r$round")(
        s"SELECT bitfilters_duckdb_bloom_filter_create('v1.5.1', 262144, $h) FROM lineitem")
      t(s"quotient q24 6M keys r$round")(s"SELECT quotient_filter(24, 8, $h) FROM lineitem")
    }
    spark.stop()
  }
}
