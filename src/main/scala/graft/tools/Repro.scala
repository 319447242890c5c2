package graft.tools
import org.apache.spark.sql.SparkSession
object Repro {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.registerAll(spark)
    spark.range(1, n + 1).toDF("id").createOrReplaceTempView("series_data")
    def time(label: String)(f: => Any): Unit = {
      val t = System.nanoTime(); val r = f
      println(f"--- $label: $r in ${(System.nanoTime()-t)/1e9}%.2fs")
    }
    time("build filters (cached)") {
      spark.sql("""CACHE TABLE fuse_cached AS
        SELECT id % 2 AS remainder,
               binary_fuse16_filter(bitfilters_duckdb_hash('v1.5.1', id)) AS f16,
               binary_fuse8_filter(bitfilters_duckdb_hash('v1.5.1', id)) AS f8
        FROM series_data GROUP BY id % 2""")
      spark.sql("SELECT remainder, length(f16) FROM fuse_cached").collect().mkString(";")
    }
    time("join only (length)") {
      spark.sql("""SELECT remainder, count(CASE WHEN length(f16) > 0 THEN 1 END) c
        FROM series_data, fuse_cached WHERE series_data.id % 2 = fuse_cached.remainder
        GROUP BY remainder""").collect().mkString(";")
    }
    time("join + both probes") {
      spark.sql("""SELECT remainder,
          count(CASE WHEN binary_fuse16_filter_contains(f16, bitfilters_duckdb_hash('v1.5.1', id)) THEN 1 END),
          count(CASE WHEN binary_fuse8_filter_contains(f8, bitfilters_duckdb_hash('v1.5.1', id)) THEN 1 END)
        FROM series_data, fuse_cached WHERE series_data.id % 2 = fuse_cached.remainder
        GROUP BY remainder""").collect().mkString(";")
    }
    time("scalar subquery probe count") {
      spark.sql("""SELECT count(*) FROM series_data
        WHERE binary_fuse16_filter_contains((SELECT f16 FROM fuse_cached WHERE remainder = 0),
          bitfilters_duckdb_hash('v1.5.1', id))""").collect().mkString(";")
    }
    spark.sql("""SELECT remainder,
        count(CASE WHEN binary_fuse16_filter_contains(f16, bitfilters_duckdb_hash('v1.5.1', id)) THEN 1 END) c
      FROM series_data, fuse_cached WHERE series_data.id % 2 = fuse_cached.remainder
      GROUP BY remainder""").explain("formatted")
    spark.stop()
  }
}
