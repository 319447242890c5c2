package graft.tools
import org.apache.spark.sql.SparkSession
object Repro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.registerAll(spark)
    def time(label: String, q: String, n: Int = 2): Unit = {
      val times = (1 to n).map { _ =>
        val t = System.nanoTime(); spark.sql(q).collect(); (System.nanoTime()-t)/1e9
      }
      println(f"--- $label: ${times.map(t => f"$t%.2f").mkString(",")}s")
    }
    time("fuse16 build 600k", "SELECT length(binary_fuse16_filter(bitfilters_duckdb_hash('v1.5.1', id))) FROM range(1,600001)")
    time("fuse16 build 6M", "SELECT length(binary_fuse16_filter(bitfilters_duckdb_hash('v1.5.1', id))) FROM range(1,6000001)")
    time("bloom build 6M", "SELECT length(bitfilters_duckdb_bloom_filter_create('v1.5.1',1048576,bitfilters_duckdb_hash('v1.5.1', id))) FROM range(1,6000001)")
    time("quotient build 6M (q=24)", "SELECT length(quotient_filter(24,8,bitfilters_duckdb_hash('v1.5.1', id))) FROM range(1,6000001)")
    time("probe 6M vs fuse16(600k)", """SELECT count(*) FROM range(1,6000001) WHERE binary_fuse16_filter_contains(
      (SELECT binary_fuse16_filter(bitfilters_duckdb_hash('v1.5.1', id)) FROM range(1,600001)),
      bitfilters_duckdb_hash('v1.5.1', id))""")
    time("grouped fuse16 64 groups 6M", "SELECT count(length(f)) FROM (SELECT id%64 g, binary_fuse16_filter(bitfilters_duckdb_hash('v1.5.1', id)) f FROM range(1,6000001) GROUP BY id%64)")
    spark.stop()
  }
}
