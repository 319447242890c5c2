package graft.tools

import org.apache.spark.sql.SparkSession

/** Rewrite one parquet table with `n` output files — the fixture-layout
  * surgery tool behind the r14 scan-split A/Bs (a single-file table caps
  * every scan-riding stage at bytes/128MB row-group splits).
  * Usage: runMain graft.tools.RepartitionTable <src> <dst> <n>
  */
object RepartitionTable {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, n) = args.take(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(src).repartition(n.toInt)
      .write.mode("overwrite").parquet(dst)
    println(s"[repart] $src -> $dst ($n files)")
    spark.stop()
  }
}
