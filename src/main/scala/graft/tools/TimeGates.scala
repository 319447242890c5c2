package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm per-gate timing for targeted scale probes:
  * `runMain graft.tools.TimeGates <sfDir> <passes> <gate> [gate...]`
  * runs each named SparkEntry gate `passes` times through the noop sink
  * in ONE warm session (same config as Bench) and prints min/all times.
  * Bench times the whole suite; this is the single-gate iteration loop
  * SCALE.md probes use.
  */
object TimeGates {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: TimeGates <sfDir> <passes> <gate> [gate...]")
    val sfDir = args(0)
    val passes = args(1).toInt
    val gates = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    gates.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to passes).map { _ =>
        graft.SparkEntry.clearSharedRelations()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[timegates] $name min=${times.min}%.2f s all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
