package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` output for named gate queries to
  * plans/<tag>/<gate>_<suffix>.txt — the optimization-round evidence files
  * (before/after plan diffs reviewable without running Spark).
  *
  * Run: sbt "runMain graft.tools.GatePlans <tag> <suffix> <gate> [gate ...]"
  * e.g. sbt "runMain graft.tools.GatePlans r15 before q_pagerank q_skipping_index"
  * Pass "ALL" to dump every declared gate.
  */
object GatePlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: GatePlans <tag> <suffix> <gate ...|ALL>")
    val (tag, suffix) = (args(0), args(1))
    val names =
      if (args.contains("ALL")) graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // same optimizer-rule placement as Bench/Verify/production
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Files.createDirectories(Paths.get(s"plans/$tag"))
    names.foreach { name =>
      val out = Paths.get(s"plans/$tag/${name}_$suffix.txt")
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        Files.writeString(out,
          df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
        println(s"wrote $out")
      } catch { case e: Throwable =>
        println(s"SKIP $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
