package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of the sharedJaccardPairs build (the suite's most
  * expensive shared relation, ~3 s at sf0.1): shingle groupBy, sizes
  * aggregate, pair explode+count, the two size joins, and the filtered
  * parquet write, timed separately so the optimization targets the real
  * cost instead of a guess.
  */
object JaccardPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.prepare(spark, sfDir)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[jp] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.operators.Dedup
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val sh = Dedup.shingleHashes(spark.table("documents"), "text", "doc_id", 3)
      timed("shingle stream (noop)") { noop(sh) }
      val capped = sh.groupBy("shingle")
        .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      timed("shingle groupBy collect_set") { noop(capped.where(size(col("docs")) <= 1000)) }
      timed("full exactJaccardPairs (noop)") {
        noop(Dedup.exactJaccardPairs(sh))
      }
      timed("full + filter + parquet write") {
        val p = java.nio.file.Files.createTempDirectory("jp_").toString
        Dedup.exactJaccardPairs(sh)
          .where(col("jaccard") >= 0.2 ||
            greatest(col("containment1"), col("containment2")) >= 0.6)
          .write.mode("overwrite").parquet(p)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
