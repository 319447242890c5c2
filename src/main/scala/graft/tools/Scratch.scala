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
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    def tdf(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val docs = spark.table("documents")
    for (round <- 1 to 2) {
      val sh = Dedup.shingleHashes(docs, "text", "doc_id", 3, portable = true)
      tdf(s"1 shingles r$round")(sh)
      tdf(s"2 +signatures r$round")(Dedup.minHashSignatures(sh, 128, affine = true))
      tdf(s"3 +bucket pairs r$round")(Dedup.lshNearDuplicatePairs(
        Dedup.minHashSignatures(sh, 128, affine = true), 32, 128))
      tdf(s"4 full r$round")(Dedup.minHashNearDuplicates(docs, "text", "doc_id",
        128, 32, 3, 0.2, portable = true).agg(count(lit(1)).cast("long").as("pairs")))
    }
    spark.stop()
  }
}
