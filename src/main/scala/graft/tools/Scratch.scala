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
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (round <- 1 to 2; name <- args.drop(1) match {
        case more if more.nonEmpty => more.toSeq
        case _ => Seq("q_embed_quant", "q_minhash_near_dup", "q_ngram_jaccard", "q_dedup_clusters")
      }) {
      tdf(s"$name r$round")(graft.SparkEntry.queries(name)(spark, sfDir))
      spark.catalog.clearCache()
    }
    locally { val _ = (Dedup.shingleHashes _, count(lit(1))) } // keep imports referenced
    spark.stop()
  }
}
