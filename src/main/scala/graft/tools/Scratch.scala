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
    for (round <- 1 to 2; name <- (args.drop(1).filter(graft.SparkEntry.queries.contains) match {
        case more if more.nonEmpty => more.toSeq
        case _ if args.length > 1 => Nil // variant flags only
        case _ => Seq("q_embed_quant", "q_minhash_near_dup", "q_ngram_jaccard", "q_dedup_clusters")
      })) {
      tdf(s"$name r$round")(graft.SparkEntry.queries(name)(spark, sfDir))
      spark.catalog.clearCache()
    }
    if (args.contains("hll_variants")) {
      for (round <- 1 to 2) {
        t(s"hll alone r$round")("""
          SELECT l_returnflag, hll_sketch(12, bitfilters_duckdb_hash('v1.5.1', CAST(l_orderkey AS BIGINT)))
          FROM lineitem GROUP BY l_returnflag""")
        t(s"count distinct alone r$round")("""
          SELECT l_returnflag, COUNT(DISTINCT l_orderkey) FROM lineitem GROUP BY l_returnflag""")
        t(s"hll + count distinct r$round")("""
          SELECT l_returnflag, hll_sketch(12, bitfilters_duckdb_hash('v1.5.1', CAST(l_orderkey AS BIGINT))),
                 COUNT(DISTINCT l_orderkey)
          FROM lineitem GROUP BY l_returnflag""")
      }
    }
    if (args.contains("hll_split")) {
      for (round <- 1 to 3) {
        t(s"hll combined (Expand) r$round")("""
          SELECT l_returnflag, hll_sketch(12, bitfilters_duckdb_hash('v1.5.1', CAST(l_orderkey AS BIGINT))),
                 COUNT(DISTINCT l_orderkey)
          FROM lineitem GROUP BY l_returnflag""")
        t(s"hll split + join r$round")("""
          WITH sk AS (
            SELECT l_returnflag AS flag, hll_sketch(12, bitfilters_duckdb_hash('v1.5.1', CAST(l_orderkey AS BIGINT))) AS s
            FROM lineitem GROUP BY l_returnflag),
          ex AS (
            SELECT l_returnflag AS flag, COUNT(DISTINCT l_orderkey) AS exact_cnt
            FROM lineitem GROUP BY l_returnflag)
          SELECT sk.flag, s, exact_cnt FROM sk JOIN ex ON sk.flag = ex.flag""")
      }
    }
    if (args.contains("mh_variants")) {
      import graft.operators.{ColumnBridge, MinHashSignatureExpr}
      for (round <- 1 to 2) {
        tdf(s"sigs fused r$round")(
          spark.table("documents").select(col("doc_id"),
            ColumnBridge.column(MinHashSignatureExpr(ColumnBridge.expression(
              split(lower(col("text")), "\\s+")), 3, 128, true)).as("sig"))
            .where(col("sig").isNotNull))
        tdf(s"sigs exploded r$round")(
          Dedup.minHashSignatures(
            Dedup.shingleHashes(spark.table("documents"), "text", "doc_id", 3, portable = true),
            128, affine = true))
        tdf(s"full pipeline r$round")(
          Dedup.minHashNearDuplicates(spark.table("documents"), "text", "doc_id",
            numHashes = 128, bands = 32, shingleSize = 3, threshold = 0.2, portable = true))
      }
    }
    locally { val _ = (Dedup.shingleHashes _, count(lit(1))) } // keep imports referenced
    spark.stop()
  }
}
