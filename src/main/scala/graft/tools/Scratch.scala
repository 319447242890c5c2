package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for gate query shapes (not part of the surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.prepare(spark, "/root/testdata/sf0.1")

    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    val docs = spark.table("documents")
    t("warmup")(docs.groupBy("lang").count())

    import graft.operators.Dedup
    val sh = Dedup.shingleHashes(docs, "text", "doc_id", 3, portable = true)
    t("1 shingleHashes (distinct)")(sh)
    val sigs = Dedup.minHashSignatures(sh, 128, affine = true)
    t("2 + minhash signatures")(sigs)
    t("3 + lsh candidate pairs")(Dedup.lshCandidatePairs(
      sigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK), 32, 128))
    t("4 full minhash pipeline")(
      Dedup.minHashNearDuplicates(docs, "text", "doc_id", 128, 32, 3, 0.2, portable = true)
        .agg(count(lit(1)).cast("long").as("pairs")))
    t("5 full again (warm)")(
      Dedup.minHashNearDuplicates(docs, "text", "doc_id", 128, 32, 3, 0.2, portable = true)
        .agg(count(lit(1)).cast("long").as("pairs")))
    t("6 xxhash64 variant")(
      Dedup.minHashNearDuplicates(docs, "text", "doc_id", 128, 32, 3, 0.2, portable = false)
        .agg(count(lit(1)).cast("long").as("pairs")))
    // ngram jaccard
    t("7 ngram jaccard")(Dedup.exactJaccardPairs(Dedup.shingleHashes(docs, "text", "doc_id", 3))
      .where(col("jaccard") >= 0.2).agg(count(lit(1)).cast("long").as("pairs")))
    spark.stop()
  }
}
