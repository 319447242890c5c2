package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Robustness/throughput smoke (not a gate): the dedup pipelines over a
  * synthetic corpus 1-2 orders of magnitude larger than the test tables —
  * 200k docs x ~50 tokens from a 1000-word vocabulary (dense shingle
  * collisions exercise the document-frequency cap) with every 4th document
  * an exact duplicate. Run: sbt "runMain graft.tools.DedupScaleSmoke [nDocs]"
  */
object DedupScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // text is a pure function of (id div 4 or id): every 4th doc duplicates
    // the previous ones' content class; ~50 tokens from a 1000-word vocab
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        expr("CASE WHEN id % 4 = 0 AND id > 0 THEN id - 3 ELSE id END").as("__seed"))
      .select(col("doc_id"),
        concat_ws(" ", expr(
          """transform(sequence(1, 45 + CAST(__seed % 10 AS INT)),
               i -> conv(abs(xxhash64(__seed * 100 + i)) % 1000, 10, 36))"""))
          .as("text"))
      .persist()
    println(s"[smoke] corpus: ${docs.count()} docs")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[smoke] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
    }

    t(s"exact dedup stats")(
      Dedup.exactDuplicateStats(docs, "text").head().getLong(2))
    t(s"minhash-lsh pairs (fast mode)")(
      Dedup.minHashNearDuplicates(docs, "text", "doc_id",
        numHashes = 128, bands = 32, shingleSize = 3, threshold = 0.8,
        maxBucketSize = 10000).count())
    t(s"simhash pairs (hamming<=3)")(
      Dedup.simHashNearDuplicates(docs, "text", "doc_id", maxHamming = 3).count())
    t(s"exact jaccard pairs (df cap 1000)")(
      Dedup.exactJaccardPairs(Dedup.shingleHashes(docs, "text", "doc_id", 3))
        .where(col("jaccard") >= 0.8).count())
    spark.stop()
  }
}
