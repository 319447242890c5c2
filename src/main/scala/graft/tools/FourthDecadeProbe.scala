package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fourth-decade probe for the two scale-critical families (round-15
  * verdict ask #8): MinHash-LSH near-dup over `documents` and the
  * persisted SemDeDup index (build + refresh) over `embeddings`, timed
  * directly against a fixture DIRECTORY that may hold ONLY those two
  * tables — a full sf1000cd database (~150 GB) does not fit this box,
  * but a `GenScale ... 10000 constant-density tables=documents,embeddings`
  * slice (~13 GB) does, and both operators read nothing else.
  *
  * Shapes are the gates' own (same configs, same derived knobs), so a
  * third-decade run of this probe on the full fixture anchors the factor
  * against the same code path:
  *  - minhash fast: `Dedup.minHashNearDuplicates` 128 hashes / 32 bands /
  *    3-shingles / threshold 0.2, xxhash64 mode — pair count forces the
  *    full band shuffle + verify;
  *  - semdedup index: `SemDedupIndex.build` (k = 0, corpus-derived) on the
  *    vec_id % 10 != 0 slice + `refresh` of the % 10 == 0 slice at
  *    threshold 0.35 — the q_semdedup_index gate end to end.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1000cd_de SPARK_DRIVER_MEM=48g \
  *        tools/run_main.sh graft.tools.FourthDecadeProbe [minhash|semdedup|all] [reps]
  */
object FourthDecadeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = if (args.nonEmpty) args(0) else "all"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.rdd.compress", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.registerAll(spark)

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[decade4] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    if (which == "minhash" || which == "all") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      println(s"[decade4] documents = ${docs.count()} rows")
      (1 to reps).foreach { i =>
        timed(s"minhash fast (pairs) rep$i") {
          val n = graft.operators.Dedup.minHashNearDuplicates(
              docs, "text", "doc_id", numHashes = 128, bands = 32,
              shingleSize = 3, threshold = 0.2, portable = false)
            .count()
          println(s"[decade4]   pairs = $n")
        }
      }
    }

    if (which == "semdedup" || which == "all") {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vec"))
      println(s"[decade4] embeddings = ${emb.count()} rows")
      (1 to reps).foreach { i =>
        timed(s"semdedup index build+refresh rep$i") {
          val idx = java.nio.file.Files.createTempDirectory("graft_d4_idx_").toString
          graft.sources.SemDedupIndex.build(
            emb.where(col("vec_id") % 10 =!= 0), "vec", "vec_id", idx, k = 0)
          val kept = graft.sources.SemDedupIndex.refresh(spark, idx,
              emb.where(col("vec_id") % 10 === 0), "vec", "vec_id",
              threshold = 0.35)
            .agg(sum(when(col("keep"), 1L).otherwise(0L))).collect()(0)
          println(s"[decade4]   refresh kept = $kept")
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(): Unit
          }
          rm(new java.io.File(idx))
        }
      }
    }
    spark.stop()
  }
}
