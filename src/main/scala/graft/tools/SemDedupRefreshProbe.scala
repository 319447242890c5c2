package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Embeddings
import graft.sources.SemDedupIndex

/** Isolates the REFRESH cost of the persisted SemDeDup model from its
  * one-time build — the number that proves "refresh scales with the
  * slice, not the archive" (the q_semdedup_index gate times build +
  * refresh together, so the amortized story needs this probe).
  *
  * Builds the index once over the archive (vec_id % 10 != 0), then times
  * `passes` warm refreshes of the slice (vec_id % 10 == 0) and, for
  * contrast, the same refresh through the NON-persisted operator (which
  * must re-fit + re-assign the archive each call). Results → SCALE.md.
  *
  * Run: sbt "runMain graft.tools.SemDedupRefreshProbe <sfDir> [passes] [k]"
  */
object SemDedupRefreshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val k = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vec"))
    val oldE = emb.where(col("vec_id") % 10 =!= 0)
    val newE = emb.where(col("vec_id") % 10 === 0)
    println(s"[semdedup-refresh] archive=${oldE.count()} slice=${newE.count()} k=$k ($dir)")

    val idx = java.nio.file.Files.createTempDirectory("graft_sdrp_").toString
    val tb0 = System.nanoTime()
    SemDedupIndex.build(oldE, "vec", "vec_id", idx, k)
    println(f"[semdedup-refresh] build(once) ${(System.nanoTime() - tb0) / 1e9}%.2f s")

    def time(name: String)(body: => Long): Unit = {
      val ts = (1 to passes).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"[semdedup-refresh] $name%-28s min=${ts.map(_._1).min}%.2f s " +
        f"all=${ts.map(t => f"${t._1}%.2f").mkString(",")} rows=${ts.head._2}")
    }
    time("refresh (persisted index)") {
      SemDedupIndex.refresh(spark, idx, newE, "vec", "vec_id", 0.35).count()
    }
    time("in-memory (re-fit+assign)") {
      Embeddings.incrementalSemanticDeduplicate(
        newE, oldE, "vec", "vec_id", k, 0.35).count()
    }
    spark.stop()
  }
}
