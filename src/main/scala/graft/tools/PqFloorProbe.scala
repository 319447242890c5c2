package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Embeddings

/** Measures the PQ training-lift invariant (trained >= seed recall) under
  * two query selections, for sizing `q_recall_floor_pq` across scale
  * fixtures: `head` = the gate's historical `vec_id < 10` (all queries in
  * replica 0 of a GenScale cd fixture — distribution-MISMATCHED against a
  * codebook trained on the sign-flip mixture) vs `spread` = 10 queries at
  * stride n/10 (one per replica — matched). SCALE.md round-12.
  * Run: sbt "runMain graft.tools.PqFloorProbe <sfDir>"
  */
object PqFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vec")).persist()
    val n = emb.count()
    val stride = math.max(1L, n / 10L)
    for ((qname, queries) <- Seq(
        "head" -> emb.where(col("vec_id") < 10),
        "head50" -> emb.where(col("vec_id") < 50),
        "spread" -> emb.where(col("vec_id") % stride === 0 && col("vec_id") < stride * 10))) {
      val q = queries.select(col("vec_id").as("qid"), col("vec").as("qvec")).persist()
      val exact = Embeddings.bruteForceTopK(emb, "vec", "vec_id", q, "qvec", "qid", 5)
      def r(approx: org.apache.spark.sql.DataFrame): Long =
        Embeddings.recallReport(approx, exact).head().getLong(1)
      val seed = r(Embeddings.pqTopK(emb, "vec", "vec_id", q, "qvec", "qid", 5, 8, 16))
      val cb = Embeddings.pqCodebooksTrained(emb, "vec", "vec_id", 8, 16, 1)
      val trained = r(Embeddings.pqTopK(emb, "vec", "vec_id", q, "qvec", "qid", 5, 8, 16,
        codebooks = Some(cb)))
      println(s"[pq-floor] $dir queries=$qname n=$n seed=$seed trained=$trained " +
        s"lift=${trained >= seed}")
      q.unpersist()
    }
    spark.stop()
  }
}
