package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Embeddings

/** ANN recall evidence (not a gate): seed vs Lloyd-trained PQ codebooks
  * and global vs residual IVFPQ, all measured with [[Embeddings.recallReport]]
  * against the exact cosine baseline at fixed m/ksub. The table this
  * prints is committed to SCALE.md — the go/no-go numbers behind
  * `pqCodebooksTrained` and `ivfPqTopK(residual = true)`.
  * Run: sbt "runMain graft.tools.AnnRecallAudit /root/testdata/sf0.01 [k]"
  */
object AnnRecallAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // L2-normalized corpus: unit norms make the ADC (squared-L2) ranking
    // EQUAL the cosine ranking the exact baseline uses, so recall
    // measures pure quantization loss, not metric mismatch — the honest
    // frame for a codebook-quality comparison (production embedding
    // pipelines normalize for the same reason).
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        Embeddings.normalize(expr("transform(embedding, x -> CAST(x AS DOUBLE))")).as("vec"))
      .persist()
    val n = emb.count()
    val queries = emb.where(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("vec").as("qvec")).persist()
    println(s"[ann-recall] corpus $n vectors, ${queries.count()} queries, k=$k ($dir)")

    val exact = Embeddings.bruteForceTopK(emb, "vec", "vec_id",
      queries, "qvec", "qid", k).persist()
    exact.count(): Unit

    def report(name: String, approx: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = Embeddings.recallReport(approx, exact).head()
      println(f"[ann-recall] $name%-34s mean ${r.getLong(1)}%7d ppm  min ${r.getLong(2)}%7d  perfect ${r.getLong(3)}%3d/${r.getLong(0)}%d  (${(System.nanoTime() - t0) / 1e9}%6.1f s)")
    }

    val m = 8; val ksub = 16
    // --- PQ flat: seed vs trained codebooks ---------------------------
    report(s"pq seed (m=$m ksub=$ksub)",
      Embeddings.pqTopK(emb, "vec", "vec_id", queries, "qvec", "qid", k, m, ksub))
    for (it <- Seq(1, 3)) {
      val cb = Embeddings.pqCodebooksTrained(emb, "vec", "vec_id", m, ksub, it)
      report(s"pq trained it=$it",
        Embeddings.pqTopK(emb, "vec", "vec_id", queries, "qvec", "qid", k, m, ksub,
          codebooks = Some(cb)))
    }
    // --- IVFPQ: global vs residual, seed vs trained residual ----------
    val nlist = 16; val nprobe = 4
    report(s"ivfpq global (nlist=$nlist nprobe=$nprobe)",
      Embeddings.ivfPqTopK(emb, "vec", "vec_id", queries, "qvec", "qid", k,
        nlist, nprobe, m, ksub))
    report("ivfpq residual (seed cb)",
      Embeddings.ivfPqTopK(emb, "vec", "vec_id", queries, "qvec", "qid", k,
        nlist, nprobe, m, ksub, residual = true))
    val cents = Embeddings.seedCentroids(emb, "vec", "vec_id", nlist)
    val res = Embeddings.ivfPqResiduals(emb, "vec", "vec_id", cents).persist()
    val cbR = Embeddings.pqCodebooksTrained(res, "__rv", "vec_id", m, ksub, 1)
    report("ivfpq residual (trained cb it=1)",
      Embeddings.ivfPqTopK(emb, "vec", "vec_id", queries, "qvec", "qid", k,
        nlist, nprobe, m, ksub, codebooks = Some(cbR), residual = true))
    // the realistic residual setup: Lloyd-balanced coarse cells (residual
    // encoding only pays off when the cells actually capture structure)
    val kcents = Embeddings.kmeansCentroids(emb, "vec", "vec_id", nlist, 3)
      .persist()
    kcents.count(): Unit
    report("ivfpq global (kmeans cells)",
      Embeddings.ivfPqTopK(emb, "vec", "vec_id", queries, "qvec", "qid", k,
        nlist, nprobe, m, ksub, centroids = Some(kcents)))
    val resK = Embeddings.ivfPqResiduals(emb, "vec", "vec_id", kcents).persist()
    for (it <- Seq(0, 1)) {
      val cbRK = Embeddings.pqCodebooksTrained(resK, "__rv", "vec_id", m, ksub, it)
      report(s"ivfpq residual (kmeans cells, cb it=$it)",
        Embeddings.ivfPqTopK(emb, "vec", "vec_id", queries, "qvec", "qid", k,
          nlist, nprobe, m, ksub, centroids = Some(kcents),
          codebooks = Some(cbRK), residual = true))
    }

    spark.stop()
  }
}
