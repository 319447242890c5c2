package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Embeddings

/** Phase decomposition of the SemDeDup family at a given fixture: fit,
  * assignment, and pairing timed separately, so a decade factor can be
  * attributed to the term that actually moved (r14: the sf100cd gate
  * walls turned out to be scan-SPLIT-throttled — the fixture's
  * single-file embeddings table caps every assignment-riding stage at
  * ~size/128MB tasks — plus a dynamic-partition write trap, neither of
  * them pairing).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf100cd SPARK_DRIVER_MEM=48g \
  *        tools/run_main.sh graft.tools.SemDedupPhaseProbe
  */
object SemDedupPhaseProbe {
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
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sdphase] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    graft.SparkEntry.prepare(spark, sfDir)
    val emb = spark.table("embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vec"))
    val oldE = emb.where(col("vec_id") % 10 =!= 0)
    val newE = emb.where(col("vec_id") % 10 === 0)
    val n = timed("count(old)") { oldE.count() }
    val k = Embeddings.derivedSemDedupK(n)
    println(s"[sdphase] n(old)=$n derived k=$k, " +
      s"input partitions=${emb.rdd.getNumPartitions}")
    val cents = timed("fit (kmeansCentroids, 1 iter)") {
      val c = Embeddings.kmeansCentroids(oldE, "vec", "vec_id", k = 0)
      c.count(); c
    }
    val centSeq = timed("collect centroids") {
      Embeddings.collectCentroidFrame(cents)
    }
    timed("assign old (count only)") {
      Embeddings.kmeansAssign(oldE, "vec", centSeq).count()
    }
    val assigned = timed("assign all + norm + persist") {
      val a = Embeddings.kmeansAssign(emb, "vec", centSeq)
        .select(col("vec_id"), col("vec"), col("cid"))
        .withColumn("__new", col("vec_id") % 10 === 0)
        .withColumn("__norm", Embeddings.vecNorm(col("vec")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      a.count(); a
    }
    timed("pairing join (drop-rule count)") {
      val cand = assigned.where(col("__new"))
      val dropped = cand.as("a").join(assigned.as("b"),
          col("a.cid") === col("b.cid") &&
            (!col("b.__new") || col("b.vec_id") < col("a.vec_id")))
        .where(round((Embeddings.vecDot(col("a.vec"), col("b.vec")) /
            (col("a.__norm") * col("b.__norm"))) * lit(1e6)).cast("long") >= lit(350000L))
        .select(col("a.vec_id")).distinct()
      println(s"[sdphase] dropped = ${dropped.count()}")
    }
    spark.stop()
  }
}
