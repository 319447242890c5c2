package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase + JOB decomposition of the q_semdedup_index GATE (round 16: the
  * single most expensive in-suite gate at sf0.1, 3.5 s, untouched in
  * r15). The gate runs build (fit + persist) and refresh (assign + prune
  * + pair) back to back over a temp index; at sf0.1 the embeddings table
  * is 2000 rows, so the wall is driver ACTIONS (per-job floors), not
  * data. This probe counts the jobs each phase launches and times the
  * phases, so an optimization can show which jobs it removed.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *        tools/run_main.sh graft.tools.SemDedupGatePhases [reps]
  */
object SemDedupGatePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)
    def timed[T](label: String)(f: => T): T = {
      Thread.sleep(150) // listener bus is async; let prior job events land
      val j0 = jobs
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(150)
      println(f"[sdgate] $label%-34s ${(System.nanoTime() - t0) / 1e9 - 0.15}%7.3f s  jobs=${jobs - j0}")
      r
    }

    graft.SparkEntry.prepare(spark, sfDir)
    // whole-gate wall (the bench's view), warm reps
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      timed(s"GATE q_semdedup_index rep$i") {
        graft.SparkEntry.queries("q_semdedup_index")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // phase decomposition (mirrors the gate body)
    spark.catalog.clearCache()
    val emb = spark.table("embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vec"))
    val oldE = emb.where(col("vec_id") % 10 =!= 0)
    val newE = emb.where(col("vec_id") % 10 === 0)
    val idx = java.nio.file.Files.createTempDirectory("graft_sdgp_").toString
    // fine-grained fit decomposition (mirrors kmeansFit k<=0, 1 iter)
    val n = timed("  fit: count") { oldE.count() }
    val k = graft.operators.Embeddings.derivedSemDedupK(n)
    val seed = timed("  fit: seed TakeOrdered collect") {
      oldE.orderBy(col("vec_id")).limit(k)
        .select(col("vec_id").cast("long"), col("vec").cast("array<double>"))
        .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
    }
    timed("  fit: lloyd update collect") {
      graft.operators.Embeddings.kmeansAssign(oldE, "vec", seed)
        .select(col("cid"), posexplode(col("vec")))
        .groupBy("cid", "pos")
        .agg(sum(round(col("col") * lit(1e6)).cast("long")).as("s_e6"),
          count(lit(1)).cast("long").as("members"))
        .collect().length
    }
    timed("  build: assign+write members (sim)") {
      graft.operators.Embeddings.kmeansAssign(
          oldE.select(col("vec_id").as("id"), col("vec")), "vec", seed)
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(s"$idx/members_sim")
    }
    val assigned = graft.operators.Embeddings.kmeansAssign(
      oldE.select(col("vec_id").as("id"), col("vec")), "vec", seed)
    timed("  write variant: plain (no partitionBy)") {
      assigned.write.mode("overwrite").parquet(s"$idx/members_plain")
    }
    timed("  write variant: repartition(cid) again") {
      assigned.repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(s"$idx/members_sim")
    }
    timed("  write variant: committer v2") {
      spark.conf.set("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      try assigned.repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(s"$idx/members_v2")
      finally spark.conf.unset("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version")
    }
    timed("  write variant: repartition(4, cid)") {
      assigned.repartition(4, col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(s"$idx/members_r4")
    }
    timed("  fit: lloyd update (broadcast kernel)") {
      graft.operators.Embeddings.kmeansAssign(oldE, "vec", seed, forceBroadcast = true)
        .select(col("cid"), posexplode(col("vec")))
        .groupBy("cid", "pos")
        .agg(sum(round(col("col") * lit(1e6)).cast("long")).as("s_e6"),
          count(lit(1)).cast("long").as("members"))
        .collect().length
    }
    timed("  write variant: broadcast kernel + repartition(4, cid)") {
      graft.operators.Embeddings.kmeansAssign(
          oldE.select(col("vec_id").as("id"), col("vec")), "vec", seed,
          forceBroadcast = true)
        .repartition(4, col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(s"$idx/members_bc")
    }
    timed("build (fit + persist index)") {
      graft.sources.SemDedupIndex.build(oldE, "vec", "vec_id", idx, k = 0)
    }
    val cents2 = timed("  refresh: read+collect centroids") {
      graft.operators.Embeddings.collectCentroidFrame(
        spark.read.parquet(s"$idx/centroids"))
    }
    val an = timed("  refresh: assign new + persist + touched collect") {
      val a = graft.operators.Embeddings.kmeansAssign(newE, "vec", cents2)
        .select(col("vec_id"), col("vec"), col("cid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      a.select(col("cid")).distinct().collect().length
    }
    println(s"[sdgate] touched cells: $an")
    val res = timed("refresh (assign+prune+pair)") {
      graft.sources.SemDedupIndex.refresh(spark, idx, newE, "vec", "vec_id",
          threshold = 0.35)
        .groupBy("cid")
        .agg(count(lit(1)).cast("long").as("members"),
          sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("kept"),
          sum(when(col("keep"), col("vec_id"))).cast("long").as("kept_id_sum"))
        .orderBy("cid")
    }
    timed("rollup collect (localResult)") { res.collect().length }
    // literal-vs-broadcast assignment kernel at small k (the q_kmeans /
    // q_outliers shape, k=8, dim=64): is the literal-argmax expression
    // still worth its codegen size below the current threshold?
    val seed8 = seed.take(8)
    for (r <- 1 to 2) {
      timed(s"  k=8 literal argmax rep$r") {
        graft.operators.Embeddings.kmeansAssign(emb, "vec", seed8)
          .groupBy("cid").count().collect().length
      }
      timed(s"  k=8 broadcast kernel rep$r") {
        graft.operators.Embeddings.kmeansAssign(emb, "vec", seed8, forceBroadcast = true)
          .groupBy("cid").count().collect().length
      }
    }
    spark.stop()
  }
}
