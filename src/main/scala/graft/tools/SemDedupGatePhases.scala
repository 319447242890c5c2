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
    timed("build (fit + persist index)") {
      graft.sources.SemDedupIndex.build(oldE, "vec", "vec_id", idx, k = 0)
    }
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
    spark.stop()
  }
}
