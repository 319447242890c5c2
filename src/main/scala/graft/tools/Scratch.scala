package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only micro-profiler for gate query shapes (not part of the surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.registerAll(spark)

    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStarts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = jobStarts.get(je.jobId)
        println(f"[job] ${je.jobId}%3d took ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; c <- si.completionTime} yield (c - s) / 1e3
        println(f"[stage] ${si.stageId}%3d ${si.name.take(60)}%-60s tasks=${si.numTasks}%3d ${dur.getOrElse(-1.0)}%7.3f s")
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        if (d > 500) println(f"[task]  stage=${te.stageId}%3d dur=${d / 1e3}%7.3f s gc=${te.taskMetrics.jvmGCTime / 1e3}%6.3f s " +
          f"deser=${te.taskMetrics.executorDeserializeTime / 1e3}%6.3f s cpu=${te.taskMetrics.executorCpuTime / 1e9}%7.3f s")
      }
    })

    def t(name: String)(q: String): Unit = {
      val t0 = System.nanoTime()
      spark.sql(q).write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    val h = "bitfilters_duckdb_hash('v1.5.1', id)"
    t("warmup (plain agg)")(s"SELECT COUNT(*), MAX($h) FROM range(1, 100001)")
    val oldFuse = s"""
      SELECT 0 AS filter_rem,
             COUNT(CASE WHEN binary_fuse16_filter_contains(
               (SELECT binary_fuse16_filter($h) FROM range(1, 100001) WHERE id % 2 = 0), $h) THEN 1 END) AS fp16,
             COUNT(CASE WHEN binary_fuse8_filter_contains(
               (SELECT binary_fuse8_filter($h) FROM range(1, 100001) WHERE id % 2 = 0), $h) THEN 1 END) AS fp8
      FROM range(1, 100001) WHERE id % 2 = 1
      UNION ALL
      SELECT 1 AS filter_rem,
             COUNT(CASE WHEN binary_fuse16_filter_contains(
               (SELECT binary_fuse16_filter($h) FROM range(1, 100001) WHERE id % 2 = 1), $h) THEN 1 END) AS fp16,
             COUNT(CASE WHEN binary_fuse8_filter_contains(
               (SELECT binary_fuse8_filter($h) FROM range(1, 100001) WHERE id % 2 = 1), $h) THEN 1 END) AS fp8
      FROM range(1, 100001) WHERE id % 2 = 0
      ORDER BY filter_rem"""
    spark.sql(oldFuse).explain("formatted")
    t("OLD fuse_golden (4 subq)")(oldFuse)
    def branch(family: String, buildPar: Int): String = s"""
      SELECT COUNT(CASE WHEN ${family}_filter_contains(
        (SELECT ${family}_filter($h) FROM range(1, 100001) WHERE id % 2 = $buildPar), $h) THEN 1 END)
      FROM range(1, 100001) WHERE id % 2 = ${1 - buildPar}"""
    t("fuse16 build-even probe-odd")(branch("binary_fuse16", 0))
    t("fuse16 build-odd probe-even")(branch("binary_fuse16", 1))
    t("fuse8 build-even probe-odd")(branch("binary_fuse8", 0))
    t("fuse8 build-odd probe-even")(branch("binary_fuse8", 1))
    t("xor16 build-odd probe-even")(branch("xor16", 1))
    spark.stop()
  }
}
