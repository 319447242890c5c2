package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of q_editdist_names: dictionary checkpoint,
  * candidate generation, verify join-backs, final rollup — where do the
  * gate's ~2.3 s at sf0.1 actually go?
  */
object EditDistPhaseProbe {
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
    graft.SparkEntry.prepare(spark, sfDir)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ed] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val dictPlan = spark.table("customer").groupBy(col("c_name").as("name"))
        .agg(min("c_custkey").cast("long").as("id"))
        .select(col("id").as("__id"), col("name").as("__s"),
          length(col("name")).as("__l"))
      val a = timed("dict groupBy + localCheckpoint") {
        val x = dictPlan.localCheckpoint(); x
      }
      timed("variant explode + hash (noop, 1 side)") {
        noop(a.select(col("__id"), explode(expr(
          """array_distinct(concat(
            |  array(__s),
            |  if(__l < 1, array(), transform(sequence(1, __l), i ->
            |    concat(substr(__s, 1, i - 1), substr(__s, i + 1))))))""".stripMargin)).as("__v"))
          .select(col("__id"), xxhash64(col("__v")).as("__vh")))
      }
      timed("full gate (noop)") {
        noop(graft.SparkEntry.queries("q_editdist_names")(spark, sfDir))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
