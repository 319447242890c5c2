package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 nanos-rebuild pushdown evidence: a time-ranged scan over a
  * SYNTHETIC nanos-long parquet run through the `normalizeTimestamps`
  * rebuild, dumped with and without [[graft.plans.PushNanosTimestampFilters]]
  * — `plans/r16/nanos_timerange_{before,after}.txt`.
  *
  * The synthetic fixture is the point: the CURRENT driver fixtures carry
  * plain µs timestamps, where the rebuild is a no-op and time filters
  * already push natively. The nanos-long shape is what earlier driver
  * fixtures used (`spark.sql.legacy.parquet.nanosAsLong`) and the engine
  * still supports; on it the rebuilt filter blocked parquet pushdown
  * entirely until this rule (round-15 verdict item 4).
  *
  * Built WITHOUT the session extension so the rule sits in
  * `experimental.extraOptimizations` (via registerAll) and the
  * before-plan can strip exactly this rule.
  *
  * Run: tools/run_main.sh graft.tools.NanosPlanDump
  */
object NanosPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.registerAll(spark)
    Files.createDirectories(Paths.get("plans/r16"))
    val nd = java.nio.file.Files.createTempDirectory("graft_r16nanos_").toString
    import spark.implicits._
    (0L until 1000L).map(i => (i, i * 777777L, s"t${i % 3}"))
      .toDF("id", "ts", "event_type").write.mode("overwrite").parquet(nd)
    def timeRanged = graft.streaming.FileStreams
      .normalizeTimestamps(spark.read.parquet(nd), Seq("ts"))
      .where(col("ts") >= lit("1970-01-01 00:00:00.0005").cast("timestamp"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    def dump(suffix: String): Unit = {
      val p = Paths.get(s"plans/r16/nanos_timerange_$suffix.txt")
      Files.writeString(p, timeRanged.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println(s"wrote $p")
    }
    dump("after")
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_ == graft.plans.PushNanosTimestampFilters)
    dump("before")
    spark.experimental.extraOptimizations = prev
    spark.stop()
  }
}
