package graft.tools
import org.apache.spark.sql.SparkSession
import java.nio.file.Paths
object StreamStateAB {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.prepare(spark, sfDir)
    import graft.streaming.FileStreams
    def run(parts: Int): Double = {
      val ev = FileStreams.tableStream(spark, sfDir, "events", Seq("ts"))
      val t0 = System.nanoTime()
      val out = FileStreams.runAvailableNow(
        FileStreams.streamIntervalJoin(ev, "ts", "event_type", "user_id",
          "view", "click", 3600000000L),
        statePartitions = Some(parts))
      val n = out.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ab] parts=$parts%-3d rows=$n wall=$dt%.2f s")
      dt
    }
    run(8) // warm JVM
    Seq(8, 4, 2, 16, 8, 4, 2).foreach(run)
    spark.stop()
  }
}
