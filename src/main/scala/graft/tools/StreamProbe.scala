package graft.tools
import org.apache.spark.sql.SparkSession
object StreamProbe {
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
    // listener to capture query progress
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = events.add(s"START ${e.id}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        events.add(f"BATCH ${p.batchId} rows=${p.numInputRows} trigger=${p.durationMs.get("triggerExecution")}ms addBatch=${p.durationMs.getOrDefault("addBatch",-1L)}ms getBatch=${p.durationMs.getOrDefault("getBatch",-1L)}ms walCommit=${p.durationMs.getOrDefault("walCommit",-1L)}ms stateCommit=${Option(p.stateOperators).map(_.map(so => so.commitTimeMs).sum).getOrElse(-1L)}ms")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = events.add("END")
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q_stream_join")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"[sp] q_stream_join wall ${(System.nanoTime()-t0)/1e9}%.2f s")
    Thread.sleep(500)
    events.forEach(e => println("[sp] " + e))
    spark.stop()
  }
}
