import org.apache.spark.sql.SparkSession
object CheckQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    println("COUNT=" + df.count())
    df.show(10, false)
    spark.stop()
  }
}
