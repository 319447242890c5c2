package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q_editdist_names pipeline (scratch probe;
  * not part of the library surface). usage: EditDistProbe <sfDir> */
object EditDistProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val dict = cust.groupBy(col("c_name").as("name"))
      .agg(min("c_custkey").cast("long").as("id"))
    dict.persist().count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm
    graft.operators.EditDistance.selfJoin(dict, "id", "name", 1, "deletion").count()

    (1 to 2).foreach { i =>
      time(s"full selfJoin pass $i") {
        graft.operators.EditDistance.selfJoin(dict, "id", "name", 1, "deletion")
          .groupBy("dist").agg(count(lit(1))).collect()
      }
    }

    // candidate generation only (no verify joins)
    val delKeys =
      """array_distinct(concat(
        |  array(__s),
        |  if(__l < 1, array(), transform(sequence(1, __l), i ->
        |    concat(substr(__s, 1, i - 1), substr(__s, i + 1))))))""".stripMargin
    val a = dict.select(col("id").as("__id"), col("name").as("__s"),
      length(col("name")).as("__l"))
    def keyed(idOut: String, lenOut: String) =
      a.select(col("__id").as(idOut), col("__l").as(lenOut),
          explode(expr(delKeys)).as("__v"))
        .select(col(idOut), col(lenOut), xxhash64(col("__v")).as("__vh"))
    (1 to 2).foreach { i =>
      time(s"explode+hash only pass $i") {
        keyed("__ida", "__la").agg(count(lit(1))).collect()
      }
      time(s"candidates join pass $i") {
        keyed("__ida", "__la").join(keyed("__idb", "__lb"), Seq("__vh"))
          .where(abs(col("__la") - col("__lb")) <= 1)
          .agg(count(lit(1))).collect()
      }
      time(s"candidates+distinct pass $i") {
        keyed("__ida", "__la").join(keyed("__idb", "__lb"), Seq("__vh"))
          .where(abs(col("__la") - col("__lb")) <= 1)
          .select("__ida", "__idb").distinct().agg(count(lit(1))).collect()
      }
    }
    val cand = keyed("__ida", "__la").join(keyed("__idb", "__lb"), Seq("__vh"))
      .where(abs(col("__la") - col("__lb")) <= 1)
      .select("__ida", "__idb").distinct()
    println("[probe] candidate pairs: " + cand.count())
    time("verify joins + levenshtein") {
      cand
        .join(dict.select(col("id").as("__ida"), col("name").as("__sa")), "__ida")
        .join(dict.select(col("id").as("__idb"), col("name").as("__sb")), "__idb")
        .select(levenshtein(col("__sa"), col("__sb"), 1).as("d"))
        .where(col("d") >= 0).agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
