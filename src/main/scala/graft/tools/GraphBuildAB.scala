package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the GraphIndex.build plan shapes (round-15 verdict ask #1): the
  * shipped one-exchange form (repartition(src) → in-place distinct →
  * in-place degree agg → same-partitioning shuffled-hash join) against
  * the former distinct → groupBy → SMJ join form, on the same fixture,
  * alternating runs. Prints the physical plan of the write input (count
  * the Exchanges) and per-run walls.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10cd SPARK_DRIVER_MEM=48g \
  *        tools/run_main.sh graft.tools.GraphBuildAB [reps]
  */
object GraphBuildAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.rdd.compress", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[graphab] $label%-28s $s%.3f s")
      s
    }
    graft.SparkEntry.prepare(spark, sfDir)
    val edges = graft.SparkEntry.sharedPurchaseEdges(spark, sfDir)

    def mirrored: DataFrame = {
      val d = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      d.union(d.select(col("dst").as("src"), col("src").as("dst")))
    }
    // former shape, inline (distinct → groupBy → plain join)
    def oldEDeg: DataFrame = {
      val dedup = mirrored.distinct()
      val degrees = dedup.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
      dedup.join(degrees, Seq("src"))
    }
    println("=== NEW plan (one exchange expected) ===")
    val newEDeg = {
      val dedup = mirrored.repartition(col("src")).distinct()
      val degrees = dedup.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
      dedup.join(degrees.hint("shuffle_hash"), Seq("src"))
    }
    newEDeg.explain("formatted")
    // window variant: one exchange + ONE sort; dedup via row_number over
    // (src, dst), degree via a src-partition count window that reuses the
    // same sort order — no hash tables, no join
    import org.apache.spark.sql.expressions.Window
    def winEDeg = {
      val parted = mirrored.repartition(col("src"))
      parted
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("src"), col("dst")).orderBy(col("src"))))
        .where(col("__rn") === 1).drop("__rn")
        .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src")))
          .cast("long"))
    }
    println("=== WIN plan (one exchange + one sort expected) ===")
    winEDeg.explain("formatted")
    println("=== OLD plan ===")
    oldEDeg.explain("formatted")

    val art = "/tmp/graphab_artifact"
    def nodesOf(edgesPath: String, outPath: String): Unit = {
      val eDeg = spark.read.parquet(edgesPath)
      eDeg.select(col("src").as("node"))
        .union(eDeg.select(col("dst").as("node")))
        .distinct()
        .write.mode("overwrite").parquet(outPath)
    }
    (1 to reps).foreach { i =>
      timed(s"NEW build rep$i") {
        graft.sources.GraphIndex.build(edges, "src", "dst", art, undirected = true)
      }
      val eCnt = spark.read.parquet(s"$art/edges").count()
      val nCnt = spark.read.parquet(s"$art/nodes").count()
      timed(s"WIN build rep$i") {
        winEDeg.write.mode("overwrite").parquet(s"$art/edges_win")
        nodesOf(s"$art/edges_win", s"$art/nodes_win")
      }
      val eCntW = spark.read.parquet(s"$art/edges_win").count()
      val nCntW = spark.read.parquet(s"$art/nodes_win").count()
      timed(s"OLD build rep$i") {
        oldEDeg.write.mode("overwrite").parquet(s"$art/edges_old")
        nodesOf(s"$art/edges_old", s"$art/nodes_old")
      }
      val eCntO = spark.read.parquet(s"$art/edges_old").count()
      val nCntO = spark.read.parquet(s"$art/nodes_old").count()
      println(s"[graphab] rep$i counts new=($eCnt,$nCnt) win=($eCntW,$nCntW) old=($eCntO,$nCntO) " +
        (if (eCnt == eCntO && nCnt == nCntO && eCntW == eCnt && nCntW == nCnt) "MATCH" else "MISMATCH"))
    }
    // value-level equality once (set semantics)
    val d1 = spark.read.parquet(s"$art/edges")
    val d2 = spark.read.parquet(s"$art/edges_old")
    val dw = spark.read.parquet(s"$art/edges_win")
    val diff = d1.exceptAll(d2).count() + d2.exceptAll(d1).count()
    val diffW = dw.exceptAll(d2).count() + d2.exceptAll(dw).count()
    println(s"[graphab] edges exceptAll diff new=$diff win=$diffW " +
      (if (diff == 0 && diffW == 0) "IDENTICAL" else "DIFFER"))
    spark.stop()
  }
}
