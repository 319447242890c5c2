package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Ids

/** Wide-table micro-bench (not a gate) for the two
  * [[Ids.assignSequential]] paths: full-row zipWithIndex vs narrow
  * enumerate + equi-join, on a fixture whose rows carry a ~1 KB payload
  * (the multimodal-table shape the narrow option exists for).
  * Run: sbt "runMain graft.tools.IdsBench [nRows]"
  */
object IdsBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~1 KB deterministic payload per row; key is a shuffled unique long
    val wide = spark.range(n)
      .select((col("id") * 2654435761L % n).as("k"),
        repeat(conv(abs(xxhash64(col("id"))).cast("string"), 10, 36), 64).as("payload"))
      .persist()
    println(s"[ids-bench] rows ${wide.count()}, payload ~1 KB")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ids-bench] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (checksum $r)")
    }
    // checksum = sum((k * seq_id) mod p): catches any id drift between
    // paths without overflowing the running sum at large n
    val check = sum(pmod(col("k") * col("seq_id"), lit(1000000007L)))
    t("wide (zipWithIndex)") {
      Ids.assignSequential(wide, Seq("k")).agg(check).head().getLong(0)
    }
    t("narrow (enumerate + join)") {
      Ids.assignSequential(wide, Seq("k"), narrow = true).agg(check).head().getLong(0)
    }
    spark.stop()
  }
}
