package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Microbenchmark for the Gram-accumulation rewrite (round 8): the fused
  * [[graft.functions.GramAgg]] sweep vs the explode-per-pair Generate +
  * hash-agg form it replaced, on 1M synthetic dim-64 vectors (the
  * VERDICT-requested 1M×64 evidence). Both produce identical (i, j, sum)
  * relations; only the per-row machinery differs — the explode form pushes
  * dim·(dim+1)/2 = 2,080 struct rows per input row through Generate and a
  * 2,080-key hash aggregate.
  *
  * Run: sbt "runMain graft.tools.GramBench [nRows] [dim]"
  */
object GramBench {
  private def timeIt[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  /** The pre-round-8 form, verbatim from Pca.gramMatrix's history. */
  private def gramExplode(df: DataFrame, vecCol: String): DataFrame = {
    val prod = s"element_at(__v, i + 1) * element_at(__v, j + 1)"
    df.select(expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("__v"))
      .select(explode(expr(
        s"""flatten(transform(sequence(0, size(__v) - 1), i ->
              transform(sequence(i, size(__v) - 1), j ->
                named_struct('i', i, 'j', j, 'p', $prod))))""")).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.p").as("p"))
      .groupBy("i", "j").agg(sum("p").as("gram"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic synthetic corpus, materialized once so neither form
    // pays generation cost
    val vecs = spark.range(n).select(
      expr(s"transform(sequence(0, ${dim - 1}), d -> sin(id * 0.7 + d * 0.61))").as("vec"))
      .persist()
    vecs.count()

    def run(name: String, mk: => DataFrame): Double = {
      mk.queryExecution // force planning outside timing of nothing — cheap
      val (_, warm) = timeIt(mk.write.format("noop").mode("overwrite").save())
      val (_, t) = timeIt(mk.write.format("noop").mode("overwrite").save())
      println(f"$name%-18s warm $warm%7.2f s   best $t%7.2f s   (${n / t / 1e6}%5.2f Mrows/s)")
      t
    }
    println(s"=== gram micro: n=$n dim=$dim (${dim * (dim + 1) / 2} pairs/row) local[$cpus]")
    val tAgg = run("gram_agg (fused)", graft.operators.Pca.gramMatrix(vecs, "vec"))
    val tExp = run("explode+hash-agg", gramExplode(vecs, "vec"))
    println(f"speedup: ${tExp / tAgg}%.1fx")
    spark.stop()
  }
}
