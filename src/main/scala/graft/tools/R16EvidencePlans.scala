package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 evidence plan dumps for changes that live in EAGER build
  * phases or views (invisible in the declared gates' lazy explains, same
  * pattern as r15's graph_derivation dumps):
  *
  *  - `semdedup_members_write`: the SemDedupIndex.build assignment+write
  *    frame — shows the assignment kernel (literal `greatest` chain vs
  *    broadcast NearestCentroid) and the repartition fan-out feeding the
  *    cid-partitioned write.
  *  - `semdedup_refresh`: the refresh frame over a freshly built index —
  *    shows the same kernel in the slice assignment plus the partition-
  *    pruned members read.
  *  - `nanos_timerange`: a representative time-ranged scan over a
  *    SYNTHETIC nanos-long parquet run through the normalizeTimestamps
  *    rebuild — shows whether the nanos-space bound reaches
  *    PushedFilters at the parquet scan. (The current driver fixtures
  *    carry plain µs timestamps, where the rebuild is a no-op and
  *    filters already push natively; the nanos path is the
  *    `nanosAsLong` shape earlier driver fixtures used and the engine
  *    still supports.) Both suffixes come from ONE run: `_after` with
  *    the rule, `_before` with PushNanosTimestampFilters stripped from
  *    the rule set.
  *
  * Run: tools/run_main.sh graft.tools.R16EvidencePlans <suffix>
  */
object R16EvidencePlans {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get("plans/r16"))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val out = Paths.get(s"plans/r16/${name}_$suffix.txt")
      Files.writeString(out, df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println(s"wrote $out")
    }

    graft.SparkEntry.prepare(spark, sfDir)
    val emb = spark.table("embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vec"))
    val oldE = emb.where(col("vec_id") % 10 =!= 0)
    val newE = emb.where(col("vec_id") % 10 === 0)

    // the build's assignment+write frame (explain of the pre-write plan;
    // the write itself is eager). Mirror of SemDedupIndex.build's body.
    val n = oldE.count()
    val k = graft.operators.Embeddings.derivedSemDedupK(n)
    val seed = oldE.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").cast("long"), col("vec").cast("array<double>"))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
    // mirrors SemDedupIndex.build's write frame at each revision: the
    // shipped form repartitioned by cid at the session shuffle fan-out;
    // round 16 derives ~k/8 write tasks (CellsPerWriteTask)
    val assignedOld = graft.operators.Embeddings.kmeansAssign(
      oldE.select(col("vec_id").as("id"), col("vec")), "vec", seed)
    dump("semdedup_members_write",
      if (suffix == "before") assignedOld.repartition(col("cid"))
      else assignedOld.repartition(
        math.max(4, math.min(2048, (k + 7) / 8)), col("cid")))

    val idx = java.nio.file.Files.createTempDirectory("graft_r16plans_").toString
    graft.sources.SemDedupIndex.build(oldE, "vec", "vec_id", idx, k = 0)
    dump("semdedup_refresh",
      graft.sources.SemDedupIndex.refresh(spark, idx, newE, "vec", "vec_id",
        threshold = 0.35))

    spark.stop()
  }
}
