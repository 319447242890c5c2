package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-graph analytics (PageRank power iteration).
  *
  * Web-corpus curation ranks hosts/documents by link centrality before
  * sampling (Common-Crawl-style pipelines weight pages by harmonic or
  * PageRank centrality). The reference engine has no graph surface —
  * this is a brief-mandated pipeline operator expressed Spark-first:
  * each power-iteration step is one equi-join (edge src → current rank)
  * plus one destination-keyed partial aggregate, i.e. the same shuffle
  * shape as a Pregel superstep, with Catalyst free to map-side-combine
  * the contribution sums.
  *
  * All arithmetic is 64-bit integer (ranks in parts-per-billion,
  * truncating division), so a run is a pure function of the edge set:
  * the DuckDB oracle replays every iteration exactly, and re-running on
  * different partitionings is bit-identical (sums of longs commute).
  *
  * Scale shape (100 TB): the edge table is the big relation; it is
  * hash-partitioned on `src` ONCE (persisted together with the
  * src-out-degree relation, which shares that partitioning), so each of
  * the `iterations` joins reuses the exchange and only the rank table —
  * |nodes| rows of 16 B — reshuffles per step. Dangling mass (nodes with
  * no out-edges) is dropped, the classic simplification; feed an
  * undirected graph (`undirected = true` emits each edge both ways) when
  * mass conservation matters.
  */
object Graphs {

  /** PageRank over `edges(srcCol, dstCol)` (node ids BIGINT).
    *
    * rank_0(v)   = 10^9 div n
    * rank_i+1(v) = ((10^6 - dampingPpm) * (10^9 div n)) div 10^6
    *             + (dampingPpm * Σ_{(u,v)∈E} (rank_i(u) div outdeg(u))) div 10^6
    *
    * where `div` is truncating integer division and n = |nodes|. Every
    * intermediate fits comfortably in a long (ranks ≤ 10^9, damped sums
    * ≤ 10^6 · n · 10^9 only if a node had 10^6 in-edges each carrying the
    * full mass — contributions are divided by out-degree first, so the
    * damped sum is bounded by 10^6 · 10^9 · avg-indeg/outdeg ≪ 2^63).
    *
    * @param undirected emit each input edge in both directions (dedup'd)
    * @return DataFrame(node BIGINT, rank_ppb BIGINT)
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, dampingPpm: Long = 850000L,
               undirected: Boolean = false): DataFrame = {
    require(iterations >= 1 && iterations <= 100, "iterations must be in [1, 100]")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L, "dampingPpm must be in [0, 10^6]")
    val spark = edges.sparkSession

    val directed = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val e0 = if (undirected) directed.union(directed.select(col("dst").as("src"), col("src").as("dst")))
             else directed
    // multi-edges collapse: PageRank is defined on the simple graph here
    // (the oracle replays DISTINCT edges). Out-degree rides a src-keyed
    // window on the SAME exchange that co-locates the edges for the
    // superstep joins — one pass, no self-join, no double edge build.
    // localCheckpoint = persist + lineage CUT: every superstep below
    // plans against a flat scan, not the whole upstream query (swap for
    // reliable checkpoint() in fault-tolerant production runs).
    import org.apache.spark.sql.expressions.Window
    val eDeg = e0.distinct()
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
      .localCheckpoint()
    val nodes = eDeg.select(col("src").as("node"))
      .union(eDeg.select(col("dst").as("node")))
      .distinct()
    // single-row node count, broadcast onto the rank table (no collect —
    // the count stays inside the plan)
    val nRow = nodes.agg(count(lit(1)).as("n"))
    val base = nodes.crossJoin(broadcast(nRow)).localCheckpoint()

    // Pregel-style supersteps, each MATERIALIZED with its lineage cut.
    // persist() alone is not enough: cached data short-circuits execution
    // but the logical plan still nests one join+agg level per iteration,
    // so analyzer/optimizer/AQE driver time GROWS with the iteration
    // count (measured: step5 3x step1). GraphX checkpoints supersteps for
    // the same reason. State per step: |nodes| × 16 B, distributed.
    var ranks = base.select(col("node"), expr("1000000000L div n").as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contrib = eDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("rank div deg")).as("inc"))
      ranks = base
        .join(contrib, Seq("node"), "left")
        .select(col("node"), (
          expr(s"((${1000000L - dampingPpm}L * (1000000000L div n)) div 1000000L)") +
          expr(s"(${dampingPpm}L * coalesce(inc, 0L)) div 1000000L")).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("rank").as("rank_ppb"))
  }
}
