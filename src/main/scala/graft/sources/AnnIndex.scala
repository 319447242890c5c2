package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Embeddings

/** Persisted IVF ANN index — the build-once / probe-many layout for
  * similarity search over a corpus that outlives any one job (the 100 TB
  * pattern: one expensive indexing pass, then every retrieval job reads
  * only the cells it probes).
  *
  * Layout under `dir`:
  *  - `centroids/` — `(cid, cvec)` parquet, nlist rows (config-sized);
  *  - `cells/` — `(id, vec)` parquet PARTITIONED BY `cid`, so a probe
  *    with `cid IN (...)` prunes whole directories at planning time: a
  *    query touching `nprobe` of `nlist` cells reads `nprobe/nlist` of
  *    the corpus bytes, verified on the scan's PartitionFilters
  *    (spec-asserted). No shuffle happens at query time — the cell join
  *    broadcasts the routed queries.
  *
  * Determinism: assignment and ranking reuse [[Embeddings.assignCells]] /
  * the [[Embeddings.ivfTopK]] ranking expressions, so for the same
  * centroids a persisted-index query returns EXACTLY the in-memory
  * `ivfTopK` result (spec-asserted row for row).
  *
  * Sizing: `nlist` scales with corpus size (cells of ~128-512 MB); train
  * centroids with [[Embeddings.kmeansLloyd]] for balanced cells and pass
  * them to [[build]], or let it default to the deterministic seed
  * centroids.
  */
object AnnIndex {

  /** One indexing pass: route every vector to its nearest centroid and
    * persist centroids + cid-partitioned cells.
    */
  def build(embeddings: DataFrame, vecCol: String, idCol: String, dir: String,
      nlist: Int, centroids: Option[DataFrame] = None): Unit = {
    // nlist <= 0 (and no centroids given) derives ~sqrt(n) cells from the
    // corpus count — [[Embeddings.derivedNlist]], the ivfTopK default
    val nl = if (nlist > 0 || centroids.isDefined) nlist
             else Embeddings.derivedNlist(embeddings.count())
    val cents = centroids.getOrElse(
      Embeddings.seedCentroids(embeddings, vecCol, idCol, nl))
      .select(col("cid"), col("cvec"))
    cents.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    // canonical (id, vec) column names on disk, whatever the input called
    // them — query() never needs the build-time names
    Embeddings.assignCells(
        embeddings.select(col(idCol).as("id"), col(vecCol).as("vec")),
        "id", "vec", cents, 1)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/cells")
  }

  /** Incremental maintenance: route NEW vectors through the FROZEN
    * stored centroids and append them to their cell partitions — no
    * rebuild, no touch of existing cell files (dynamic partition append:
    * only directories receiving new vectors gain a file). The
    * incremental-ANN twin of `incrementalSemanticDeduplicate`'s
    * frozen-fit discipline: assignments of old vectors never change, so
    * a post-append [[query]] equals a fresh [[build]] over old ∪ new
    * with the same centroids (spec-asserted). Cells drift from optimal
    * as the corpus grows — re-[[build]] with re-trained centroids when
    * recall telemetry says so; ids are NOT deduplicated (append the same
    * id twice and both rows exist, as with any parquet append).
    */
  def append(newVectors: DataFrame, vecCol: String, idCol: String,
      dir: String): Unit = {
    val spark = newVectors.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids")
    Embeddings.assignCells(
        newVectors.select(col(idCol).as("id"), col(vecCol).as("vec")),
        "id", "vec", cents, 1)
      .write.mode("append").partitionBy("cid").parquet(s"$dir/cells")
  }

  /** Probe the persisted index: route each query to its `nprobe` nearest
    * cells, read ONLY those cell partitions (directory pruning via the
    * collected ≤ nlist cid list — a config-bounded collect, like the
    * k-means centroid collect), rank candidates by exact cosine.
    * Output matches [[Embeddings.ivfTopK]]: (query_id, rank, neighbor_id,
    * sim).
    */
  def query(spark: SparkSession, dir: String, queries: DataFrame,
      queryVecCol: String, queryIdCol: String, k: Int,
      nprobe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
    val qCells = Embeddings.assignCells(queries, queryIdCol, queryVecCol, cents, nprobe)
    val probed = qCells.select(col("cid").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val cells = spark.read.parquet(s"$dir/cells")
      .where(col("cid").isin(probed.toIndexedSeq: _*))
      .withColumn("cid", col("cid").cast("long"))
    val cands = cells
      .join(broadcast(qCells.withColumn("cid", col("cid").cast("long"))), "cid")
      .where(col("id") =!= col(queryIdCol))
      .withColumn("sim", Embeddings.cosine(col("vec"), col(queryVecCol)))
    Embeddings.rankTopKByQuery(cands, queryIdCol, "id", k)
  }
}
