package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Bucketed-table persistence — the co-located-join layout for tables that
  * are joined or aggregated on the same key again and again (the 100 TB
  * pattern: a corpus keyed by doc_id that every dedup/enrichment pass
  * joins, or a fact table repeatedly joined to per-key state).
  *
  * Writing with `bucketBy(n, key)` hash-partitions rows into `n` buckets
  * per the key at WRITE time; a later join or groupBy on that key between
  * two tables with identical bucketing reads co-located buckets and plans
  * with ZERO Exchange operators — the shuffle is paid once at write,
  * amortized over every downstream pass (spec-asserted on the plan).
  * `sortBy` additionally pre-sorts within buckets so sort-merge joins skip
  * their Sort as well.
  *
  * Sizing: pick `buckets` so one bucket of the LARGEST co-bucketed table
  * fits an executor's task comfortably (~128-512 MB compressed). Buckets
  * are fixed at write time — growing data means rewriting with more
  * buckets, so size for the table's target scale, not today's.
  */
object BucketedTables {

  /** Save `df` as a bucketed (optionally bucket-sorted) parquet table.
    * Repartitioning by the bucket key first keeps one output file
    * per (task, bucket) pair from each write task — without it every task
    * writes a file per bucket it sees (tasks x buckets small files).
    * `path` makes the table EXTERNAL at that location (bucketing metadata
    * still lives in the catalog — a plain `spark.read.parquet(path)` won't
    * see it); None uses the session warehouse (managed table).
    */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int,
      sortCols: Seq[String] = Nil, mode: String = "overwrite",
      path: Option[String] = None): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val base: DataFrameWriter[Row] = df
      .repartition(buckets, df(bucketCol))
      .write.mode(mode).format("parquet")
      .bucketBy(buckets, bucketCol)
    val located = path.fold(base)(p => base.option("path", p))
    (if (sortCols.nonEmpty) located.sortBy(sortCols.head, sortCols.tail: _*) else located)
      .saveAsTable(table)
  }

  /** The co-located join: both sides must be tables bucketed on their join
    * key with the SAME bucket count (checked against the catalog, so a
    * mis-bucketed pair fails fast instead of silently planning a shuffle).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      joinCols: Seq[String], joinType: String = "inner"): DataFrame = {
    def bucketSpec(t: String): (Int, Seq[String]) = {
      val cat = spark.sql(s"DESCRIBE TABLE EXTENDED $t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val n = cat.get("Num Buckets").map(_.trim.toInt).getOrElse(0)
      val cols = cat.get("Bucket Columns").toSeq
        .flatMap(_.split(",")).map(_.trim.stripPrefix("[`").stripSuffix("`]").stripPrefix("`").stripSuffix("`"))
      (n, cols)
    }
    val (ln, lc) = bucketSpec(leftTable)
    val (rn, rc) = bucketSpec(rightTable)
    require(ln > 0 && ln == rn,
      s"bucketedJoin needs equal positive bucket counts, got $leftTable=$ln $rightTable=$rn")
    require(joinCols.forall(c => lc.contains(c)) && joinCols.forall(c => rc.contains(c)),
      s"join columns $joinCols must be the bucket columns (left=$lc right=$rc)")
    spark.table(leftTable).join(spark.table(rightTable), joinCols, joinType)
  }
}
