package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed views over the pipeline tables: case-class Encoders give
  * compile-time field safety for pipeline code while the physical plan stays
  * identical to the DataFrame path (encoders are codegen'd, not reflective
  * row mapping).
  */
object typed {

  final case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
  final case class NearDupPair(id1: Long, id2: Long, jaccard_est: Double)
  final case class Neighbor(query_id: Long, rank: Int, neighbor_id: Long, sim: Double)

  def documents(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet").as[Doc]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/embeddings.parquet").as[Embedding]
  }

  /** Typed MinHash-LSH near-duplicate detection. */
  def nearDuplicates(docs: Dataset[Doc], threshold: Double = 0.7): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    Dedup.minHashNearDuplicates(docs.toDF(), "text", "doc_id", threshold = threshold)
      .as[NearDupPair]
  }

  /** Typed brute-force top-k cosine neighbors for a query id set. */
  def topKNeighbors(embs: Dataset[Embedding], queryIds: Set[Long], k: Int): Dataset[Neighbor] = {
    import embs.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val emb = embs.toDF().select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vec"))
    val queries = emb.where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    Embeddings.bruteForceTopK(emb, "vec", "vec_id", queries, "qvec", "qid", k)
      .as[Neighbor]
  }

  /** Typed deterministic stratified sample: n docs per language. */
  def balancedSample(docs: Dataset[Doc], perLang: Int): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    Sampling.stratifiedTake(docs.toDF(), "lang", "text", perLang, "doc_id").as[Doc]
  }

  final case class QuantizedEmbedding(vec_id: Long, q: Array[Int], scale: Double)

  /** Typed int8 embedding quantization (4x storage compression). */
  def quantized(embs: Dataset[Embedding]): Dataset[QuantizedEmbedding] = {
    import embs.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val emb = embs.toDF().select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vec"))
    Embeddings.withInt8Quantized(emb, "vec", "q", "scale")
      .select("vec_id", "q", "scale").as[QuantizedEmbedding]
  }
}
