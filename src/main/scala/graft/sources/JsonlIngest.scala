package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL landing-zone ingestion with corrupt-record QUARANTINE — the
  * crawl/API dump entry step: never let one malformed line kill a 100 TB
  * load, never silently drop it either. PERMISSIVE parsing routes each
  * unparseable line into a corrupt-record column; [[ingest]] splits the
  * stream into (good rows, quarantined raw lines) so the bad lines can
  * land beside the table for reprocessing and the good path stays a
  * plain typed DataFrame.
  *
  * Scale shape: one pass over the input files (Spark's JSON reader is
  * splittable per line); the split is two filters over the same scan —
  * no shuffle anywhere. Schema is explicit (schema inference at 100 TB
  * is a full extra pass; the landing contract should be declared).
  */
object JsonlIngest {

  val CorruptCol = "_corrupt_record"

  /** Read `path` as text lines parsed against `schema` + quarantine
    * column. Deliberately `text` + `from_json`, NOT `spark.read.json`:
    * the JSON file source forbids plans that project only the corrupt
    * column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the documented
    * workaround is caching the whole input, a non-starter at landing
    * scale), while the text-source form has no such restriction AND
    * keeps the original raw line for the quarantine verbatim.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    spark.read.text(path)
      .select(col("value").as("__raw"),
        from_json(col("value"), withCorrupt, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("__r"))
      .select(col("__raw") +: withCorrupt.fieldNames.toIndexedSeq.map(f => col(s"__r.$f")): _*)
  }

  /** (good rows without the quarantine column, quarantined raw lines).
    * A line is quarantined iff the parser filled the corrupt column —
    * Spark's contract for unparseable lines under PERMISSIVE.
    */
  def ingest(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val raw = read(spark, path, schema)
    val good = raw.where(col(CorruptCol).isNull).drop(CorruptCol, "__raw")
    val bad = raw.where(col(CorruptCol).isNotNull)
      .select(col("__raw").as("raw_line"))
    (good, bad)
  }

  /** CSV sibling of [[read]]/[[ingest]] — same text + `from_csv`
    * quarantine shape (one pass, verbatim bad lines), for headerless
    * delimiter files. Arity is STRICT, unlike JSON's missing-field
    * tolerance: a row with fewer fields than the schema quarantines
    * (spec-pinned), as do unclosed quotes — only a NULL-valued field
    * (`a,,c`) parses through as NULL.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    spark.read.text(path)
      .select(col("value").as("__raw"),
        from_csv(col("value"), withCorrupt, Map(
          "mode" -> "PERMISSIVE",
          "sep" -> delimiter,
          "columnNameOfCorruptRecord" -> CorruptCol)).as("__r"))
      .select(col("__raw") +: withCorrupt.fieldNames.toIndexedSeq.map(f => col(s"__r.$f")): _*)
  }

  def ingestCsv(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): (DataFrame, DataFrame) = {
    val raw = readCsv(spark, path, schema, delimiter)
    val good = raw.where(col(CorruptCol).isNull).drop(CorruptCol, "__raw")
    val bad = raw.where(col(CorruptCol).isNotNull)
      .select(col("__raw").as("raw_line"))
    (good, bad)
  }
}
