package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * BINARY columns with typed metadata structs, and decode / feature-extract /
  * resize / frame-sample run as batched partition-parallel transforms.
  *
  * The Spark-side architecture (schemas, batching shape, partition
  * parallelism, deterministic outputs) is real and tested; the actual codec
  * calls are STUBBED behind [[StubCodec]] because no image/audio libraries
  * exist in this container — swap `StubCodec` for a real decoder (JNI or
  * subprocess) without touching any of the plumbing.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** STUB codec: deterministic fake decode deriving metadata and a feature
    * vector from the payload bytes. Replace with a real decoder in
    * production; every call site goes through this object.
    */
  object StubCodec {
    /** ??? in production: image/audio decode. Deterministic fake here. */
    def decodeMeta(kind: String, bytes: Array[Byte]): (Int, Int, Int, Long) = {
      val h = graft.core.DuckDbHash.hashBytes(bytes)
      val width = 64 + ((h >>> 8) & 0x3ff).toInt   // 64..1087
      val height = 64 + ((h >>> 20) & 0x3ff).toInt
      val channels = 1 + ((h >>> 32) & 3).toInt     // 1..4
      val durationMs = if (kind == "image") 0L else 1000L + ((h >>> 34) & 0xffff)
      (width, height, channels, durationMs)
    }

    /** ??? in production: model embedding / mel features. Deterministic fake. */
    def extractFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val rng = new graft.core.Hashing.SplitMix64(graft.core.DuckDbHash.hashBytes(bytes))
      Array.fill(dim)(((rng.next() >>> 11).toDouble / (1L << 53).toDouble).toFloat)
    }
  }

  /** Decode a binary payload column into a metadata struct + feature vector.
    *
    * Runs as `mapPartitions` with an internal batch iterator (`batchSize`
    * rows at a time), mirroring the arrow-batch shape a Pandas-UDF pipeline
    * would use: a real codec amortizes model/codec init per batch, not per
    * row. No shuffle is introduced; partitioning is inherited.
    */
  def decodeAndFeaturize(df: DataFrame, idCol: String, binCol: String,
      kind: String = "image", featureDim: Int = 64, batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("meta", mediaMetaSchema, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val input = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch codec "session" — where a real implementation would
        // initialize/reuse its decoder state
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val (w, h, c, d) = StubCodec.decodeMeta(kind, bytes)
          Row(id, Row(kind, w, h, c, d), StubCodec.extractFeatures(bytes, featureDim))
        }
      }
    }
  }

  /** Resize plan: pure metadata transform computing target dims preserving
    * aspect ratio (the byte-level resample is codec work, stubbed).
    */
  def withResizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(1.0), lit(maxSide.toDouble) / greatest(w, h))
    decoded
      .withColumn("target_width", ceil(w * scale).cast("int"))
      .withColumn("target_height", ceil(h * scale).cast("int"))
  }

  /** Frame sampling plan for video/audio: one row per sampled frame
    * timestamp at `fps`. explode() keeps it fully parallel.
    */
  def sampleFrames(decoded: DataFrame, fps: Double): DataFrame = {
    val frames = greatest(lit(1L),
      (col("meta.duration_ms") / lit(1000.0) * lit(fps)).cast("long"))
    decoded.withColumn("frame_idx",
        explode(sequence(lit(0L), frames - 1)))
      .withColumn("frame_ts_ms",
        (col("frame_idx") * lit(1000.0) / lit(fps)).cast("long"))
  }
}
