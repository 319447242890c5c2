package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense global row ids — 0..n-1 with no gaps, totally ordered by
  * `orderCols` — the sharding/sample-index assignment step
  * (`monotonically_increasing_id` is sparse and partition-dependent;
  * `row_number()` over a global window collapses the corpus into ONE
  * task).
  *
  * Scale shape: range-repartition on the order key, sort within each
  * partition, then `zipWithIndex` (one lightweight count job for the
  * per-partition offsets, one pass to stamp ids — the canonical
  * distributed enumeration). The assigned ids are a pure function of
  * the ORDER, not the partitioning: range boundaries come from sampling,
  * but with `orderCols` forming a unique total order every boundary
  * choice yields the same id for every row (spec-asserted across
  * partition counts; the q_dense_ids oracle replays
  * `row_number() − 1`).
  *
  * Cost note: zipWithIndex round-trips FULL rows through the RDD layer
  * (one deserialization pass). The narrow alternative — enumerate only
  * `orderCols`, equi-join ids back — replaces that pass with a second
  * full-width shuffle of the wide table; for the typical
  * one-off-before-write use the single pass wins. Stamp ids BEFORE
  * attaching heavyweight columns when possible.
  */
object Ids {

  def assignSequential(df: DataFrame, orderCols: Seq[String],
      idCol: String = "seq_id", partitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(!df.columns.contains(idCol), s"column $idCol already exists")
    val p = if (partitions > 0) partitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(p, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    val stamped = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(stamped, schema)
  }
}
