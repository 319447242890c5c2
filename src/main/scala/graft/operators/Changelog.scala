package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog compaction (CDC upsert, latest-wins with delete markers).
  *
  * Ingest pipelines land append-only change streams (inserts, updates,
  * tombstones) and periodically compact them to current state — the MERGE
  * INTO / "latest row per key" pattern. The reference engine has no
  * mutable-state surface; this is a brief-mandated pipeline operator.
  *
  * Shape: ONE key-partitioned aggregate. The per-key argmax is
  * `max(struct(seq..., payload...))` — lexicographic struct comparison.
  * A struct-valued buffer means SortAggregate (not hash), but in
  * partial+final mode: each input partition locally sorts by KEY, folds
  * its rows to one candidate per key, and the exchange ships at most one
  * row per (input-partition, key) — never the full change history. The
  * window-replay `row_number` alternative shuffles EVERY change row and
  * sorts whole key groups on (key, seq); the oracle replays that form to
  * pin equivalence. Delete markers ride to
  * the argmax and are filtered after it: a key whose LATEST change is a
  * tombstone disappears from the output, while older tombstones are
  * overridden by later upserts — exactly MERGE semantics.
  */
object Changelog {

  /** Compact `changes` to latest state per `keyCols`.
    *
    * Ordering is lexicographic on `seqCols` (latest = max); make the
    * sequence unique per key (e.g. `Seq(ts, change_id)`) or ties resolve
    * by the remaining payload columns' struct order. `isDelete` marks
    * tombstone rows; pass `lit(false)` for pure upsert streams.
    *
    * Output: one row per surviving key with the original schema.
    */
  def compactLatest(changes: DataFrame, keyCols: Seq[String],
                    seqCols: Seq[String], isDelete: Column): DataFrame = {
    require(keyCols.nonEmpty, "compactLatest needs at least one key column")
    require(seqCols.nonEmpty, "compactLatest needs at least one sequence column")
    val payload = changes.columns.filterNot(keyCols.contains).toSeq
    val ordered = struct((seqCols ++ payload.filterNot(seqCols.contains))
      .map(col) :+ isDelete.cast("boolean").as("__del"): _*)
    changes
      .groupBy(keyCols.map(col): _*)
      .agg(max(ordered).as("__latest"))
      .where(!col("__latest.__del"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** Incremental MERGE: apply a change slice onto an existing compacted
    * snapshot — `applyChanges(compact(h1), h2) == compact(h1 ∪ h2)`
    * whenever every change in the slice sequences AFTER the snapshot
    * (the normal incremental-refresh invariant; a base row only survives
    * its key appearing in the slice if it would win the seq order, which
    * under the invariant it never does). Implemented as one
    * [[compactLatest]] over the union — base rows enter as live upserts
    * with their stored sequence — so the cost is ONE key-partitioned
    * aggregate over |snapshot| + |slice| rows, not a re-fold of history.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   seqCols: Seq[String], isDelete: Column): DataFrame = {
    require(base.columns.sorted.sameElements(changes.columns.sorted),
      s"base/changes schemas differ: ${base.columns.mkString(",")} vs ${changes.columns.mkString(",")}")
    compactLatest(base.select(changes.columns.toIndexedSeq.map(col): _*).union(changes),
      keyCols, seqCols, isDelete)
  }
}
