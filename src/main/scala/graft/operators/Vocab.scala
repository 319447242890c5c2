package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-vocabulary induction: byte-pair-encoding merge learning over
  * a corpus (Sennrich et al., "Neural Machine Translation of Rare Words
  * with Subword Units" — the standard subword tokenizer trainer).
  *
  * Each round counts ADJACENT SYMBOL PAIRS across the corpus (weighted by
  * word frequency, overlapping occurrences counted as the reference
  * implementation does), picks the most frequent pair (ties broken by
  * smallest (p1, p2) — deterministic), and rewrites every word by merging
  * that pair's non-overlapping left-to-right occurrences. The learned
  * merge table IS the tokenizer: applying the merges in order tokenizes
  * new text.
  *
  * Scale shape: the corpus is tokenized ONCE into a (word, count) vocab
  * relation — all iteration happens on the vocabulary (distinct words),
  * which is orders of magnitude smaller than the corpus and shrinks
  * per-round work to one pair-count aggregate (map-side partials) plus a
  * `TakeOrdered(1)` argmax. The driver holds only the current best pair
  * per round (one tiny collect, like kmeans' centroid rounds); the vocab
  * frame is persisted per round and the predecessor unpersisted. The
  * merge-apply is a codegen'd `aggregate` fold over each word's symbol
  * array — row-local, no shuffle.
  *
  * Every step is plain string/array arithmetic, so another engine can
  * replay whole training runs exactly — the q_bpe DuckDB oracle replays
  * all rounds (pair stats, argmax tie-break, and the left-to-right
  * non-overlapping merge walk) from scratch.
  */
object Vocab {

  /** Left-to-right non-overlapping merge of (p1, p2) -> p1+p2 over a
    * symbol array, as a single codegen'd fold: the state carries the
    * accumulated output and one pending symbol; a merge consumes the
    * pending symbol so "a a a" under (a,a) yields [aa, a], never [aa, aa].
    */
  private def applyMerge(syms: Column, p1: String, p2: String): Column = {
    val merged = lit(p1 + p2)
    aggregate(syms,
      struct(array().cast("array<string>").as("acc"), lit(null).cast("string").as("pend")),
      (st, s) => {
        val acc = st.getField("acc")
        val pend = st.getField("pend")
        when(pend.isNull, struct(acc.as("acc"), s.as("pend")))
          .when(pend === lit(p1) && s === lit(p2),
            struct(concat(acc, array(merged)).as("acc"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(acc, array(pend)).as("acc"), s.as("pend")))
      },
      st => when(st.getField("pend").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("pend")))))
  }

  /** The (word, cnt, syms) vocabulary relation BPE iterates on: distinct
    * lowercased whitespace tokens with corpus frequencies, split into
    * single-character symbols.
    */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(filter(split(lower(col(textCol)), "\\s+"),
        t => t =!= lit(""))).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("syms",
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))

  /** Learn `numMerges` BPE merges from the corpus. Returns one row per
    * merge: (step, p1, p2, pair_count), in learning order. Stops early
    * (fewer rows) when no adjacent pair remains (every word fully
    * merged).
    */
  def bpeMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = docs.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var vocab = wordVocab(docs, textCol).persist(lvl)
    // predecessor kept cached until the NEXT round's argmax has executed
    // (which materializes the successor as a side effect) — unpersisting
    // eagerly would force a dedicated count() job per round just to
    // materialize before the drop (guide §1.2: one vocab-sized pass per
    // merge removed; measured ~0.4 s over 6 merges at sf0.1). Peak cache =
    // two vocab-sized relations, the same transient peak the eager form had.
    var stale: DataFrame = null
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      // guard the fully-merged case: Spark's sequence(1, 0) counts DOWN
      // ([1, 0]) instead of returning an empty array, which would emit
      // junk null-symbol pairs for single-symbol words
      val best = vocab
        .select(col("cnt"), explode(expr(
          "CASE WHEN size(syms) < 2 THEN CAST(array() AS ARRAY<STRUCT<p1: STRING, p2: STRING>>) " +
          "ELSE transform(sequence(1, size(syms) - 1), i -> named_struct('p1', syms[i - 1], 'p2', syms[i])) END")).as("p"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum("cnt").cast("long").as("c"))
        .orderBy(desc("c"), asc("p1"), asc("p2"))
        .limit(1).collect()
      // this round's argmax executed over `vocab`, materializing its cache
      // — the round-before-last's relation is now safely droppable
      if (stale != null) { stale.unpersist(); stale = null }
      if (best.isEmpty) done = true
      else {
        val (p1, p2, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((step, p1, p2, c))
        val next = vocab.withColumn("syms", applyMerge(col("syms"), p1, p2)).persist(lvl)
        stale = vocab
        vocab = next
        step += 1
      }
    }
    if (stale != null) stale.unpersist()
    vocab.unpersist()
    import spark.implicits._
    out.toSeq.toDF("step", "p1", "p2", "pair_count")
      .select(col("step").cast("long").as("step"), col("p1"), col("p2"), col("pair_count"))
  }

  /** Tokenize text with a learned merge table: applies the merges in
    * order to each word's character symbols — the inference side of
    * [[bpeMerges]]. `merges` is the (step, p1, p2, *) frame the trainer
    * returned (collected to the driver; merge tables are small by
    * construction). Returns the input plus `bpe_tokens ARRAY<STRING>`.
    */
  def bpeTokenize(docs: DataFrame, textCol: String, merges: DataFrame,
      outCol: String = "bpe_tokens"): DataFrame = {
    val table = merges.select("step", "p1", "p2").collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
    val words = expr(s"transform(filter(split(lower($textCol), '\\\\s+'), t -> t != ''), " +
      "w -> transform(sequence(1, length(w)), i -> substring(w, i, 1)))")
    val mergedWords = table.foldLeft(words) { case (c, (p1, p2)) =>
      transform(c, w => applyMerge(w, p1, p2))
    }
    docs.withColumn(outCol, flatten(mergedWords))
  }

  /** Corpus token frequencies under a learned merge table — the vocab
    * report shipped with a tokenizer. Computed on the DISTINCT-WORD vocab
    * relation and reweighted by corpus word counts: identical to exploding
    * [[bpeTokenize]] over every document, at vocab-sized cost (the merge
    * fold runs once per distinct word, not once per occurrence).
    */
  def bpeTokenCounts(docs: DataFrame, textCol: String,
      merges: DataFrame): DataFrame = {
    val table = merges.select("step", "p1", "p2").collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
    val merged = table.foldLeft(col("syms")) { case (c, (p1, p2)) =>
      applyMerge(c, p1, p2)
    }
    wordVocab(docs, textCol)
      .select(explode(merged).as("tok"), col("cnt"))
      .groupBy("tok").agg(sum("cnt").cast("long").as("cnt"))
  }

  /** Vocabulary coverage report: per `groupCol`, the fraction of token
    * OCCURRENCES not covered by `vocab` — the go/no-go check before
    * committing a corpus to a tokenizer/vocab (high OOV in one source =
    * that source will fragment into bytes/unks and dominate the token
    * budget). Exact integer output (`oov_ppm` via truncating div), so the
    * report replays in any engine.
    *
    * Scale shape: token explode over the corpus scan; the vocab side is
    * vocab-sized and broadcasts into a left join probed on the stream; one
    * group-keyed partial aggregate. The corpus never shuffles on tokens.
    */
  def coverageReport(docs: DataFrame, textCol: String, groupCol: String,
      vocab: DataFrame, vocabTokCol: String): DataFrame = {
    val toks = docs.select(col(groupCol),
      explode(filter(split(lower(col(textCol)), "\\s+"),
        t => t =!= lit(""))).as("__tok"))
    val v = vocab.select(col(vocabTokCol).as("__tok")).distinct()
      .withColumn("__inv", lit(1))
    toks.join(broadcast(v), Seq("__tok"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("total_tokens"),
        sum(when(col("__inv").isNull, 1L).otherwise(0L)).cast("long").as("oov_tokens"))
      .withColumn("oov_ppm", expr("(oov_tokens * 1000000L) div total_tokens"))
  }
}
