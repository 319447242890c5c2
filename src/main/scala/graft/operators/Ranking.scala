package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical relevance ranking for corpus search: Okapi BM25 over a
  * whitespace-tokenized text column, the standard retrieval scorer a
  * curation pipeline uses to pull topic slices out of a crawl.
  *
  * Uses the Lucene non-negative idf variant
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` with the classic per-term weight
  * `idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`.
  *
  * Scale shape: per-document term frequencies are computed inside the row
  * (`size(filter(tokens, _ = term))` — codegen'd, no explode/shuffle); the
  * corpus statistics (N, Σdl, per-term df) are ONE tiny global aggregate
  * broadcast back onto the scan. Total cost: two narrow passes over the
  * corpus and a single-row broadcast join — no shuffle keyed on documents
  * or terms, so the plan is identical at sf0.01 and at 100 TB.
  */
object Ranking {

  /** Per-document BM25 scores for `queryTerms` (matched against
    * lowercased whitespace tokens). Appends `dl` (token count) and
    * `bm25` to the input's selected (`idCol`) rows. The per-term sum is
    * folded in the given term order, so the double result is
    * deterministic and oracle-replayable.
    */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    require(queryTerms.distinct == queryTerms, "duplicate query terms")
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= lit(""))
    val withTf = docs.select(
      col(idCol) +: size(toks).cast("long").as("dl") +:
        queryTerms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("long").as(s"__tf_$i")
        }: _*)
    val statAggs = count(lit(1)).cast("long").as("n_docs") +:
      sum(col("dl")).cast("long").as("dl_sum") +:
      queryTerms.indices.map(i =>
        sum(when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).cast("long").as(s"__df_$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val joined = withTf.crossJoin(broadcast(stats))
    val n = col("n_docs").cast("double")
    val avgdl = col("dl_sum").cast("double") / n
    val score = queryTerms.indices.map { i =>
      val tf = col(s"__tf_$i").cast("double")
      val df = col(s"__df_$i").cast("double")
      val idf = log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }.reduceLeft(_ + _)
    joined.select(col(idCol), col("dl"), score.as("bm25"))
  }

  /** Unigram language-model surprisal per document — the cheap form of
    * the CCNet/perplexity quality filter: documents whose tokens are
    * collectively improbable under a reference unigram distribution are
    * boilerplate/gibberish candidates.
    *
    * Returns (idCol, `tokens`, `lp_e6` = Σ_occurrences round(ln(p(t))·1e6),
    * `bits_per_token` = -lp_e6 / (tokens·1e6·ln 2)). The per-TOKEN log
    * probability is rounded to micro-units FIRST and the per-document
    * score is an integer sum — order-independent, so the whole scorer
    * replays exactly in any engine regardless of shuffle order (a raw
    * double sum would not). Documents with zero tokens score (0, 0, 0.0).
    *
    * `lm`: optional (token, cnt) reference distribution (train on a clean
    * corpus, score a crawl); defaults to self-training on `docs`. Tokens
    * absent from the LM get the add-one floor ln(1/(total+1)).
    *
    * Scale shape: one token-keyed aggregate for the LM (map-side partial),
    * the scoring join co-partitioned on the same key (vocabularies are
    * corpus-scale — NOT broadcast), one document-keyed rollup. Three keyed
    * shuffles total, nothing quadratic, no driver state.
    */
  def unigramLogProb(docs: DataFrame, textCol: String, idCol: String,
      lm: Option[DataFrame] = None): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(filter(split(lower(col(textCol)), "\\s+"), t => t =!= lit(""))).as("__t"))
    val freq = lm.getOrElse(
      toks.groupBy(col("__t").as("token")).agg(count(lit(1)).cast("long").as("cnt")))
      .select(col("token"), col("cnt").cast("long").as("cnt"))
    val total = freq.agg(sum("cnt").cast("long").as("total"))
    val lp = freq.crossJoin(broadcast(total))
      .select(col("token"),
        round(log(col("cnt").cast("double") / col("total").cast("double")) * lit(1e6))
          .cast("long").as("__lp_e6"))
    val floor = total.select(
      round(log(lit(1.0) / (col("total") + lit(1L)).cast("double")) * lit(1e6))
        .cast("long").as("__floor_e6"))
    val scored = toks.join(lp, col("__t") === col("token"), "left")
      .crossJoin(broadcast(floor))
      .select(col(idCol), coalesce(col("__lp_e6"), col("__floor_e6")).as("__lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("tokens"), sum("__lp").cast("long").as("lp_e6"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("tokens"), lit(0L)).as("tokens"),
        coalesce(col("lp_e6"), lit(0L)).as("lp_e6"))
      .withColumn("bits_per_token",
        when(col("tokens") > 0,
          -col("lp_e6").cast("double") /
            (col("tokens").cast("double") * lit(1e6) * lit(math.log(2.0))))
          .otherwise(lit(0.0)))
  }
}
