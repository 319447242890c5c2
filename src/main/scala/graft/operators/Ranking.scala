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

  /** Interpolated BIGRAM language-model scoring — the KenLM-style
    * perplexity filter one order up from [[unigramLogProb]]: token
    * transitions, not just token frequencies, so word-salad documents
    * (every token common, no token ORDER plausible) finally score badly.
    *
    * Per-token probability, Jelinek-Mercer interpolation with fixed
    * weight `lambda`:
    *
    *   p(cur | prev) = lambda * c(prev,cur)/c(prev,*) + (1-lambda) * c(cur)/total
    *
    * where `c(prev,*)` counts PREV AS A BIGRAM START (not raw unigram
    * occurrences — a document-final token starts no bigram), so the
    * conditional is a true distribution. A document's first token has no
    * context and scores with the unigram model alone; tokens absent from
    * the LM fall to the add-one floor 1/(total+1) on the unigram side and
    * 0 on the bigram side (the interpolation keeps p > 0).
    *
    * Same exact-replay contract as the unigram scorer: per-token
    * ln(p) is micro-rounded FIRST, documents sum integers, so shuffle
    * order never changes a score and any engine replays it.
    *
    * Returns (idCol, `tokens`, `lp_e6`, `bits_per_token`).
    *
    * `lm`: optional (prev, cur, cnt) bigram reference distribution;
    * defaults to self-training on `docs`. When supplied, the unigram
    * marginal is the LM's own cur-counts — batch-invariant: a document's
    * score never depends on what else is scored alongside it.
    *
    * Scale shape: bigrams are built per row with `zip_with` over the
    * token array (no window, no self-join), counted with one
    * token-pair-keyed aggregate; scoring joins are co-partitioned on the
    * same keys (corpus-scale vocabularies — NOT broadcast), then one
    * document-keyed rollup. All keyed shuffles with map-side partials,
    * nothing quadratic, no driver state. Per-token log-probs are
    * computed once per DISTINCT bigram/token (vocab-sized relations) and
    * the corpus-sized pair stream joins a single lookup; the cheap
    * tokenize lineage is recomputed per consumer rather than cached
    * (measured faster — see the in-body note).
    */
  def bigramLogProb(docs: DataFrame, textCol: String, idCol: String,
      lambda: Double = 0.9, lm: Option[DataFrame] = None): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, "lambda must be in (0, 1)")
    val arr = docs.select(col(idCol),
      filter(split(lower(col(textCol)), "\\s+"), t => t =!= lit("")).as("__toks"))
    // (prev, cur) per position 2..n, built row-locally
    val n1 = greatest(size(col("__toks")) - 1, lit(0))
    // NOT persisted, deliberately: the pair lineage is scan + lower +
    // split + zip_with — recomputing it for its two consumers is cheaper
    // than writing/reading a columnar cache of the string pairs
    // (measured at sf0.1: 2.9 s uncached vs 8.9 s cached warm). The
    // corpus is tokenized ~3x (bigram counts, pair scoring, firsts),
    // each a cheap narrow pass.
    val pairs = arr.select(col(idCol), explode(zip_with(
        slice(col("__toks"), lit(1), n1),
        slice(col("__toks"), lit(2), n1),
        (p, c) => struct(p.as("prev"), c.as("cur")))).as("__bg"))
      .select(col(idCol), col("__bg.prev").as("__prev"), col("__bg.cur").as("__cur"))
    val bigrams = lm.getOrElse(
        pairs.groupBy(col("__prev").as("prev"), col("__cur").as("cur"))
          .agg(count(lit(1)).cast("long").as("cnt")))
      .select(col("prev"), col("cur"), col("cnt").cast("long").as("cnt"))
    val starts = bigrams.groupBy(col("prev").as("s_prev"))
      .agg(sum("cnt").cast("long").as("s_cnt"))
    // unigram side. Self-trained: marginal over bigram CUR plus each
    // document's first token, so the unigram total counts every corpus
    // token exactly once. External LM: the marginal comes from the LM
    // ALONE (its cur counts) — mixing in the scored batch's first tokens
    // would make a document's score depend on which other documents are
    // scored alongside it, and a reference distribution must be
    // batch-invariant.
    val firsts = arr.where(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks").getItem(0).as("__t"))
    val curMarginal = bigrams.groupBy(col("cur").as("u_tok"))
      .agg(sum("cnt").cast("long").as("u_cnt"))
    val unigrams =
      if (lm.isDefined) curMarginal
      else curMarginal
        .join(firsts.groupBy(col("__t").as("u_tok"))
            .agg(count(lit(1)).cast("long").as("f_cnt")),
          Seq("u_tok"), "full_outer")
        .select(col("u_tok"),
          (coalesce(col("u_cnt"), lit(0L)) + coalesce(col("f_cnt"), lit(0L))).as("u_cnt"))
    val total = unigrams.agg(sum("u_cnt").cast("long").as("total"))
    val lam = lit(lambda)
    val unl = lit(1.0) - lit(lambda)
    // context tokens: p = lam * cb/cp + (1-lam) * cu/total.
    // The log-prob is computed per DISTINCT bigram / token (vocab-sized
    // relations) and the corpus-sized pair stream joins ONE lookup —
    // scoring every occurrence through three corpus-sized joins measured
    // ~2x slower at sf0.1. The arithmetic is expression-identical, so
    // the oracle replay is unchanged.
    val seenPairLp = bigrams
      .join(starts, bigrams("prev") === starts("s_prev"))
      .join(unigrams, bigrams("cur") === unigrams("u_tok"))
      .crossJoin(broadcast(total))
      .select(col("prev"), col("cur"),
        round(log(
          lam * (col("cnt").cast("double") / col("s_cnt").cast("double")) +
          unl * (col("u_cnt").cast("double") / col("total").cast("double"))
        ) * lit(1e6)).cast("long").as("__plp"))
    val uniLp = unigrams.crossJoin(broadcast(total))
      .select(col("u_tok"),
        round(log(col("u_cnt").cast("double") / col("total").cast("double"))
          * lit(1e6)).cast("long").as("__ulp"))
    val pairScores =
      if (lm.isEmpty) {
        // self-trained: every pair is in the LM by construction
        pairs.join(seenPairLp,
            pairs("__prev") === seenPairLp("prev") && pairs("__cur") === seenPairLp("cur"))
          .select(col(idCol), col("__plp").as("__lp"))
      } else {
        // external LM: unseen bigrams fall back to the unigram leak
        // (lam * 0/1 + unl * cu/total) with the add-one OOV floor —
        // the zero terms written out so the IEEE value is identical to
        // the fused formula's
        pairs.join(seenPairLp,
            pairs("__prev") === seenPairLp("prev") && pairs("__cur") === seenPairLp("cur"), "left")
          .join(unigrams, pairs("__cur") === unigrams("u_tok"), "left")
          .crossJoin(broadcast(total))
          .select(col(idCol),
            coalesce(col("__plp"),
              round(log(
                lam * (lit(0.0) / lit(1.0)) +
                unl * (coalesce(col("u_cnt"), lit(1L)).cast("double") /
                  when(col("u_cnt").isNull, (col("total") + lit(1L)).cast("double"))
                    .otherwise(col("total").cast("double")))
              ) * lit(1e6)).cast("long")).as("__lp"))
      }
    // first tokens: unigram-only (with the same add-one floor)
    val firstScores =
      if (lm.isEmpty) {
        firsts.join(uniLp, firsts("__t") === uniLp("u_tok"))
          .select(col(idCol), col("__ulp").as("__lp"))
      } else {
        firsts.join(uniLp, firsts("__t") === uniLp("u_tok"), "left")
          .crossJoin(broadcast(total))
          .select(col(idCol),
            coalesce(col("__ulp"),
              round(log(lit(1.0) / (col("total") + lit(1L)).cast("double"))
                * lit(1e6)).cast("long")).as("__lp"))
      }
    val scored = pairScores.union(firstScores)
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

  /** Hybrid retrieval: a BM25 recall stage over the full corpus, then an
    * exact cosine rerank of the bounded candidate set against `queryVec`,
    * fused by reciprocal-rank fusion — `1/(rrfK + bm25_rank) + 1/(rrfK +
    * cosine_rank)`, the standard score-scale-free fusion whose inputs are
    * small integers, so the fused ordering replays exactly cross-engine.
    *
    * Scale shape: the corpus-wide work is exactly [[bm25]] (two narrow
    * passes, no document-keyed shuffle) plus a TakeOrderedAndProject
    * top-`candidates` selection (parallel per-partition top-k, no global
    * sort); everything after operates on `candidates` rows (bounded small
    * by contract — the global-window rank steps are single-task ON
    * PURPOSE; only the candidate set flows through them). Candidates
    * without an embedding drop at the rerank join.
    *
    * Ordering determinism: candidate selection on the micro-rounded BM25
    * score (then id), cosine rank on the raw double (then id) — same
    * contract as the ANN gates — and the final order on the exact RRF
    * rational (then id).
    */
  def hybridSearch(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String],
      embeddings: DataFrame, vecCol: String, vecIdCol: String,
      queryVec: Seq[Double], candidates: Int = 100, k: Int = 10,
      rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(candidates >= k && k >= 1, "need candidates >= k >= 1")
    require(queryVec.nonEmpty, "queryVec must not be empty")
    val reserved = Seq("__bm25_e6", "__rank_b", "__v", "__cos", "__rank_c", "__rrf")
    for ((side, df) <- Seq("docs" -> docs, "embeddings" -> embeddings)) {
      val clash = df.columns.toSet.intersect(reserved.toSet)
      require(clash.isEmpty,
        s"hybridSearch $side input contains reserved helper column(s) ${clash.mkString(", ")}")
    }
    val scored = bm25(docs, textCol, idCol, queryTerms)
      .select(col(idCol), round(col("bm25") * lit(1e6)).cast("long").as("__bm25_e6"))
    // Candidate selection is orderBy().limit() so Catalyst plans
    // TakeOrderedAndProject — a parallel per-partition top-k merged on the
    // driver — instead of funneling every BM25-scored document through a
    // single-task global window. The sort key (micro-rounded score desc,
    // then id) is a total order, so the selected set — and the ranks
    // derived from it below — are identical to a corpus-wide row_number.
    val wb = Window.orderBy(col("__bm25_e6").desc, col(idCol))
    val cand = scored.orderBy(col("__bm25_e6").desc, col(idCol)).limit(candidates)
      .withColumn("__rank_b", row_number().over(wb))
    val q = lit(queryVec.toArray)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
    def norm(a: org.apache.spark.sql.Column) =
      ColumnBridge.column(VecNorm(ColumnBridge.expression(a)))
    val withCos = cand
      .join(embeddings.select(col(vecIdCol).as(idCol), col(vecCol).as("__v")), Seq(idCol))
      .withColumn("__cos", dot(col("__v"), q) / (norm(col("__v")) * norm(q)))
    val wc = Window.orderBy(col("__cos").desc, col(idCol))
    val wr = Window.orderBy(col("__rrf").desc, col(idCol))
    withCos.withColumn("__rank_c", row_number().over(wc))
      .withColumn("__rrf",
        lit(1.0) / (lit(rrfK.toDouble) + col("__rank_b")) +
          lit(1.0) / (lit(rrfK.toDouble) + col("__rank_c")))
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"),
        col("__rank_b").as("rank_bm25"), col("__rank_c").as("rank_cosine"),
        col("__rrf").as("rrf"))
  }

  /** Per-document TF-IDF keyword extraction: the `topN` highest-scoring
    * terms per document, the standard "what is this page about" signal a
    * curation pipeline uses for topic bucketing and index previews.
    *
    * score = tf · ln((N + 1)/(df + 1)), micro-rounded to `score_e6`
    * (BIGINT) so ordering and the oracle replay are exact; ties break on
    * the token string ascending.
    *
    * Scale shape: explode → ONE (doc, token) hash aggregate for tf (the
    * only corpus-sized shuffle, map-side combined); per-token df is a
    * second aggregate on the tf relation (already token-keyed, so AQE
    * coalesces a cheap exchange); N is a single-row broadcast. The
    * per-document top-N window partitions by doc_id — partitions are
    * document-sized (distinct tokens in ONE doc), never corpus-sized, so
    * no task depends on |corpus|. Vocabulary-scale relations (tf, df) are
    * joined token-keyed and co-partitioned — never broadcast, never
    * collected.
    */
  def tfidfTopTerms(docs: DataFrame, textCol: String, idCol: String,
      topN: Int, minTokenLen: Int = 1): DataFrame = {
    require(topN >= 1 && topN <= 1000, "topN must be in [1, 1000]")
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(lower(col(textCol)), "\\s+"),
      t => length(t) >= minTokenLen)
    val tf = docs.select(col(idCol), explode(toks).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).cast("long").as("df"))
    val nDocs = docs.agg(count(lit(1)).cast("long").as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_e6").desc, col("token"))
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score_e6",
        round(col("tf").cast("double") *
          log((col("n_docs").cast("double") + lit(1.0)) /
              (col("df").cast("double") + lit(1.0))) * lit(1e6)).cast("long"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topN)
      .select(col(idCol), col("rnk"), col("token"), col("tf"), col("df"),
        col("score_e6"))
  }
}
