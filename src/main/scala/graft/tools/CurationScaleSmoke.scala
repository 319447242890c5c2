package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Classify, Dedup, Packing, Ranking, Sampling, Vocab}

/** Robustness/throughput smoke (not a gate): the round-5 curation
  * operators over a synthetic corpus 1-2 orders of magnitude larger than
  * the test tables — 1M docs x ~50 tokens (20 sources, multi-line bodies,
  * every 40th doc a cross-slice near-duplicate). Checks that the new
  * operators' plans hold their shape and throughput at corpus sizes where
  * a quadratic stage or a driver bottleneck would be unmissable.
  * Run: sbt "runMain graft.tools.CurationScaleSmoke [nDocs]"
  */
object CurationScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // multi-line text from a 2000-word vocab; every 40th doc repeats the
    // content of doc id-39 (a cross-slice near-duplicate when split by
    // id % 10); line 0 is shared boilerplate in half the docs
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        expr("CASE WHEN id % 40 = 0 AND id > 0 THEN id - 39 ELSE id END").as("__seed"),
        expr("concat('src', CAST(id % 20 AS STRING))").as("source"))
      .select(col("doc_id"), col("source"),
        concat_ws("\n",
          expr("CASE WHEN __seed % 2 = 0 THEN 'subscribe to our newsletter today' " +
            "ELSE conv(abs(xxhash64(__seed)) % 2000, 10, 36) END"),
          expr("""concat_ws(' ', transform(sequence(1, 45 + CAST(__seed % 10 AS INT)),
               i -> conv(abs(xxhash64(__seed * 100 + i)) % 2000, 10, 36)))"""))
          .as("text"))
      .persist()
    println(s"[smoke] corpus: ${docs.count()} docs")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[smoke] $name%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
    }

    t("line dedup (boilerplate removal)") {
      Dedup.dropDuplicateLines(docs, "text", "doc_id", minCount = 1000)
        .agg(sum("removed")).head().getLong(0)
    }
    t("sequence packing (512-token budget)") {
      Packing.packSequences(docs, "source", expr("token_count(text)"),
        "text", "doc_id", budget = 512L)
        .agg(countDistinct("source", "seq_id")).head().getLong(0)
    }
    t("domain-mix rebalance (4 targets)") {
      Sampling.rebalanceMix(docs, "source", "text", "doc_id",
        Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)).count()
    }
    t("bigram LM scoring (self-trained)") {
      Ranking.bigramLogProb(docs, "text", "doc_id")
        .agg(sum("tokens")).head().getLong(0)
    }
    t("incremental near-dup (10% new slice)") {
      Dedup.incrementalNearDuplicates(
        docs.where(col("doc_id") % 10 === 0), docs.where(col("doc_id") % 10 =!= 0),
        "text", "doc_id", threshold = 0.8, maxBucketSize = 10000).count()
    }
    t("bpe merges (4 rounds on the vocab)") {
      Vocab.bpeMerges(docs, "text", numMerges = 4).count()
    }
    t("keep-best resolution (token 6-8 prefix graph)") {
      // key on tokens PAST the planted boilerplate line: a prefix key
      // containing the shared first line would put half the corpus in one
      // cluster and the pair self-join would go quadratic on it (measured:
      // the naive 2-token key here means a 500k-member bucket = 1.25e11
      // pairs). Near-dup detectors guard this with maxBucketSize; ad-hoc
      // pair generators must pick keys with bounded group sizes.
      val keyed = docs.select(col("doc_id"),
        md5(concat_ws(" ",
          slice(filter(split(lower(col("text")), "\\s+"), x => x =!= ""), 6, 3))).as("pk"))
      val pairs = keyed.as("a").join(keyed.as("b"),
          col("a.pk") === col("b.pk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      Dedup.resolveNearDuplicates(
          docs.select(col("doc_id"), length(col("text")).as("len")),
          "doc_id", "len", pairs, shortcut = true)
        .where(col("keep")).count()
    }
    t("semdedup 200k vecs, k=512 (broadcast assignment path)") {
      val nv = math.min(n, 200000L)
      val vecs = spark.range(nv).select(col("id").as("vec_id"),
        expr("""transform(sequence(1, 16),
             i -> CAST(CAST(xxhash64(id * 31 + i) % 1000 AS DOUBLE) / 1000.0 AS DOUBLE))""").as("vec"))
      graft.operators.Embeddings.semanticDeduplicate(
          vecs, "vec", "vec_id", k = 512, threshold = 0.995)
        .where(!col("keep")).count()
    }
    t("logistic classifier (5 GD rounds, correct)") {
      val m = expr("text_metrics(text)")
      val feats = Seq(m.getField("toks").cast("double") / lit(100.0),
        m.getField("chars").cast("double") / m.getField("words").cast("double") / lit(10.0))
      val y = when(length(col("text")) >= 185, 1.0).otherwise(0.0)
      val w = Classify.logisticTrain(docs, feats, y, iterations = 5)
      val pred = when(Classify.logisticScore(w, feats) >= 0.5, 1.0).otherwise(0.0)
      docs.agg(sum(when(pred === y, 1L).otherwise(0L))).head().getLong(0)
    }
    spark.stop()
  }
}
