package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine quality classification: logistic regression trained by
  * full-batch gradient descent — the fasttext-style "quality classifier"
  * a curation pipeline trains on labeled good/bad documents and applies
  * corpus-wide, without leaving the engine.
  *
  * Exact-replay contract (same scheme as kmeans / the LM scorers): each
  * row's gradient contribution is micro-rounded FIRST
  * (`round((sigmoid(z) - y) * f_j * 1e6)` as BIGINT) and the batch
  * gradient is an integer sum — shuffle-order-independent — while the
  * (tiny) weight-update arithmetic runs on the driver with a fixed
  * operation order another engine can replay literally. The q_logistic
  * DuckDB oracle re-trains the full run and matches the final weights to
  * the micro-unit.
  *
  * Scale shape: one aggregation pass per iteration (map-side partial
  * sums, one 1-row result to the driver — weights live on the driver
  * like kmeans centroids, never in a shuffle); scoring is a pure per-row
  * projection. Iterations are sequential by nature; the per-iteration
  * cost is one narrow scan however large the corpus.
  */
object Classify {

  /** z = w0 + w1*f1 + ... — built left-assoc so the double arithmetic
    * replays identically in SQL engines.
    */
  private def zCol(weights: Array[Double], feats: Seq[Column]): Column =
    feats.zip(weights.drop(1)).foldLeft(lit(weights(0)): Column) {
      case (acc, (f, w)) => acc + lit(w) * f
    }

  /** The logistic score column for fixed weights (bias first). */
  def logisticScore(weights: Array[Double], feats: Seq[Column]): Column =
    lit(1.0) / (lit(1.0) + exp(-zCol(weights, feats)))

  /** Train `iterations` rounds of full-batch gradient descent from zero
    * weights. `feats` are feature columns (engine-replayable arithmetic
    * recommended — ratios of counts); `label` must evaluate to 0.0/1.0.
    * Returns the learned weights, bias first.
    */
  def logisticTrain(df: DataFrame, feats: Seq[Column], label: Column,
      iterations: Int = 3, lr: Double = 5.0): Array[Double] = {
    require(feats.nonEmpty, "need at least one feature")
    require(iterations >= 1, "iterations must be >= 1")
    val weights = Array.fill(feats.size + 1)(0.0)
    // project features/label once and PERSIST the narrow double frame:
    // without the cache every GD round (plus the count) re-runs feature
    // extraction over the raw corpus — here the cached rows are a few
    // doubles each, so unlike heavyweight string caches (see
    // bigramLogProb) the cache always wins
    val cols = label.cast("double").as("__y") +:
      feats.zipWithIndex.map { case (f, i) => f.cast("double").as(s"__f$i") }
    val base = df.select(cols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = base.count()
      require(n > 0, "empty training frame")
      for (_ <- 1 to iterations) {
        val sig = lit(1.0) / (lit(1.0) +
          exp(-zCol(weights, feats.indices.map(i => col(s"__f$i")))))
        val gradCols = sum(round((sig - col("__y")) * lit(1e6)).cast("long")).as("g0") +:
          feats.indices.map(i =>
            sum(round((sig - col("__y")) * col(s"__f$i") * lit(1e6)).cast("long")).as(s"g${i + 1}"))
        val g = base.agg(gradCols.head, gradCols.tail: _*).collect()(0)
        for (j <- weights.indices)
          weights(j) = weights(j) - lr * (g.getLong(j).toDouble / (n.toDouble * 1e6))
      }
      weights
    } finally base.unpersist() // a failed round must not pin the cache
  }

  /** Calibration (reliability) report of a probabilistic scorer: scores
    * bucket into `bins` equal-width bins over [0, 1] and each bin reports
    * its count, e6-integer mean score, positive count and observed
    * positive rate — the reliability diagram, plus each bin's ECE
    * contribution `n·|rate − mean_score|` (sum the column and divide by
    * total n for expected calibration error). The eval that says whether
    * a quality classifier's 0.9 MEANS 90% — `evalReport` picks the
    * operating point, this says whether the scores are honest
    * probabilities between the points.
    *
    * Integer contract: `mean_score_e6` is the integer mean of per-row
    * e6-rounded scores (`sum(round(s·1e6)) div n` — order-independent),
    * `rate_ppm = positives·10^6 div n`, and `ece_contrib_e6 =
    * |rate_ppm − mean_score_e6|·n` — every output exact in any engine.
    * Scores CLAMP into [0, 1] before everything (a stray −0.01 or 1.3 —
    * an uncalibrated margin passed by mistake — lands in the edge bin
    * with a clamped mean contribution rather than minting a phantom
    * bin −1 or pushing the integer sums onto the negative domain where
    * truncating and flooring division disagree across engines); score
    * 1.0 joins the top bin. Rows with NULL score or label are EXCLUDED
    * and counted in the companion `evalReport`'s null audit. ONE
    * aggregation pass (bin-keyed, ≤ `bins` groups).
    *
    * @return (bin, n, mean_score_e6, positives, rate_ppm, ece_contrib_e6)
    */
  def calibrationReport(df: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val y = label.cast("double")
    val sc = least(lit(1.0), greatest(lit(0.0), score.cast("double")))
    df.where(score.isNotNull && y.isNotNull)
      .select(least(lit(bins - 1), floor(sc * lit(bins))).cast("int").as("bin"),
        round(sc * lit(1e6)).cast("long").as("__s_e6"),
        when(y === 1.0, 1L).otherwise(0L).as("__pos"))
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n"),
        expr("sum(__s_e6) div count(1)").as("mean_score_e6"),
        sum(col("__pos")).cast("long").as("positives"))
      .withColumn("rate_ppm", expr("positives * 1000000L div n"))
      .withColumn("ece_contrib_e6",
        abs(col("rate_ppm") - col("mean_score_e6")) * col("n"))
  }

  /** Threshold sweep of a binary scorer: per threshold, the confusion
    * counts and integer precision/recall/F1 (ppm; 0 when the denominator
    * is 0) — the operating-point picker for a quality classifier before
    * it gates a corpus. ONE aggregation pass regardless of threshold
    * count (each threshold adds four conditional sums to the same agg,
    * not a scan); the explode below unpacks a single driver-sized row.
    * Predicted positive is `score >= t`; `label` must evaluate to
    * 0.0/1.0. All-integer outputs replay exactly in SQL. Rows with a
    * NULL score or label belong to NO confusion bucket (a NULL
    * comparison routes every `when` to its 0 branch) — they are counted
    * in `null_rows` so the totals stay auditable:
    * `tp + fp + fn + tn + null_rows = rows` at every threshold.
    */
  def evalReport(df: DataFrame, score: Column, label: Column,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val y = label.cast("double")
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      val pos = score >= lit(t)
      Seq(
        sum(when(pos && y === 1.0, 1L).otherwise(0L)).cast("long").as(s"__tp$i"),
        sum(when(pos && y === 0.0, 1L).otherwise(0L)).cast("long").as(s"__fp$i"),
        sum(when(!pos && y === 1.0, 1L).otherwise(0L)).cast("long").as(s"__fn$i"),
        sum(when(!pos && y === 0.0, 1L).otherwise(0L)).cast("long").as(s"__tn$i"))
    } :+ sum(when(score.isNull || y.isNull, 1L).otherwise(0L))
      .cast("long").as("__nulls")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(math.round(t * 1e6)).as("threshold_e6"),
        col(s"__tp$i").as("tp"), col(s"__fp$i").as("fp"),
        col(s"__fn$i").as("fn"), col(s"__tn$i").as("tn"))
    }
    row.select(explode(array(rows: _*)).as("r"), col("__nulls"))
      .select(col("r.threshold_e6"), col("r.tp"), col("r.fp"), col("r.fn"),
        col("r.tn"), col("__nulls").as("null_rows"))
      .withColumn("precision_ppm", when(col("tp") + col("fp") === 0, 0L)
        .otherwise(expr("tp * 1000000L div (tp + fp)")))
      .withColumn("recall_ppm", when(col("tp") + col("fn") === 0, 0L)
        .otherwise(expr("tp * 1000000L div (tp + fn)")))
      .withColumn("f1_ppm", when(lit(2) * col("tp") + col("fp") + col("fn") === 0, 0L)
        .otherwise(expr("2L * tp * 1000000L div (2L * tp + fp + fn)")))
  }
}
