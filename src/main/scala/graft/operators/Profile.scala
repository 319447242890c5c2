package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column data-quality profile — the curation dashboard a pipeline runs
  * over every new corpus drop: row/null/distinct counts plus exact
  * micro-unit numeric ranges, one row per column.
  *
  * One aggregation pass computes every metric; the per-column results ride
  * a single aggregate row as structs and explode into rows afterwards
  * (no per-column jobs, no repeated scans).
  *
  * Distinct counts: `exact = true` uses COUNT(DISTINCT col) — each
  * distinct aggregate adds an Expand duplication of the scan, so the cost
  * grows with the column count; right for gates/small tables. The default
  * approximate mode feeds the column's 64-bit hash into the [[HllSketchAgg]]
  * aggregate (single pass, no Expand, mergeable partials) — the 100 TB
  * path, with relative error ~1.04/sqrt(2^p).
  *
  * Numeric ranges are exact micro-unit integers (`round(x * 1e6)` as
  * BIGINT): min/max involve no summation-order issues and integer
  * rendering is engine-portable, so the profile replays exactly in any
  * SQL engine.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String] = Nil,
      exact: Boolean = false, hllP: Int = 14): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))

    def distinctAgg(c: String): Column =
      if (exact) countDistinct(col(c)).cast("long")
      // NULL-gate the hash: xxhash64(NULL) returns the seed, which would
      // count null rows as one phantom distinct; the sketch aggregate
      // skips NULL inputs, matching COUNT(DISTINCT) semantics
      // all-null column: the empty sketch finalizes to NULL; exact mode
      // says 0, so coalesce for mode-consistent output
      else coalesce(
        ColumnBridge.column(graft.functions.HllEstimate(ColumnBridge.expression(
          ColumnBridge.column(graft.functions.HllSketchAgg(
            ColumnBridge.expression(lit(hllP)),
            ColumnBridge.expression(when(col(c).isNotNull, xxhash64(col(c)))))
            .toAggregateExpression())))).cast("long"),
        lit(0L))

    def numericRange(c: String): (Column, Column) = df.schema(c).dataType match {
      case _: NumericType =>
        (round(min(col(c)).cast("double") * 1e6).cast("long"),
          round(max(col(c)).cast("double") * 1e6).cast("long"))
      case _ => (lit(null).cast("long"), lit(null).cast("long"))
    }

    val perCol = cols.map { c =>
      val (mn, mx) = numericRange(c)
      struct(
        lit(c).as("column"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as("n_nulls"),
        distinctAgg(c).as("n_distinct"),
        mn.as("min_e6"), mx.as("max_e6"))
    }
    df.agg(count(lit(1)).cast("long").as("n_rows"),
        array(perCol: _*).as("cols"))
      .select(col("n_rows"), explode(col("cols")).as("c"))
      .select(col("c.column").as("column"), col("n_rows"),
        col("c.n_nulls").as("n_nulls"), col("c.n_distinct").as("n_distinct"),
        col("c.min_e6").as("min_e6"), col("c.max_e6").as("max_e6"))
  }

  /** Distribution drift between two corpus snapshots for one numeric
    * column: both sides histogrammed over the SAME fixed range (one
    * [[graft.functions.HistSketchAgg]] pass each — mergeable, a few KB of
    * state), then compared per bin. Returns one row per occupied bin
    * (`slot` 0 = below range, 1..nbins = bins, nbins+1 = above) with raw
    * counts and micro-unit occupancy fractions, plus `l1_e6` — the L1
    * distance of the micro-rounded fractions (= 2 × total variation
    * distance, in micro-units) repeated on every row: the single drift
    * number a refresh gate alarms on.
    *
    * `l1_e6` sums INTEGER per-bin values, so it is summation-order-
    * independent — a raw double TVD would vary in the last ulp with
    * partial-aggregation order and could flip a rounded result. Every
    * output is an integer or a micro-rounded fraction of integer counts,
    * so the whole report replays exactly in another engine.
    */
  /** HARD data-quality expectations: every check rides the existing scan
    * as a plan-side assertion — a violating row fails the JOB, naming the
    * check and the offending row's key. Zero extra passes and zero
    * shuffles: the guard is a filter whose predicate raises instead of
    * dropping (assert_true returns NULL on pass, so `isNull` keeps every
    * surviving row). Use where corrupt input must stop a pipeline (the
    * Great-Expectations-style contract gate); use [[expectReport]] where
    * it should be counted instead.
    */
  def expect(df: DataFrame, keyCol: String, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    checks.foldLeft(df) { case (d, (name, pred)) =>
      // coalesce the key: a NULL key would null the whole concat and the
      // job would fail with an empty message that no longer names the check
      d.where(assert_true(pred,
        concat(lit(s"expectation '$name' violated by $keyCol="),
          coalesce(col(keyCol).cast("string"), lit("NULL")))).isNull)
    }
  }

  /** SOFT data-quality expectations: one aggregation pass returning a row
    * per check with its violation count and total — the monitoring form
    * of [[expect]], for dashboards and drop-decision thresholds.
    */
  def expectReport(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = count(lit(1)).cast("long").as("__total") +:
      checks.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).cast("long").as(s"__v$i")
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val out = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check"), col(s"__v$i").as("violations"), col("__total").as("total"))
    }
    row.select(explode(array(out: _*)).as("r"))
      .select(col("r.check"), col("r.violations"), col("r.total"))
  }

  def histDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: String,
      nbins: Int, lo: Double, hi: Double): DataFrame = {
    def counts(df: DataFrame, name: String) =
      df.agg(ColumnBridge.column(graft.functions.HistCounts(ColumnBridge.expression(
        ColumnBridge.column(graft.functions.HistSketchAgg(
          ColumnBridge.expression(lit(nbins)), ColumnBridge.expression(lit(lo)),
          ColumnBridge.expression(lit(hi)),
          ColumnBridge.expression(col(valueCol).cast("double"))).toAggregateExpression()))))
        .as(name))
    val joined = counts(oldDf, "co").crossJoin(counts(newDf, "cn"))
      .select(posexplode(arrays_zip(col("co"), col("cn"))).as(Seq("slot", "z")))
      .select(col("slot"), col("z.co").as("old_cnt"), col("z.cn").as("new_cnt"))
    // fractions and TVD need the totals on every row: a single-row
    // aggregate broadcast back (bin counts are tiny — nbins+2 rows)
    val t = joined.agg(sum("old_cnt").cast("double").as("ot"),
      sum("new_cnt").cast("double").as("nt"))
    val withFrac = joined.crossJoin(broadcast(t))
      .withColumn("old_frac_e6",
        round(col("old_cnt") / col("ot") * lit(1e6)).cast("long"))
      .withColumn("new_frac_e6",
        round(col("new_cnt") / col("nt") * lit(1e6)).cast("long"))
      // PSI contribution (p−q)·ln(p/q), e6-rounded PER BIN so the total
      // is an exact integer sum (a double total would be fold-order
      // sensitive); bins empty on either side are skipped — the standard
      // PSI convention (alternatives smooth with a pseudocount; callers
      // wanting that can pre-pad). PSI > 0.2 is the classic retrain/
      // investigate threshold, i.e. psi_e6 > 200000.
      .withColumn("__psi_e6",
        when(col("old_frac_e6") > 0 && col("new_frac_e6") > 0,
          round((col("old_frac_e6") - col("new_frac_e6")).cast("double") / lit(1e6) *
            log(col("old_frac_e6").cast("double") / col("new_frac_e6").cast("double")) *
            lit(1e6)).cast("long"))
        .otherwise(lit(0L)))
    val tots = withFrac.agg(
      sum(abs(col("old_frac_e6") - col("new_frac_e6"))).cast("long").as("l1_e6"),
      sum(col("__psi_e6")).cast("long").as("psi_e6"))
    withFrac.crossJoin(broadcast(tots))
      .where(col("old_cnt") > 0 || col("new_cnt") > 0)
      .select(col("slot"), col("old_cnt"), col("new_cnt"),
        col("old_frac_e6"), col("new_frac_e6"), col("l1_e6"), col("psi_e6"))
  }

  /** Quantiles over an UNKNOWN value domain: pass 1 computes min/max,
    * pass 2 fits a `hist_sketch` over exactly [min, max) and
    * interpolates the requested quantiles, with the max values (the
    * sketch's `above` bucket, since `hi` is exclusive) treated as one
    * virtual bin at `max` so q→1 lands on the true maximum. Two narrow
    * scans, no sort, no data-keyed shuffle, a config-bounded driver
    * collect (min/max + nbins+2 counts), and EXACT cross-engine replay —
    * the deliberate trade against one-pass mergeable quantile sketches
    * (KLL/GK), whose compactions depend on partial-merge ORDER and so
    * can neither be replayed by an oracle nor reproduced across
    * partitionings. At 100 TB the second scan costs one more read of a
    * single column; determinism and a wasted-bin-free [min,max] fit
    * usually pay for it. All-NULL input returns an empty frame;
    * all-equal values return the value for every q; NaN rows are
    * excluded (Spark's max would otherwise poison the domain fit — the
    * [[winsorize]] NaN discipline).
    *
    * @return one row per q: (q_ppm BIGINT, value_e6 BIGINT)
    */
  def autoQuantiles(df0: DataFrame, valueCol: String, nbins: Int,
      qs: Seq[Double]): DataFrame = {
    require(nbins >= 1, "nbins must be >= 1")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    val spark = df0.sparkSession
    import spark.implicits._
    val x = col(valueCol).cast("double")
    val df = df0.where(!isnan(coalesce(x, lit(0.0))))
    val mm = df.agg(min(x).as("lo"), max(x).as("hi")).head()
    if (mm.isNullAt(0))
      return Seq.empty[(Long, Long)].toDF("q_ppm", "value_e6")
    val lo = mm.getDouble(0)
    val hi = mm.getDouble(1)
    if (lo == hi) // all values equal: every quantile IS that value
      return qs.map(q => (math.round(q * 1e6), math.round(lo * 1e6)))
        .toDF("q_ppm", "value_e6")
    val countsRow = df
      .agg(ColumnBridge.column(graft.functions.HistCounts(ColumnBridge.expression(
        ColumnBridge.column(graft.functions.HistSketchAgg(
          ColumnBridge.expression(lit(nbins)), ColumnBridge.expression(lit(lo)),
          ColumnBridge.expression(lit(hi)),
          ColumnBridge.expression(x)).toAggregateExpression())))).as("c"))
      .head().getSeq[Long](0)
    val bins = countsRow.slice(1, nbins + 1).toArray
    val above = countsRow.last // every above value == max (hi exclusive)
    val width = (hi - lo) / nbins
    val n = bins.sum + above
    val rows = qs.map { q =>
      val rank = q * n
      var cum = 0L
      var res = Double.NaN
      var done = false
      var b = 0
      while (b < nbins && !done) {
        val c = bins(b)
        if (c > 0) {
          val ca = cum + c
          if (ca >= rank) {
            res = lo + width * (b + math.max(0.0, (rank - cum) / c))
            done = true
          }
          cum = ca
        }
        b += 1
      }
      if (!done) res = hi // rank beyond the real bins: the virtual max bin
      (math.round(q * 1e6), math.round(res * 1e6))
    }
    rows.toDF("q_ppm", "value_e6")
  }

  /** Equal-frequency discretization: assign each row to one of `k`
    * quantile buckets (thresholds at 1/k .. (k-1)/k from ONE
    * `hist_sketch` pass) — the feature-binning / stratification step
    * (quantile features for tree models, balanced strata for sampling).
    * Bucket i = first threshold the value is below; ties at a threshold
    * go to the higher bucket (`v < t_i`, matching the oracle's CASE).
    * Same two-narrow-passes shape as [[winsorize]].
    *
    * NaN contract: `hist_sketch` drops NaN from the threshold fit, and a
    * NaN value gets a NULL bucket (it belongs to no quantile — the
    * otherwise-branch would silently file it in the top bucket). NULL
    * values already propagate to a NULL bucket through the comparisons.
    */
  def quantileBins(df: DataFrame, valueCol: String, nbins: Int,
      lo: Double, hi: Double, k: Int, outCol: String = "bucket"): DataFrame = {
    require(nbins >= 1, "nbins must be >= 1")
    require(k >= 2 && k <= 1000, "k must be in [2, 1000]")
    val qs = (1 until k).map(i => i.toDouble / k)
    val thr = df
      .agg(expr(s"hist_sketch($nbins, $lo, $hi, $valueCol)").as("__sk"))
      .select(qs.zipWithIndex.map { case (q, i) =>
        expr(s"hist_quantile(__sk, $q)").as(s"__t$i") }: _*)
    var bucket = when(isnan(col(valueCol).cast("double")), lit(null).cast("int"))
      .when(col(valueCol) < col("__t0"), lit(0))
    for (i <- 1 until k - 1)
      bucket = bucket.when(col(valueCol) < col(s"__t$i"), lit(i))
    df.crossJoin(broadcast(thr))
      .withColumn(outCol, bucket.otherwise(lit(k - 1)))
      .drop(qs.indices.map(i => s"__t$i"): _*)
  }

  /** Winsorize a numeric column at histogram-sketch quantiles — the
    * heavy-tail taming step before a column feeds model features or
    * sampling weights (a handful of extreme values otherwise dominate
    * normalization and weighted draws).
    *
    * Thresholds come from `hist_quantile` over ONE `hist_sketch` pass
    * (`[lo, hi)` fixed-range bins — the caller supplies the domain, same
    * contract as the sketch), so the whole operator is two narrow passes
    * with a single-row broadcast between them: nothing sorts, nothing
    * shuffles on data keys, and the interpolated thresholds replay
    * exactly in SQL (the `q_adaptive_filter` arithmetic).
    *
    * Appends `outCol` (clipped value), `t_lo`/`t_hi` (the thresholds),
    * and `clipped_low`/`clipped_high` flags.
    *
    * NaN contract: NaN is excluded from the threshold fit (`hist_sketch`
    * drops it) and passes through as a NULL `outCol` with false clip
    * flags — clipping NaN to t_hi (what raw least/greatest would do
    * under Spark's NaN-greatest ordering) would fabricate a value.
    */
  def winsorize(df: DataFrame, valueCol: String, nbins: Int,
      lo: Double, hi: Double, pLo: Double, pHi: Double,
      outCol: String = "winsorized"): DataFrame = {
    require(nbins >= 1, "nbins must be >= 1")
    require(pLo >= 0.0 && pHi <= 1.0 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val thr = df
      .agg(expr(s"hist_sketch($nbins, $lo, $hi, $valueCol)").as("__sk"))
      .select(expr(s"hist_quantile(__sk, $pLo)").as("t_lo"),
        expr(s"hist_quantile(__sk, $pHi)").as("t_hi"))
    val nan = isnan(col(valueCol).cast("double"))
    df.crossJoin(broadcast(thr))
      .withColumn("clipped_low", !nan && col(valueCol) < col("t_lo"))
      .withColumn("clipped_high", !nan && col(valueCol) > col("t_hi"))
      .withColumn(outCol, when(nan, lit(null))
        .otherwise(least(greatest(col(valueCol), col("t_lo")), col("t_hi"))))
  }
}
