package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over embedding columns, decomposed the way
  * a 100 TB corpus forces: the ONLY distributed work is a one-pass Gram
  * (second-moment) accumulation whose output is dim^2 numbers, the
  * eigendecomposition runs on the driver over that dim x dim matrix
  * (64 x 64 = trivial), and the projection is a per-row map with the
  * k x dim component matrix broadcast as a literal. The corpus is never
  * shuffled and never scanned more than once per phase — the same
  * driver-side-small / executor-side-linear split as
  * [[Embeddings.kmeansLloyd]].
  *
  * The standard embedding-pipeline use: reduce dim 64 -> 8..16 before
  * clustering/SemDeDup (nearest-neighbor structure survives, k-means
  * assignment cost drops proportionally), or whiten before cosine dedup.
  */
object Pca {

  /** One-pass upper-triangle Gram matrix: `value(i, j) = Σ_rows x_i · x_j`
    * for `0 <= i <= j < dim`, as (i, j, sum) rows. The distributed work is
    * a single [[graft.functions.GramAgg]] — a fused multiply-add sweep per
    * row accumulating into ONE dim·(dim+1)/2 buffer per partition, so the
    * shuffle carries O(dim² · partitions) numbers, never O(rows), and no
    * per-pair row machinery touches the hot loop. (dim = 64 → 2,080 sums:
    * ~16 KB per task; the earlier explode-per-pair form generated 2,080
    * structs PER ROW through a Generate — same shuffle, ~3 orders more
    * per-row CPU.) The final explode unpacks one driver-sized array row.
    *
    * `roundE6 = true` is the cross-engine replay mode: each per-row
    * product is rounded to an integer micropoint (floor(p·1e6 + 0.5) —
    * half-up via floor, the only rounding identical in every engine) and
    * summed as BIGINT, making the result independent of both float
    * summation order and partitioning — the `q_pca_cov` oracle replays it
    * verbatim in DuckDB. The double mode (default) is what [[fit]] uses.
    */
  def gramMatrix(df: DataFrame, vecCol: String, roundE6: Boolean = false): DataFrame = {
    val vec = expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))")
    val agg = ColumnBridge.column(graft.functions.GramAgg(
      ColumnBridge.expression(vec), roundE6).toAggregateExpression())
    df.agg(agg.as("__g"))
      .select(explode(col("__g")).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"),
        col("e.v").as(if (roundE6) "gram_e6" else "gram"))
  }

  /** Driver-side PCA model: `components(c)` is the c-th eigenvector of the
    * covariance (center=true) or second-moment (center=false) matrix,
    * eigenvalues descending. Sign-canonicalized: the largest-|.| component
    * of each eigenvector is positive, so the model is deterministic.
    */
  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def k: Int = components.length
    def dim: Int = if (components.isEmpty) 0 else components(0).length
    /** Fraction of total variance captured by the first `c` components. */
    def explainedVariance(c: Int): Double = {
      val tot = eigenvalues.sum
      if (tot <= 0) 0.0 else eigenvalues.take(c).sum / tot
    }
  }

  /** Fit a k-component PCA. One distributed pass: the vector is augmented
    * with a trailing 1.0, so a single [[gramMatrix]] accumulation yields
    * sums (row `(i, dim)`), count (`(dim, dim)`), and second moments in
    * the same aggregation — means come free, no separate pass. The
    * dim x dim covariance assembly and the cyclic-Jacobi
    * eigendecomposition run on the driver (O(dim^3) on 64 x 64 — well
    * under a millisecond; the collect is dim^2/2 rows, config-sized like
    * the k-means centroid collect).
    *
    * `exactReplay = true` feeds the fit from the e6-micropoint integer
    * Gram (see [[gramMatrix]]): the model — and every [[project]] output —
    * becomes a deterministic pure function of the data, independent of
    * partitioning and summation order, so whole fit→project pipelines can
    * be golden-pinned (the `q_pca_project` gate). Double mode (default)
    * differs only in float-sum rounding noise.
    */
  def fit(df: DataFrame, vecCol: String, k: Int, center: Boolean = true,
      exactReplay: Boolean = false): PcaModel = {
    val aug = df.select(expr(
      s"array_append(transform($vecCol, x -> CAST(x AS DOUBLE)), 1.0d)").as("__aug"))
    val entries = gramMatrix(aug, "__aug", roundE6 = exactReplay).collect()
    require(entries.nonEmpty, "fit requires a non-empty input")
    val adim = entries.iterator.map(_.getInt(1)).max + 1
    val dim = adim - 1
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim ($dim), got $k")
    val g = Array.ofDim[Double](adim, adim)
    entries.foreach { r =>
      // exactReplay: e6-micropoint integer sums (partitioning- and
      // order-independent) scaled back — the whole model, and therefore
      // every projection, becomes a deterministic pure function of the
      // data, golden-oracle-pinnable across engines and cluster layouts
      val (i, j) = (r.getInt(0), r.getInt(1))
      val v = if (exactReplay) r.getLong(2) / 1e6 else r.getDouble(2)
      g(i)(j) = v; g(j)(i) = v
    }
    val n = g(dim)(dim)
    require(n > 0, "fit requires a non-empty input")
    val mean = Array.tabulate(dim)(i => g(i)(dim) / n)
    // population covariance: C_ij = S_ij/n - m_i m_j (uncentered mode
    // keeps the raw second moment and a zero mean)
    val c = Array.tabulate(dim, dim) { (i, j) =>
      if (center) g(i)(j) / n - mean(i) * mean(j) else g(i)(j) / n
    }
    val (eigVals, eigVecs) = jacobiEigen(c)
    val order = eigVals.indices.sortBy(i => -eigVals(i)).take(k)
    val comps = order.map { ci =>
      val v = Array.tabulate(dim)(r => eigVecs(r)(ci))
      val pivot = v.indices.maxBy(i => math.abs(v(i)))
      if (v(pivot) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(if (center) mean else Array.fill(dim)(0.0),
      comps, order.map(eigVals).toArray)
  }

  /** Project `vecCol` onto the model's components: out_c = (x - mean)·W_c.
    * Per-row, shuffle-free; the k x dim component matrix and the mean ride
    * as literals (broadcast with the task binary). Output ARRAY<DOUBLE>
    * of length k.
    */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "pca"): DataFrame = {
    val meanLit = typedLit(model.mean.toSeq)
    val centered = zip_with(
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))"), meanLit, (x, m) => x - m)
    val tmp = "__graft_centered"
    val dots = model.components.toSeq.map(w =>
      Embeddings.vecDot(col(tmp), typedLit(w.toSeq)))
    df.withColumn(tmp, centered)
      .withColumn(outCol, array(dots: _*))
      .drop(tmp)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector-columns), unsorted. Textbook rotations
    * (Golub & Van Loan §8.5): sweeps zero each off-diagonal entry in turn
    * until the off-diagonal Frobenius mass is ~machine-epsilon of the
    * total; 64 x 64 converges in ~6-8 sweeps.
    */
  private[operators] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    val total = math.sqrt(a.map(_.map(x => x * x).sum).sum)
    def offMass(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += 2 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }
    var sweep = 0
    while (sweep < 64 && offMass() > 1e-14 * math.max(total, 1e-300)) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t = math.signum(theta) match {
              case 0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val cth = 1.0 / math.sqrt(t * t + 1)
            val sth = t * cth
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = cth * aip - sth * aiq
              a(i)(q) = sth * aip + cth * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = cth * api - sth * aqi
              a(q)(i) = sth * api + cth * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = cth * vip - sth * viq
              v(i)(q) = sth * vip + cth * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }
}
