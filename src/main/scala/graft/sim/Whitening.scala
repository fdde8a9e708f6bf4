package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whitening transform fit from the distributed [[Gram]] statistics —
  * the application side of `q_embed_gram`: covariance from
  * (Σ g·gᵀ, Σ g, n), eigendecomposition DRIVER-SIDE on the model-sized
  * d×d matrix (2080 doubles at d=64 — the plan-constant-model pattern:
  * the corpus-scale work is the one Gram pass; the eigensolve is
  * microseconds), then W = Λ^(-1/2)·Vᵀ applied per row with builtin
  * HOFs — one scan, zero shuffles, W enters the plan as a literal.
  *
  * Whitened space makes Euclidean distance Mahalanobis distance in the
  * original space — the standard preprocessing before PQ/OPQ codebook
  * training and the reason OPQ exists (Ge et al. 2014 initialize from
  * exactly this eigenbasis).
  *
  * No oracle query: eigenvectors of a float matrix have no
  * cross-engine bit identity (sign/rotation freedom, iterative
  * convergence). The GRAM inputs are oracle-verified; this layer is
  * spec-pinned instead (reconstruction on random symmetric matrices,
  * whitened sample covariance ≈ identity on the real corpus) — the
  * same treatment as the k-means float path.
  */
object Whitening {

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors as rows) with A = Vᵀ·diag(λ)·V. Plain
    * Scala on the driver — inputs are model-sized (d ≤ a few hundred). */
  def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 64,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    require(a0.forall(_.length == d), "matrix must be square")
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    while (sweep < sweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Fit (mean, W) on the integer grid: covariance from ONE Gram pass +
    * ONE vector-sum pass (both map-side combined), eigensolve on the
    * driver; W rows are vᵀ_k / sqrt(λ_k + eps). */
  def fitWhitening(embeddings: DataFrame, dims: Int, grid: Int = 1024,
      eps: Double = 1e-6): (Array[Double], Array[Array[Double]]) = {
    val gram = Gram.gramUpperTriangle(embeddings, dims, grid)
      .collect().map(r => ((r.getLong(0).toInt, r.getLong(1).toInt),
        (r.getLong(2), r.getLong(3)))).toMap
    val n = gram.values.head._2.toDouble
    // per-dim sums over the SAME quantization: reuse the grid expression
    // through a second aggregate pass (VecSumAgg — map-side combined)
    val r = embeddings.agg(
      min(array_min(col("embedding"))).cast("double"),
      max(array_max(col("embedding"))).cast("double")).head()
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    val st = (mx - mn) / grid
    val vsum = udaf(Similarity.VecSumAgg)
    val sums = embeddings
      .select(transform(col("embedding"), x =>
        least(floor((x.cast("double") - lit(mn)) / lit(st)).cast("long"),
          lit((grid - 1).toLong))).as("g"))
      .agg(vsum(col("g"))).head().getSeq[Long](0).toArray
    val mean = sums.map(_ / n)
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      val s = if (i <= j) gram((i, j))._1 else gram((j, i))._1
      s / n - mean(i) * mean(j)
    }
    val (lambda, vecs) = jacobiEigen(cov)
    val w = Array.tabulate(dims, dims) { (k, i) =>
      vecs(k)(i) / math.sqrt(math.max(lambda(k), 0.0) + eps)
    }
    (mean, w)
  }

  /** Apply (mean, W): (vec_id, w: array<double>) — W and μ are plan
    * literals, the projection is a per-row HOF fold, zero shuffles. */
  def whiten(embeddings: DataFrame, dims: Int, grid: Int = 1024): DataFrame = {
    val (mean, w) = fitWhitening(embeddings, dims, grid)
    val r = embeddings.agg(
      min(array_min(col("embedding"))).cast("double"),
      max(array_max(col("embedding"))).cast("double")).head()
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    val st = (mx - mn) / grid
    val wLit = typedlit(w.map(_.toSeq).toSeq)
    val muLit = typedlit(mean.toSeq)
    embeddings
      .select(col("vec_id"),
        transform(col("embedding"), x =>
          least(floor((x.cast("double") - lit(mn)) / lit(st)).cast("long"),
            lit((grid - 1).toLong)).cast("double")).as("g"))
      .select(col("vec_id"),
        transform(wLit, row =>
          aggregate(
            zip_with(row, zip_with(col("g"), muLit, (g, m) => g - m),
              (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x)).as("w"))
  }
}
