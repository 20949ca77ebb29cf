package graft.functions

/** Driver-side symmetric eigensolver for the bounded d×d matrices the
  * [[org.apache.spark.sql.graft.GramMatrixAgg]] reduction produces.
  * d is the embedding dimension (64 here) — the solve is microseconds
  * and independent of corpus size, which is exactly why the
  * Gram-matrix formulation is the distributed-PCA shape: executors
  * reduce, the driver diagonalizes, the components go back out as
  * plan literals.
  *
  * Deterministic power iteration with deflation (public textbook
  * method; e.g. Golub & Van Loan §8.2): fixed start vector, fixed
  * iteration budget, sign normalized so the largest-|component| entry
  * is positive — the same corpus always yields bit-identical
  * components on any cluster.
  */
object Eigen {

  /** Top-k eigenpairs (descending eigenvalue) of a symmetric d×d
    * matrix given row-major flattened. Destructive on a private copy. */
  def topK(mFlat: Array[Double], d: Int, k: Int,
      iters: Int = 500, tol: Double = 1e-13): Seq[(Double, Array[Double])] = {
    require(mFlat.length == d * d, s"matrix ${mFlat.length} != $d x $d")
    val m = mFlat.clone()
    val found = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    (0 until math.min(k, d)).map { c =>
      // deterministic, component-dependent start (never the zero
      // vector, vanishingly unlikely to be orthogonal to the target)
      val v = Array.tabulate(d)(j => 1.0 + 0.125 * (((j + 1) * (c + 3)) % 7))
      orthogonalize(v, found)
      normalize(v)
      var lambda = 0.0
      var delta = Double.MaxValue
      var it = 0
      val mv = new Array[Double](d)
      while (it < iters && delta > tol) {
        mult(m, d, v, mv)
        // re-orthogonalize every step: deflation alone lets numerical
        // drift toward the (much larger) removed eigendirections
        // accumulate linearly; Gram-Schmidt pins orthogonality to
        // machine precision independent of spectral gaps
        orthogonalize(mv, found)
        val nrm = normalize(mv)
        delta = math.abs(nrm - math.abs(lambda))
        lambda = nrm
        System.arraycopy(mv, 0, v, 0, d)
        it += 1
      }
      // Rayleigh quotient carries the sign (power iteration's norm is
      // |λ|; covariance matrices are PSD but keep this exact anyway)
      mult(m, d, v, mv)
      lambda = dot(v, mv)
      fixSign(v)
      deflate(m, d, lambda, v)
      found += v
      (lambda, v)
    }
  }

  /** Subtract the projection of v onto each of `basis` (all unit). */
  private def orthogonalize(v: Array[Double],
      basis: scala.collection.Seq[Array[Double]]): Unit =
    basis.foreach { b =>
      val p = dot(v, b)
      var i = 0
      while (i < v.length) { v(i) -= p * b(i); i += 1 }
    }

  private def mult(m: Array[Double], d: Int, v: Array[Double], out: Array[Double]): Unit = {
    var i = 0
    while (i < d) {
      var s = 0.0
      val base = i * d
      var j = 0
      while (j < d) { s += m(base + j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** In-place L2 normalize; returns the pre-normalization norm. */
  private def normalize(v: Array[Double]): Double = {
    val n = math.sqrt(dot(v, v))
    if (n > 0) { var i = 0; while (i < v.length) { v(i) /= n; i += 1 } }
    n
  }

  /** Sign convention: the largest-|x| entry (lowest index on ties)
    * positive, so eigenvector sign is reproducible. */
  private def fixSign(v: Array[Double]): Unit = {
    var best = 0; var i = 1
    while (i < v.length) {
      if (math.abs(v(i)) > math.abs(v(best))) best = i
      i += 1
    }
    if (v(best) < 0) { var j = 0; while (j < v.length) { v(j) = -v(j); j += 1 } }
  }

  private def deflate(m: Array[Double], d: Int, lambda: Double, v: Array[Double]): Unit = {
    var i = 0
    while (i < d) {
      val li = lambda * v(i)
      val base = i * d
      var j = 0
      while (j < d) { m(base + j) -= li * v(j); j += 1 }
      i += 1
    }
  }
}
