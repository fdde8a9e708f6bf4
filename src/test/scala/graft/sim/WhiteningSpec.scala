package graft.sim

import graft.{SparkSpecBase, Tables}

class WhiteningSpec extends SparkSpecBase {

  test("jacobiEigen reconstructs random symmetric matrices") {
    val rnd = new scala.util.Random(4242L)
    for (trial <- 1 to 3) {
      val d = 8
      val a = Array.tabulate(d, d)((_, _) => 0.0)
      for (i <- 0 until d; j <- i until d) {
        val v = rnd.nextDouble() * 2 - 1
        a(i)(j) = v; a(j)(i) = v
      }
      val (lambda, vecs) = Whitening.jacobiEigen(a)
      // A == V^T diag(lambda) V
      for (i <- 0 until d; j <- 0 until d) {
        val rec = (0 until d).map(k => vecs(k)(i) * lambda(k) * vecs(k)(j)).sum
        assert(math.abs(rec - a(i)(j)) < 1e-8, s"trial $trial ($i,$j)")
      }
      // rows orthonormal
      for (k <- 0 until d; l <- k until d) {
        val dot = (0 until d).map(i => vecs(k)(i) * vecs(l)(i)).sum
        val want = if (k == l) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-8, s"trial $trial rows $k,$l")
      }
    }
  }

  test("whitened corpus has ~identity sample covariance") {
    val emb = Tables.embeddings(spark, sf0001)
    val d = 64
    val w = Whitening.whiten(emb, dims = d).collect()
      .map(_.getSeq[Double](1).toArray)
    val n = w.length.toDouble
    assert(n >= 400)
    val mean = Array.tabulate(d)(j => w.map(_(j)).sum / n)
    // sample covariance of the whitened rows
    var maxDiagErr = 0.0
    var maxOff = 0.0
    for (i <- 0 until d; j <- i until d) {
      val c = w.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      if (i == j) maxDiagErr = math.max(maxDiagErr, math.abs(c - 1.0))
      else maxOff = math.max(maxOff, math.abs(c))
    }
    // sampling noise at n=500 is ~1/sqrt(n)~0.045 per entry; the max over
    // 2k entries lands a few sigma up — generous deterministic bounds
    assert(maxDiagErr < 0.3, s"diag err $maxDiagErr")
    assert(maxOff < 0.3, s"off-diag $maxOff")
  }
}
