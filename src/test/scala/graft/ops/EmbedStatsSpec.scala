package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.EmbedStatsOps.Pca

/** PCA layer proofs — the part the DuckDB oracle cannot certify
  * (eigen float parity across engines does not exist): Jacobi solves
  * the eigenproblem, and whitening actually whitens the corpus.
  */
class EmbedStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("jacobi: A·v = λ·v and the basis is orthonormal, eigenvalues descending") {
    // fixed symmetric matrix with known spread
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.25, 0.1),
      Array(0.5, 0.25, 2.0, 0.3),
      Array(0.0, 0.1, 0.3, 1.0))
    val (vals, vecs) = Pca.jacobiEigen(a)
    assert(vals.sliding(2).forall(p => p(0) >= p(1)), "descending order")
    assert(math.abs(vals.sum - 10.0) < 1e-9, "trace preserved")
    for (c <- 0 until 4) {
      val v = vecs(c)
      val av = a.map(row => row.lazyZip(v).map(_ * _).sum)
      av.lazyZip(v).foreach((x, y) => assert(math.abs(x - vals(c) * y) < 1e-8, s"A·v=λ·v comp $c"))
      for (c2 <- 0 until 4) {
        val dot = v.lazyZip(vecs(c2)).map(_ * _).sum
        assert(math.abs(dot - (if (c == c2) 1.0 else 0.0)) < 1e-9, s"orthonormal $c,$c2")
      }
    }
  }

  test("whitened corpus has identity covariance on the kept subspace, zero mean") {
    val emb = Tables.embeddings(spark, d)
    val model = Pca.fit(spark, emb)
    assert(model.eigenvalues.take(8).forall(_ > 0), "PD covariance on real data")
    val k = 8
    val w = Pca.whiten(emb, model, k).collect()
    val n = w.length
    val cols = (0 until k).map(c => w.map(_.getDouble(c + 1)))
    for (c <- 0 until k) {
      val mean = cols(c).sum / n
      assert(math.abs(mean) < 1e-6, s"whitened pc$c centered, got $mean")
      for (c2 <- c until k) {
        val cov = cols(c).lazyZip(cols(c2)).map((x, y) => (x - mean) * y).sum / (n - 1)
        val want = if (c == c2) 1.0 else 0.0
        assert(math.abs(cov - want) < 1e-2, s"whitened cov($c,$c2)=$cov, want $want")
      }
    }
  }
}
