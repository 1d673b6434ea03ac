package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass distributed Gramian + mean accumulator over d-dim float
  * embeddings: buffer = (per-dim sums[d], upper-triangle ΣxᵢxⱼΣ
  * [d(d+1)/2], n). merge is elementwise add — associative/commutative,
  * so Spark runs it map-side partial like any built-in aggregate and
  * the corpus collapses to ONE ~d²/2-double statistic without ever
  * exploding (i,j) pairs into the shuffle (the d²·N-row explode
  * formulation is the anti-pattern this replaces; it is also the shape
  * the DuckDB oracle uses, which is exactly why the two implementations
  * check each other). The result is broadcast-sized for any d where
  * covariance PCA is sane (d=4096 → 64 MB buffer; beyond that you want
  * randomized sketched PCA, not a dense Gramian).
  */
final class GramianAgg(d: Int)
    extends Aggregator[Seq[Float], (Array[Double], Array[Double], Long), (Array[Double], Array[Double], Long)] {

  private val tri = d * (d + 1) / 2

  /** upper-triangle flat index for j >= i */
  @inline private def idx(i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  override def zero: (Array[Double], Array[Double], Long) =
    (new Array[Double](d), new Array[Double](tri), 0L)

  override def reduce(
      b: (Array[Double], Array[Double], Long),
      x: Seq[Float]): (Array[Double], Array[Double], Long) = {
    require(x.length == d, s"embedding dim ${x.length} != $d")
    val xs = new Array[Double](d)
    var i = 0
    while (i < d) { xs(i) = x(i).toDouble; i += 1 }
    i = 0
    while (i < d) {
      b._1(i) += xs(i)
      var j = i
      val base = i * d - i * (i - 1) / 2 - i
      while (j < d) { b._2(base + j) += xs(i) * xs(j); j += 1 }
      i += 1
    }
    (b._1, b._2, b._3 + 1)
  }

  override def merge(
      x: (Array[Double], Array[Double], Long),
      y: (Array[Double], Array[Double], Long)): (Array[Double], Array[Double], Long) = {
    var i = 0
    while (i < d) { x._1(i) += y._1(i); i += 1 }
    i = 0
    while (i < tri) { x._2(i) += y._2(i); i += 1 }
    (x._1, x._2, x._3 + y._3)
  }

  override def finish(
      r: (Array[Double], Array[Double], Long)): (Array[Double], Array[Double], Long) = r

  override def bufferEncoder: Encoder[(Array[Double], Array[Double], Long)] =
    Encoders.product[(Array[Double], Array[Double], Long)]
  override def outputEncoder: Encoder[(Array[Double], Array[Double], Long)] =
    Encoders.product[(Array[Double], Array[Double], Long)]

  /** flat index exposed for consumers unpacking the triangle */
  def triIndex(i: Int, j: Int): Int = if (i <= j) idx(i, j) else idx(j, i)
}
