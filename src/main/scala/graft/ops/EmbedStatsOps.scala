package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GramianAgg

/** Embedding second-order statistics and PCA whitening — the
  * preprocessing layer in front of the ANN/PQ battery (OPQ already
  * rotates; whitening equalizes variance so quantizers spend bits
  * evenly). Two tiers:
  *
  *  - `q_embed_covariance` (oracle-checked): the full covariance matrix
  *    via [[GramianAgg]] — ONE distributed pass, map-side-combined, the
  *    corpus collapses to a single ~d²/2-double statistic. The DuckDB
  *    oracle computes the same matrix by the d²·N-row pair-join
  *    formulation, so the two shapes certify each other.
  *  - `Pca.fit` / `Pca.whiten` (spec-verified): driver-side Jacobi
  *    eigen-decomposition of the d×d covariance (d is small by
  *    construction; the DATA never leaves executors), rotation
  *    broadcast back as literal arrays, projection through the native
  *    dot-product kernel. Eigen float parity across engines does not
  *    exist, so this layer is deliberately NOT a queries() entry —
  *    `EmbedStatsSpec` proves A·v = λ·v, orthonormality, and that the
  *    whitened covariance is the identity on the kept subspace.
  */
object EmbedStatsOps {

  /** (sums[d], upper-triangle Σxᵢxⱼ, n) in one pass. */
  def gramian(s: SparkSession, emb: DataFrame, d: Int): (Array[Double], Array[Double], Long) = {
    import s.implicits._
    emb.select(col("embedding")).as[Seq[Float]]
      .select(new GramianAgg(d).toColumn).head()
  }

  /** Dense symmetric covariance matrix from the one-pass statistic. */
  def covarianceMatrix(sums: Array[Double], prods: Array[Double], n: Long): Array[Array[Double]] = {
    val d = sums.length
    val agg = new GramianAgg(d)
    Array.tabulate(d, d) { (i, j) =>
      (prods(agg.triIndex(i, j)) - sums(i) * sums(j) / n) / (n - 1)
    }
  }

  val all: Seq[QueryDef] = Seq(

    // Upper-triangle covariance entries (i <= j), both engines applying
    // the identical (sxy - sx*sy/n)/(n-1) expression to their own sums.
    QueryDef(
      "q_embed_covariance",
      """WITH e AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |p AS (
        |  SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy, count(*) AS n
        |  FROM e a JOIN e b USING (vec_id) WHERE a.i <= b.i
        |  GROUP BY a.i, b.i),
        |s AS (SELECT i, sum(x) AS sx FROM e GROUP BY i)
        |SELECT CAST(p.i - 1 AS BIGINT) AS i, CAST(p.j - 1 AS BIGINT) AS j,
        |  round((p.sxy - si.sx * sj.sx / p.n) / (p.n - 1), 6) + 0.0 AS cov
        |FROM p JOIN s si ON si.i = p.i JOIN s sj ON sj.i = p.j
        |ORDER BY i, j""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val (sums, prods, n) = gramian(s, emb, dim)
      // the distributed pass is done; what follows materializes the
      // d(d+1)/2-row result and routes the final float expression
      // through Spark's own round(), the same path every other query's
      // oracle parity rides on
      val agg = new GramianAgg(dim)
      val rows = for { i <- 0 until dim; j <- i until dim }
        yield (i.toLong, j.toLong, prods(agg.triIndex(i, j)), sums(i), sums(j))
      import s.implicits._
      rows.toDF("i", "j", "sxy", "si", "sj")
        .select(
          col("i"), col("j"),
          // + 0.0 canonicalizes IEEE negative zero (round() of a tiny
          // negative covariance yields -0.0 in one engine, 0.0 in the
          // other; -0.0 + 0.0 = +0.0 in both, all other values exact)
          (round(
            (col("sxy") - col("si") * col("sj") / lit(n.toDouble)) / lit((n - 1).toDouble),
            6) + lit(0.0)).as("cov"))
        .orderBy("i", "j")
    })

  /** Driver-side PCA over the distributed covariance. */
  object Pca {

    final case class Model(
        means: Array[Double],
        eigenvalues: Array[Double], // descending
        eigenvectors: Array[Array[Double]]) // column c = eigenvectors(c)

    /** Cyclic Jacobi eigen-decomposition of a symmetric matrix —
      * deterministic, no external linear-algebra dependency, exact
      * enough for whitening (off-diagonal mass < 1e-12 after ~8
      * sweeps on d≤512). Returns (values desc, vectors as rows).
      */
    def jacobiEigen(mIn: Array[Array[Double]], sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
      val d = mIn.length
      val a = Array.tabulate(d, d)((i, j) => mIn(i)(j))
      val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
      var sweep = 0
      var off = Double.MaxValue
      while (sweep < sweeps && off > 1e-12) {
        off = 0.0
        var p = 0
        while (p < d - 1) {
          var q = p + 1
          while (q < d) {
            val apq = a(p)(q)
            off += 2 * apq * apq
            if (math.abs(apq) > 1e-15) {
              val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
              val sg = if (theta >= 0) 1.0 else -1.0
              val t = sg / (math.abs(theta) + math.sqrt(theta * theta + 1))
              val c = 1 / math.sqrt(t * t + 1)
              val sn = t * c
              var k = 0
              while (k < d) {
                val akp = a(k)(p); val akq = a(k)(q)
                a(k)(p) = c * akp - sn * akq
                a(k)(q) = sn * akp + c * akq
                k += 1
              }
              k = 0
              while (k < d) {
                val apk = a(p)(k); val aqk = a(q)(k)
                a(p)(k) = c * apk - sn * aqk
                a(q)(k) = sn * apk + c * aqk
                val vkp = v(k)(p); val vkq = v(k)(q)
                v(k)(p) = c * vkp - sn * vkq
                v(k)(q) = sn * vkp + c * vkq
                k += 1
              }
            }
            q += 1
          }
          p += 1
        }
        sweep += 1
      }
      val order = (0 until d).sortBy(i => -a(i)(i))
      (order.map(i => a(i)(i)).toArray, order.map(c => (0 until d).map(r => v(r)(c)).toArray).toArray)
    }

    def fit(s: SparkSession, emb: DataFrame): Model = {
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val (sums, prods, n) = gramian(s, emb, dim)
      val cov = covarianceMatrix(sums, prods, n)
      val (vals, vecs) = jacobiEigen(cov)
      Model(sums.map(_ / n), vals, vecs)
    }

    /** Project to the top-k whitened components: yᶜ = (⟨x, vᶜ⟩ − ⟨μ, vᶜ⟩)
      * / √λᶜ. The model rides into the plan as literal arrays (broadcast
      * by construction); the per-row math is the native dot kernel — no
      * UDF, no shuffle, embarrassingly parallel.
      */
    def whiten(emb: DataFrame, model: Model, k: Int): DataFrame = {
      val xd: Column = transform(col("embedding"), _.cast(DoubleType))
      val comps = (0 until k).map { c =>
        val vc = model.eigenvectors(c)
        val bias = vc.lazyZip(model.means).map(_ * _).sum
        ((SimilarityOps.dot(xd, typedLit(vc.toSeq)) - lit(bias)) /
          lit(math.sqrt(math.max(model.eigenvalues(c), 1e-12)))).as(s"pc$c")
      }
      emb.select(col("vec_id") +: comps: _*)
    }
  }
}
