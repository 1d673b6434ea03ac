package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** OPQ contracts: the Jacobi eigensolver is correct, the learned
  * rotation is orthogonal (hence L2-isometric — search semantics
  * unchanged), and rotating before quantizing beats plain PQ exactly
  * where it should: correlated dimensions at the same bit budget.
  */
class OpqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("jacobiEigen reconstructs A = V diag(l) Vt with orthonormal V") {
    val d = 8
    // deterministic symmetric PSD matrix: A = B Bᵀ + I
    val b = Array.tabulate(d, d)((i, j) => math.sin(i * 3.7 + j * 1.3) + 0.2 * (i + 1))
    val a = Array.tabulate(d, d) { (i, j) =>
      (0 until d).map(k => b(i)(k) * b(j)(k)).sum + (if (i == j) 1.0 else 0.0)
    }
    val (vals, vecs) = OpqOps.jacobiEigen(a)
    // reconstruction
    for (i <- 0 until d; j <- 0 until d) {
      val recon = (0 until d).map(k => vecs(i)(k) * vals(k) * vecs(j)(k)).sum
      assert(math.abs(recon - a(i)(j)) < 1e-9 * (1.0 + math.abs(a(i)(j))),
        s"recon mismatch at ($i,$j)")
    }
    // orthonormal columns
    for (p <- 0 until d; q <- 0 until d) {
      val dot = (0 until d).map(i => vecs(i)(p) * vecs(i)(q)).sum
      val want = if (p == q) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-10, s"columns $p,$q not orthonormal: $dot")
    }
  }

  test("allocateBlocks stays balanced when every eigenvalue is < 1 (log-sum degeneracy)") {
    // descending lambdas all < 1: the raw min-log-sum greedy would dump
    // the largest d/m into block 0 (its negative sum keeps winning)
    val vals = Array.tabulate(16)(i => 0.9 / (i + 1))
    val slots = OpqOps.allocateBlocks(vals, m = 4)
    assert(slots.sorted.toSeq == (0 until 16), "every eigenvector placed exactly once")
    // the top-4 eigenvalues (indices 0..3) must land in 4 DISTINCT blocks
    val blockOf = slots.zipWithIndex.map { case (e, pos) => e -> pos / 4 }.toMap
    assert((0 until 4).map(blockOf).toSet.size == 4,
      s"largest eigenvalues must spread across blocks, got ${(0 until 4).map(blockOf)}")
  }

  test("learned rotation is an isometry: pairwise L2 distances preserved on the real corpus") {
    val emb = Tables.embeddings(spark, sf)
    val model = OpqOps.train(emb, m = 8, k = 16, iters = 2)
    val before = emb.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
      .as[(Long, Seq[Double])].collect().toMap
    val after = OpqOps.rotate(emb, model)
      .as[(Long, Seq[Double])].collect().toMap
    def d2(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = before.keys.toSeq.sorted.take(20)
    for (i <- ids; j <- ids if i < j) {
      val orig = d2(before(i), before(j))
      val rot = d2(after(i), after(j))
      assert(math.abs(orig - rot) < 1e-6 * math.max(orig, 1.0),
        s"rotation must preserve |$i-$j|²: $orig vs $rot")
    }
  }

  test("on correlated data OPQ cuts reconstruction error vs plain PQ at the same bits") {
    // strongly correlated synthetic corpus: 16 dims driven by 3 latent
    // factors + small noise — the regime real embedding models live in
    val d = 16
    val rows = (0 until 600).map { n =>
      val z = Array.tabulate(3)(f => math.sin(n * (f + 1) * 0.37) * (3 - f))
      val x = Array.tabulate(d) { i =>
        z(i % 3) * (1.0 + 0.1 * i) + 0.03 * math.cos(n * 1.7 + i)
      }
      (n.toLong, x.toSeq.map(_.toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val mPq = PqOps.train(emb, m = 8, k = 4, iters = 8)
    val pqErr = PqOps.encode(emb, mPq).agg(avg("recon_err2")).head().getDouble(0)
    val mOpq = OpqOps.train(emb, m = 8, k = 4, iters = 8)
    val opqErr = OpqOps.encode(emb, mOpq).agg(avg("recon_err2")).head().getDouble(0)
    assert(opqErr < pqErr * 0.8,
      s"OPQ must beat plain PQ by >20% on correlated dims: opq=$opqErr pq=$pqErr")
  }

  test("rotated IVFADC: residual codebooks win on correlated data; re-ranked results match exact") {
    // correlated blobs: 5 centers in a 3-factor latent space
    val d = 16
    val rows = (0 until 200).map { n =>
      val c = n % 5
      val x = Array.tabulate(d) { i =>
        2.5 * c * ((i % 3) + 1) + 0.05 * math.sin(n * 1.3 + i * 0.7)
      }
      (n.toLong, x.toSeq.map(_.toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val r = OpqOps.trainRotation(emb, m = 8)
    val got = OpqOps.ivfadcRotated(emb, queries, r,
      nlist = 5, m = 8, k = 4, iters = 8, topk = 3, nprobe = 2)
      .select("q_id", "vec_id", "rank").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    // exact top-3 by brute force on the ORIGINAL vectors — isometry
    // means the rotated index must return exactly these
    val pts = rows.toMap.map { case (id, e) => id -> e.map(_.toDouble).toArray }
    def l2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = (0L until 5L).flatMap { q =>
      pts.keys.filter(_ != q).toSeq
        .sortBy(c => (l2(pts(q), pts(c)), c)).take(3).zipWithIndex
        .map { case (c, i) => (q, c, i + 1L) }
    }.toSet
    assert(got == exact,
      s"rotated composed index + exact re-rank must equal exact top-3\nmissing: ${exact -- got}\nextra: ${got -- exact}")
  }

  test("q_opq_encode is total: one row per vector, codes within [0, k)") {
    val enc = graft.SparkEntry.queries("q_opq_encode")(spark, sf)
      .withColumn("carr", split(col("codes"), ",").cast("array<int>"))
    assert(enc.count() == 500)
    val bad = enc.select(explode(col("carr")).as("c"))
      .filter(col("c").isNull || col("c") < 0 || col("c") >= 16).count()
    assert(bad == 0)
    val sizes = enc.select(size(col("carr")).as("s")).distinct().collect().map(_.getInt(0))
    assert(sizes.toSeq == Seq(8))
  }
}
