package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Local OPQ (per-cell rotations over IVF residuals): the per-cell
  * isometry contract (re-ranked results equal exact brute force), the
  * reconstruction win over a single GLOBAL rotation when cells have
  * heterogeneous local structure, determinism, and thin-cell fallback.
  */
class LocalOpqSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Blobs with per-cluster dominant directions: cluster c varies
    * strongly along dims (2c, 2c+1) only — a single global rotation
    * cannot align every cluster's variance with the block structure.
    */
  private def heterogeneous(n: Int, d: Int, nClusters: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      val c = i % nClusters
      val x = new Array[Double](d)
      // far-apart centers so coarse k-means recovers the clusters
      x(c % d) += 40.0 * (c + 1)
      val t = i.toDouble / 7 + c
      x((2 * c) % d) += 6.0 * math.sin(t)
      x((2 * c + 1) % d) += 6.0 * math.cos(t)
      var j = 0
      while (j < d) { x(j) += 0.01 * math.sin(i * 0.91 + j * 1.7); j += 1 }
      (i.toLong, x.toSeq.map(_.toFloat))
    }

  test("per-cell isometry: re-ranked local-OPQ results equal exact brute-force top-k") {
    val rows = heterogeneous(200, 16, 4)
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val model = OpqOps.trainLocal(emb, nlist = 4, m = 8, k = 4, iters = 8)
    val got = OpqOps.searchLocal(OpqOps.encodeLocal(emb, model), emb, queries, model,
      topk = 3, nprobe = 2)
      .select("q_id", "vec_id", "rank").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val pts = rows.toMap.map { case (id, e) => id -> e.map(_.toDouble).toArray }
    def l2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = (0L until 5L).flatMap { q =>
      pts.keys.filter(_ != q).toSeq
        .sortBy(c => (l2(pts(q), pts(c)), c)).take(3).zipWithIndex
        .map { case (c, i) => (q, c, i + 1L) }
    }.toSet
    assert(got == exact, s"missing: ${exact -- got}\nextra: ${got -- exact}")
  }

  test("heterogeneous cells: per-cell rotations beat one global rotation at equal bits") {
    val rows = heterogeneous(400, 16, 4)
    val emb = rows.toDF("vec_id", "embedding")
    val local = OpqOps.trainLocal(emb, nlist = 4, m = 8, k = 4, iters = 8)
    val localErr = OpqOps.encodeLocal(emb, local)
      .agg(sum("recon_err2")).head().getDouble(0)
    // global: one rotation over ALL residual structure, same budget
    val rot = OpqOps.trainRotation(emb, m = 8)
    val rotated = OpqOps.rotate(emb, rot)
    val ivf = IvfAdcOps.train(rotated, nlist = 4, m = 8, k = 4, iters = 8)
    val globalErr = IvfAdcOps.encode(rotated, ivf)
      .agg(sum("recon_err2")).head().getDouble(0)
    assert(localErr < globalErr,
      s"local rotations must win on per-cell structure: local=$localErr global=$globalErr")
  }

  test("deterministic: two trainings produce identical codes; thin cells fall back to identity") {
    val rows = heterogeneous(120, 16, 3)
    val emb = rows.toDF("vec_id", "embedding")
    def codes() = {
      val m = OpqOps.trainLocal(emb, nlist = 3, m = 8, k = 4, iters = 4)
      OpqOps.encodeLocal(emb, m).collect().map(e => e.vec_id -> e.codes.toSeq).toMap
    }
    assert(codes() == codes())
    // nlist far above cluster count => some cells get few sample points
    val thin = OpqOps.trainLocal(emb, nlist = 24, m = 8, k = 4, iters = 4, minCellSample = 8)
    val d = 16
    val identity = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    assert(thin.rotations.exists(r => r.rot.map(_.toSeq).toSeq == identity.map(_.toSeq).toSeq),
      "some thin cell must keep the identity rotation")
    // and the full pipeline still runs end-to-end with mixed rotations
    val out = OpqOps.searchLocal(
      OpqOps.encodeLocal(emb, thin), emb,
      emb.filter(col("vec_id") < 3).select(col("vec_id").as("q_id"), col("embedding")),
      thin, topk = 2, nprobe = 6)
    assert(out.count() > 0)
  }
}
