package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** k-means behavior on the labeled synthetic embeddings: inertia
  * decreases monotonically across Lloyd iterations, and clusters align
  * with the generator's latent `label` column far better than chance.
  */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("inertia decreases monotonically over iterations") {
    val emb = Tables.embeddings(spark, sf)
    val inertias = (1 to 4).map(i => KMeans.fit(emb, k = 10, iters = i).inertia)
    inertias.sliding(2).foreach { case Seq(a, b) =>
      // relative tolerance: separate fit() calls recompute the shared
      // prefix, and reduce-merge order jitters the doubles — near the
      // plateau an absolute epsilon can flake
      assert(b <= a * (1 + 1e-9) + 1e-6, s"inertia must not increase: $inertias")
    }
  }

  test("clusters recover planted blobs with high purity") {
    // the driver embeddings are isotropic (within-label cosine ==
    // cross-label, measured), so recovery is asserted on planted blobs:
    // 5 deterministic centers, 40 points each, small deterministic noise
    import spark.implicits._
    val dim = 16
    val pts = for {
      c <- 0 until 5
      i <- 0 until 40
    } yield {
      val base = Array.tabulate(dim)(d => if (d % 5 == c) 5.0f else 0.0f)
      val noisy = base.zipWithIndex.map { case (v, d) =>
        v + 0.01f * (((c * 1000 + i * 17 + d * 7) % 13) - 6)
      }
      (c * 40L + i, noisy.toSeq, c)
    }
    val emb = pts.toDF("vec_id", "embedding", "label")
    val model = KMeans.fit(emb, k = 5, iters = 8)
    val assigned = KMeans.assignClusters(emb, model.centroids)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
    val purity = assigned
      .groupBy("cluster", "label").count()
      .groupBy("cluster").agg(max("count").as("maj"))
      .agg(sum("maj")).head().getLong(0).toDouble / 200
    assert(purity > 0.9, s"expected blob recovery, purity=$purity")
  }

  test("assignment kernel equals the crossJoin+window formulation float-for-float") {
    val emb = Tables.embeddings(spark, sf)
    val model = KMeans.fit(emb, k = 8, iters = 3)
    def asRows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cluster", "d2").orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    // same d2 arithmetic (ascending-index dots, a·a − 2ab + b·b), same
    // (d2, cid) tie-break — only the physical shape differs (map
    // kernel vs the 10B-row join+sort the 10M soak died on)
    assert(asRows(KMeans.assignClusters(emb, model.centroids)) ===
      asRows(KMeans.assignClustersJoin(emb, model.centroids)))
  }

  test("trained centroids plug into the IVF assignment path") {
    val emb = Tables.embeddings(spark, sf)
    val model = KMeans.fit(emb, k = 8, iters = 3)
    val assigned = KMeans.assignClusters(emb, model.centroids)
    assert(assigned.count() == 500)
    assert(assigned.select("cluster").distinct().count() <= 8)
    // every vector assigned exactly once
    assert(assigned.select("vec_id").distinct().count() == 500)
  }
}
