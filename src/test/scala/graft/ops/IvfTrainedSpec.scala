package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Honest verification of the trained IVF path (q_ivf_*_trained).
  *
  * NOTE on the bar: the oracle stand-in `q_ivf_ann` scores 29/30 recall,
  * but that number is an ARTIFACT — its query set (vec_id < 10) is a
  * subset of its centroid set (vec_id < 16), so each query's top
  * neighbors are pulled into the query's own cell by construction (n was
  * chosen as argmax cos(n, corpus), and q ∈ centroids, so argmax
  * cos(n, centroids) lands on q; measured per-pair: 29/30 hits are the
  * query's own cell). Trained centroids can't and shouldn't reproduce
  * that. The honest bars: (1) on the isotropic driver corpus, recall must
  * beat random probing by a wide margin (directional signal); (2) on
  * clustered data — the regime real embedding corpora live in — recall
  * must be near-perfect; (3) trained centroids must strictly beat the
  * first-N stand-in on the training objective (inertia).
  */
class IvfTrainedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("isotropic corpus: trained recall beats random probing >=2.4x") {
    val exact = SimilarityOps.cosineTopK(Tables.embeddings(spark, sf), col("vec_id") < 10, 3)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = SparkEntry.queries("q_ivf_ann_trained")(spark, sf)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = trained.intersect(exact).size.toDouble / exact.size
    // 2 of 16 balanced cells ≈ 12.5% of the corpus probed; random cells
    // would give ~0.125 recall. Measured ~0.4 = 3.2x signal.
    assert(recall >= 0.3, s"recall $recall: cells carry no directional signal")
  }

  test("clustered corpus (planted blobs): trained recall is near-perfect") {
    import spark.implicits._
    val dim = 16
    val pts = for {
      c <- 0 until 5
      i <- 0 until 40
    } yield {
      val base = Array.tabulate(dim)(d => if (d % 5 == c) 5.0f else 0.0f)
      val noisy = base.zipWithIndex.map { case (v, d) =>
        v + 0.05f * (((c * 1000 + i * 17 + d * 7) % 13) - 6)
      }
      (c * 40L + i, noisy.toSeq)
    }
    val emb = pts.toDF("vec_id", "embedding")
    // queries: one point per blob, NOT in the centroid set by
    // construction (centroids are trained, not picked from ids)
    val queryIds = Seq(5L, 45L, 85L, 125L, 165L)
    val exact = SimilarityOps.cosineTopK(emb, col("vec_id").isin(queryIds: _*), 3)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = IvfOps.annTrained(emb, col("vec_id").isin(queryIds: _*),
      k = 3, nlist = 5, nprobe = 1, iters = 8)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 14.0 / 15.0, s"blob recall $recall below 14/15")
  }

  test("trained centroids have strictly lower inertia than the first-N stand-in") {
    val emb = Tables.embeddings(spark, sf)
    val standInCents = emb
      .filter(col("vec_id") < 16).orderBy("vec_id")
      .select(transform(col("embedding"), _.cast("double")).as("e"))
      .collect().map(_.getSeq[Double](0).toArray)
    val standInInertia =
      KMeans.assignClusters(emb, standInCents).agg(sum("d2")).head().getDouble(0)
    val trained = KMeans.fit(emb, k = 16, iters = 5)
    assert(trained.inertia < standInInertia,
      s"trained inertia ${trained.inertia} not below stand-in $standInInertia")
  }

  test("IVF autotuning: FAISS-style nlist/nprobe rules and an end-to-end auto search") {
    import IvfOps.Tuning
    // density clamp dominates small corpora: 500/39 = 12 < 4*sqrt(500) = 89
    assert(Tuning.nlistFor(500) == 12)
    // large corpora: the density clamp follows the TRAINING SAMPLE
    // (20000/39 = 512), not the corpus — fitSample trains on <= 20k
    // points, so 4*sqrt(1e8) = 40000 centroids would each get half a
    // training point
    assert(Tuning.nlistFor(100000000L) == 512)
    assert(Tuning.nlistFor(100000000L, maxSample = 4000000) == 40000,
      "sqrt rule resumes once the sample is big enough")
    assert(Tuning.nlistFor(1) == 4, "floor clamp")
    assert(Tuning.nprobeFor(16, 0.1) == 2)
    assert(Tuning.nprobeFor(16, 1.0) == 16)
    val auto = IvfOps.annTrainedAuto(Tables.embeddings(spark, sf), col("vec_id") < 10, k = 3)
    assert(auto.count() == 30, "3 results per query for 10 queries")
  }

  test("trained assignment is total: every vector in exactly one of <=16 cells") {
    val assigned = SparkEntry.queries("q_ivf_assign_trained")(spark, sf)
    assert(assigned.count() == 500)
    assert(assigned.select("vec_id").distinct().count() == 500)
    assert(assigned.select("cluster").distinct().count() <= 16)
  }
}
