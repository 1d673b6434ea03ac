package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** IVFADC semantics: residual PQ beats raw PQ at equal bits, the
  * composed index recovers exact neighbors on clustered data, and the
  * registered query is total.
  */
class IvfAdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val blobs = {
    val dim = 16
    (for {
      c <- 0 until 5
      i <- 0 until 40
    } yield {
      val base = Array.tabulate(dim)(d => if (d % 5 == c) 5.0f else 0.0f)
      val noisy = base.zipWithIndex.map { case (v, d) =>
        v + 0.05f * (((c * 1000 + i * 17 + d * 7) % 13) - 6)
      }
      (c * 40L + i, noisy.toSeq)
    }).toDF("vec_id", "embedding")
  }

  test("residual PQ reconstructs better than raw PQ at the same code budget") {
    val emb = Tables.embeddings(spark, sf)
    val raw = PqOps.train(emb, m = 8, k = 16, iters = 6)
    val rawErr = PqOps.encode(emb, raw).agg(avg(col("recon_err2"))).head().getDouble(0)
    val composed = IvfAdcOps.train(emb, nlist = 16, m = 8, k = 16, iters = 6)
    val resErr = IvfAdcOps.encode(emb, composed).agg(avg(col("recon_err2"))).head().getDouble(0)
    assert(resErr < rawErr,
      s"residual PQ must beat raw PQ at equal bits: $resErr vs $rawErr")
  }

  test("composed index recovers exact L2 top-3 on planted blobs (nprobe=1 suffices)") {
    val model = IvfAdcOps.train(blobs, nlist = 5, m = 4, k = 16, iters = 8)
    val enc = IvfAdcOps.encode(blobs, model)
    val queryIds = Seq(5L, 45L, 85L, 125L, 165L)
    val queries = blobs.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("embedding"))
    // pool >= blob size: within a blob the residual codes still collapse
    // near the quantization floor, same argument as PqSpec
    val got = IvfAdcOps.search(enc, blobs, queries, model, topk = 3, nprobe = 1, poolSize = 50)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pts = blobs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]) = a.zip(b).map(t => (t._1 - t._2) * (t._1 - t._2)).sum
    val exact = queryIds.flatMap { q =>
      pts.keys.filter(_ != q).toSeq
        .sortBy(c => (l2(pts(q), pts(c)), c)).take(3).map(q -> _)
    }.toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 14.0 / 15.0, s"IVFADC recall $recall below 14/15")
  }

  test("q_ivfadc_ann is total: 3 ranked results per query") {
    val res = graft.SparkEntry.queries("q_ivfadc_ann")(spark, sf)
    assert(res.count() == 30)
    assert(res.select("q_id").distinct().count() == 10)
    val ranks = res.groupBy("q_id").agg(collect_list(col("rank")).as("r"))
      .select(array_sort(col("r")).as("r")).distinct().collect()
    assert(ranks.length == 1 && ranks(0).getSeq[Long](0) == Seq(1L, 2L, 3L))
  }
}
