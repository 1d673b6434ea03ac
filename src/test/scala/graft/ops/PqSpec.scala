package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Product quantization semantics: reconstruction error shrinks as the
  * code budget grows, ADC recall is near-perfect on clustered data, and
  * encoding is total + bounded.
  */
class PqSpec extends AnyFunSuite {
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

  test("finer quantization strictly reduces mean reconstruction error") {
    val emb = Tables.embeddings(spark, sf)
    def meanErr(m: Int, k: Int): Double = {
      val model = PqOps.train(emb, m = m, k = k, iters = 6)
      PqOps.encode(emb, model).agg(avg(col("recon_err2"))).head().getDouble(0)
    }
    val coarse = meanErr(2, 8)
    val fine = meanErr(8, 16)
    assert(fine < coarse,
      s"8x16 codes must beat 2x8: $fine vs $coarse")
  }

  test("ADC keeps queries in their blob; ADC + exact re-rank recovers exact L2 top-3") {
    val model = PqOps.train(blobs, m = 4, k = 16, iters = 8)
    val enc = PqOps.encode(blobs, model)
    val queryIds = Seq(5L, 45L, 85L, 125L, 165L)
    val queries = blobs.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("embedding"))

    // ADC alone: lossy codes blur WITHIN-blob ordering, but every
    // returned neighbor must still come from the query's own blob
    val adc = PqOps.searchAdc(enc, queries, model, topk = 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(adc.forall { case (q, v) => q / 40 == v / 40 },
      s"ADC returned a cross-blob neighbor: ${adc.mkString(",")}")

    // production shape: ADC candidate pool + exact re-rank = exact
    // top-3. Pool must exceed the blob size: inside a blob the codes
    // collapse (quantization error ~ within-blob distances), so ADC
    // ordering there is id-tie-break noise and a pool smaller than the
    // blob can exclude true neighbors — the same reason real PQ
    // deployments use pools of 100-1000x topk.
    val got = PqOps.searchAdcRerank(enc, blobs, queries, model, topk = 3, poolSize = 50)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pts = blobs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]) = a.zip(b).map(t => (t._1 - t._2) * (t._1 - t._2)).sum
    val exact = queryIds.flatMap { q =>
      pts.keys.filter(_ != q).toSeq
        .sortBy(c => (l2(pts(q), pts(c)), c)).take(3).map(q -> _)
    }.toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 14.0 / 15.0, s"re-ranked recall $recall below 14/15")
  }

  test("exactRerank plan: corpus embeddings never shuffle — candidate side broadcasts") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("embedding"))
    val cand = queries.select(col("q_id"))
      .crossJoin(emb.select(col("vec_id")).limit(50))
    val plan = PqOps.exactRerank(cand, emb, queries, topk = 3)
      .queryExecution.executedPlan.toString
    // the embeddings join must be a broadcast join; the only acceptable
    // exchanges are broadcast ones and the final window/sort — no
    // hashpartitioning on vec_id (that's the corpus-wide shuffle the
    // scale contract forbids)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join for the corpus side:\n$plan")
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"corpus side must not hash-shuffle on vec_id:\n$plan")
  }

  test("q_pq_encode is total: one code row per vector, codes within [0, k)") {
    // the query emits codes as a comma-joined STRING (driver's rows-only
    // compare can't sort raw arrays) — parse it back for the assertions
    val enc = graft.SparkEntry.queries("q_pq_encode")(spark, sf)
      .withColumn("carr", split(col("codes"), ",").cast("array<int>"))
    assert(enc.count() == 500)
    assert(enc.select("vec_id").distinct().count() == 500)
    val bad = enc.select(explode(col("carr")).as("c"))
      .filter(col("c").isNull || col("c") < 0 || col("c") >= 16).count()
    assert(bad == 0, "every code id within the codebook")
    // compression story: 8 codes of k=16 (4 bits) = 4 bytes per vector
    // vs 64 float dims = 256 bytes — 64x. Assert exactly ONE distinct
    // size (a head() over several would pass flakily on ragged codes)
    val sizes = enc.select(size(col("carr")).as("s")).distinct().collect().map(_.getInt(0))
    assert(sizes.toSeq == Seq(8), s"codes must be uniformly 8 wide, got ${sizes.mkString(",")}")
  }
}
