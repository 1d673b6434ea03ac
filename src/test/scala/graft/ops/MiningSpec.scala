package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.pipeline.AnnIndex

/** [[MiningOps]]: contrastive triples from the exact tier verified
  * against an independent in-memory brute force, and the index-backed
  * negative miner pinned to the exact tier under a full probe.
  */
class MiningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sf)

  /** Independent brute force: plain-Scala cosine over collected rows,
    * ranked on the same 6-dp rounding + vec_id tie-break.
    */
  private lazy val ref: Map[Long, (Seq[Long], Seq[Long])] = {
    val rows = emb.collect().map { r =>
      (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2))
    }
    val norms = rows.map { case (id, v, _) => id -> math.sqrt(v.map(x => x * x).sum) }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    (for ((qid, qv, qlab) <- rows if qid < 10) yield {
      val scored = rows.filter(_._1 != qid).map { case (id, v, lab) =>
        val c = BigDecimal(cos(qv, v) / (norms(qid) * norms(id)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, lab, c)
      }
      val ord = Ordering.by[(Long, Int, Double), (Double, Long)](t => (-t._3, t._1))
      val pos = scored.filter(_._2 == qlab).sorted(ord).take(1).map(_._1).toSeq
      val neg = scored.filter(_._2 != qlab).sorted(ord).take(5).map(_._1).toSeq
      qid -> (pos, neg)
    }).toMap
  }

  test("exact tier matches an independent in-memory brute force (pos rank-1 + top-5 negatives, 10 queries)") {
    val got = MiningOps.hardNegatives(emb, col("vec_id") < 10, 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues { rs =>
        val byRole = rs.groupBy(_.getString(2))
        def ids(role: String) = byRole.getOrElse(role, Array.empty)
          .sortBy(_.getLong(4)).map(_.getLong(1)).toSeq
        (ids("pos"), ids("neg"))
      }.toMap
    assert(got.keySet === ref.keySet)
    for (q <- ref.keys) assert(got(q) === ref(q), s"query $q")
    // role contract: pos is exactly one row per query, ranks are 1..5
    val counts = MiningOps.hardNegatives(emb, col("vec_id") < 10, 5)
      .groupBy("q_id", "role").count().collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    assert(counts === Set(("pos", 1L), ("neg", 5L)))
  }

  test("indexed negative miner equals the exact tier's negatives under a full probe") {
    val root = graft.TestTmp.dir("mining-ann")
    AnnIndex.build(spark, root, emb, nlist = 4)
    val labels = emb.select(col("vec_id"), col("label"))
    val indexed = MiningOps.hardNegativesIndexed(
      spark, root, emb.filter(col("vec_id") < 10), labels,
      kNeg = 5, nprobe = 4, reserve = 16)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(4)).map(_.getLong(1)).toSeq).toMap
    for (q <- ref.keys) assert(indexed(q) === ref(q)._2, s"query $q")
  }

  test("pruned probe still mines only wrong-label rows and at most kNeg per query") {
    val root = graft.TestTmp.dir("mining-ann-p")
    AnnIndex.build(spark, root, emb, nlist = 4)
    val labels = emb.select(col("vec_id"), col("label"))
    val out = MiningOps.hardNegativesIndexed(
      spark, root, emb.filter(col("vec_id") < 10), labels,
      kNeg = 5, nprobe = 1, reserve = 16)
    val qLab = emb.select(col("vec_id").as("q_id"), col("label").as("q_label"))
    val cLab = emb.select(col("vec_id"), col("label"))
    assert(out.join(qLab, "q_id").join(cLab, "vec_id")
      .filter(col("label") === col("q_label")).count() === 0)
    assert(out.groupBy("q_id").count().filter(col("count") > 5).count() === 0)
    // pruned-probe recall vs the exact tier is positive but partial —
    // exactly the underlying index's recall shape
    val got = out.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val hit = ref.keys.toSeq.map(q => got.getOrElse(q, Set.empty[Long]).count(ref(q)._2.contains).toDouble / 5).sum / ref.size
    assert(hit > 0.0 && hit <= 1.0)
  }
}
