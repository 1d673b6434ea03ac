package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.{IvfOps, KMeans, Tables}

/** [[AnnIndex]]: the persisted IVF index must answer EXACTLY like the
  * one-shot `annTrained` path when their centroids and postings match
  * (shared probeRank makes that structural — these tests prove the
  * storage layer preserves it), stay replay-idempotent on appends, and
  * keep frozen centroids immutable.
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sf)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("one-shot parity: index answers equal annTrained exactly (same training, same postings)") {
    val root = graft.TestTmp.dir("ann-index")
    AnnIndex.build(spark, root, emb, nlist = 4)
    val viaIndex = AnnIndex.query(
      spark, root, emb.filter(col("vec_id") < 10), k = 5, nprobe = 2)
    val viaOneShot = IvfOps.annTrained(
      emb, queryPred = col("vec_id") < 10, k = 5, nprobe = 2, nlist = 4)
    assert(rows(viaIndex) === rows(viaOneShot))
    // the codebook is frozen: a second build on the same root refuses
    val e = intercept[IllegalArgumentException] {
      AnnIndex.build(spark, root, emb, nlist = 4)
    }
    assert(e.getMessage.contains("frozen"))
  }

  test("incremental growth: frozen-centroid appends equal the reconstructed frozen-model search; replays are no-ops") {
    val root = graft.TestTmp.dir("ann-index-inc")
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    AnnIndex.build(spark, root, half1, nlist = 4)
    val appended = AnnIndex.append(spark, root, half2)
    assert(appended > 0)

    // independent reconstruction through the public ops: centroids
    // trained on half1 only (deterministic fitSample), ALL vectors
    // assigned to those frozen centroids, same probe+rank
    val model = KMeans.fitSample(IvfOps.unitEmb(half1), k = 4, iters = 5, spherical = true)
    val base = IvfOps.withNorm(emb)
    val corpus = base.join(
      KMeans.assignClusters(IvfOps.unitEmb(emb), model.centroids)
        .select(col("vec_id"), col("cluster")),
      "vec_id")
    val queries = emb.filter(col("vec_id") < 10)
    val expected = IvfOps.probeRank(
      corpus, IvfOps.withNorm(queries),
      KMeans.centroidDf(spark, model.centroids), k = 5, nprobe = 2)
    assert(rows(AnnIndex.query(spark, root, queries, k = 5, nprobe = 2)) === rows(expected))

    // odd-id (appended-increment) vectors are retrievable results:
    // the expected frame above contains them iff the index does — also
    // assert directly that some appended vector surfaces
    assert(rows(AnnIndex.query(spark, root, queries, k = 5, nprobe = 2))
      .exists { case (_, vid, _, _) => vid % 2 == 1 },
      "appended vectors must be retrievable")

    // replayed append: zero novel rows, postings version advances only
    // on real appends, answers unchanged
    val before = AnnIndex.cellStats(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(AnnIndex.append(spark, root, half2) === 0L)
    val after = AnnIndex.cellStats(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === before)
    assert(before.values.sum === emb.count())
    assert(rows(AnnIndex.query(spark, root, queries, k = 5, nprobe = 2)) === rows(expected))

    // compaction is pure layout: answers and cell stats identical
    AnnIndex.compact(spark, root)
    assert(AnnIndex.cellStats(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === before)
    assert(rows(AnnIndex.query(spark, root, queries, k = 5, nprobe = 2)) === rows(expected))
  }

  test("vector takedown: deleted ids never retrieved at any nprobe, postings-level parity, compaction-stable, replay-convergent") {
    val base = graft.TestTmp.dir("ann-index-del")
    val (root, corpusRoot) = (s"$base/index", s"$base/corpus")
    AnnIndex.build(spark, root, emb, nlist = 4)
    // a corpus TxTable alongside — the erase flow's other half
    TxTable.commit(spark, corpusRoot,
      emb.withColumn("part", pmod(col("vec_id"), lit(4L)).cast("string")), "part")

    val doomed = Seq(3L, 7L, 12L, 25L)
    val queries = emb.filter(col("vec_id") < 10) // includes deleted ids as queries
    val nlist = 4

    // the erase flow: corpus first, then index (the documented order)
    val corpusGone = TxTable.deleteWhere(
      spark, corpusRoot, "part", col("vec_id").isin(doomed: _*))
    assert(corpusGone === doomed.length)
    val removed = AnnIndex.delete(spark, root, doomed)
    assert(removed === doomed.length)

    // deleted vectors are never retrieved, at ANY nprobe
    for (np <- 1 to nlist) {
      val got = rows(AnnIndex.query(spark, root, queries, k = 8, nprobe = np))
      assert(!got.exists { case (_, vid, _, _) => doomed.contains(vid) },
        s"deleted vec_id surfaced at nprobe=$np")
    }

    // parity: the index now answers exactly like the same frozen
    // centroids probing the corpus minus the deleted vectors
    val cents = TxTable.read(spark, s"$root/centroids")
      .select(col("cid").cast("long").as("cid"), col("cemb"))
    val centsArr = cents.collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
    val survivors = emb.filter(!col("vec_id").isin(doomed: _*))
    val corpus = IvfOps.withNorm(survivors).join(
      KMeans.assignClusters(IvfOps.unitEmb(survivors), centsArr)
        .select(col("vec_id"), col("cluster")),
      "vec_id")
    val expected = rows(IvfOps.probeRank(
      corpus, IvfOps.withNorm(queries), cents, k = 8, nprobe = 2))
    assert(rows(AnnIndex.query(spark, root, queries, k = 8, nprobe = 2)) === expected)

    // compaction after the takedown is pure layout
    AnnIndex.compact(spark, root)
    assert(rows(AnnIndex.query(spark, root, queries, k = 8, nprobe = 2)) === expected)

    // crash between the two halves converges on replay: re-running the
    // WHOLE erase finds zero corpus rows and zero postings (pure
    // replay), and a half-done state (corpus deleted, index not — the
    // crash window) is completed by the replayed index half
    assert(TxTable.deleteWhere(
      spark, corpusRoot, "part", col("vec_id").isin(doomed: _*)) === 0L)
    assert(AnnIndex.delete(spark, root, doomed) === 0L)
    assert(rows(AnnIndex.query(spark, root, queries, k = 8, nprobe = 2)) === expected)

    // deleting ids the index never held is a no-op, not an error
    assert(AnnIndex.delete(spark, root, Seq(999999L)) === 0L)
    assert(AnnIndex.delete(spark, root, Nil) === 0L)
  }

  test("streaming ingest tier: checkpointed AvailableNow appends grow the index to the batch-built answers") {
    val base = graft.TestTmp.dir("ann-index-stream")
    val (root, src, ck) = (s"$base/index", s"$base/src", s"$base/ck")
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    AnnIndex.build(spark, root, half1, nlist = 4)
    half2.write.parquet(src)
    AnnIndex.runAppendAvailableNow(spark, root, src, emb.schema, ck)
    assert(AnnIndex.cellStats(spark, root)
      .agg(sum(col("postings"))).collect()(0).getLong(0) === emb.count())
    // a second drain with the same checkpoint sees no new files; a
    // re-delivered file (fresh checkpoint) is absorbed by the vec_id
    // anti-join — either way the index is unchanged
    AnnIndex.runAppendAvailableNow(spark, root, src, emb.schema, ck)
    AnnIndex.runAppendAvailableNow(spark, root, src, emb.schema, s"$base/ck2")
    assert(AnnIndex.cellStats(spark, root)
      .agg(sum(col("postings"))).collect()(0).getLong(0) === emb.count())
    // answers equal the same-centroid batch-built index
    val batchRoot = s"$base/batch"
    AnnIndex.build(spark, batchRoot, half1, nlist = 4)
    AnnIndex.append(spark, batchRoot, half2)
    val queries = emb.filter(col("vec_id") < 10)
    assert(rows(AnnIndex.query(spark, root, queries, k = 5, nprobe = 2)) ===
      rows(AnnIndex.query(spark, batchRoot, queries, k = 5, nprobe = 2)))
  }
}
