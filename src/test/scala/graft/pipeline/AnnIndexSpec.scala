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

  test("ADC postings: full-probe full-pool re-rank equals the raw tier exactly; bounded-pool recall holds; bytes shrink") {
    val base = graft.TestTmp.dir("ann-index-adc")
    val (rawRoot, adcRoot) = (s"$base/raw", s"$base/adc")
    AnnIndex.build(spark, rawRoot, emb, nlist = 4)
    AnnIndex.buildAdc(spark, adcRoot, emb, nlist = 4, m = 8, k = 32)
    val queries = emb.filter(col("vec_id") < 10)

    // exact-parity pin: probing every cell with an unbounded re-rank
    // pool, the compressed index ranks the same candidates by the same
    // rounded exact cosine as the raw tier — float-for-float
    val exactRaw = rows(AnnIndex.query(spark, rawRoot, queries, k = 5, nprobe = 4))
    val rerank = rows(AnnIndex.queryRerank(
      spark, adcRoot, queries, k = 5, nprobe = 4, corpus = emb, pool = 1000))
    assert(rerank === exactRaw,
      "full-probe full-pool ADC re-rank must equal the raw tier exactly")

    // same cells: the ADC encode uses the same assignment kernel, so
    // per-cell posting counts match the raw index
    def stats(r: String) = AnnIndex.cellStats(spark, r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(stats(adcRoot) === stats(rawRoot))

    // quantization quality: pure-ADC top-5 overlap with the exact
    // top-5. These synthetic embeddings are near-uniform in pairwise
    // cosine, so top-5 margins sit BELOW the residual-quantization
    // error — the honest bound here is "far above chance" (chance =
    // k/N = 1%); the meaningful recall table comes from the
    // boundary-straddling clustered soak regime (SCALE.md §13d rule:
    // a flat-1.0 table on easy data measures nothing, and so would a
    // tuned-to-pass threshold here)
    val adc = rows(AnnIndex.query(spark, adcRoot, queries, k = 5, nprobe = 4))
    val overlap = exactRaw.groupBy(_._1).map { case (q, ex) =>
      val a = adc.filter(_._1 == q).map(_._2).toSet
      ex.map(_._2).count(a.contains) / ex.length.toDouble
    }
    val mean = overlap.sum / overlap.size
    assert(mean >= 0.1, f"mean ADC top-5 overlap $mean%.2f not above 10x chance")
    info(f"pure-ADC top-5 overlap on uniform-cosine data: $mean%.2f")

    // a bounded pool recovers most of the exact top-k even here (pool
    // covers 40% of the corpus; blind sampling would recall 0.4 — the
    // ADC ordering must be doing real work to clear 0.9)
    val pooled = rows(AnnIndex.queryRerank(
      spark, adcRoot, queries, k = 5, nprobe = 4, corpus = emb, pool = 200))
    val poolRecall = exactRaw.groupBy(_._1).map { case (q, ex) =>
      val a = pooled.filter(_._1 == q).map(_._2).toSet
      ex.map(_._2).count(a.contains) / ex.length.toDouble
    }
    assert(poolRecall.sum / poolRecall.size >= 0.9,
      f"pool=200 re-rank recall ${poolRecall.sum / poolRecall.size}%.2f collapsed")

    // the point of the tier: postings bytes shrink substantially
    // (dim-64 doubles + norm vs m=8 one-byte codes)
    val rawB = AnnIndex.postingsBytes(spark, rawRoot)
    val adcB = AnnIndex.postingsBytes(spark, adcRoot)
    assert(adcB * 2 < rawB,
      s"ADC postings $adcB B not substantially smaller than raw $rawB B")
    info(f"postings bytes raw=$rawB adc=$adcB ratio=${rawB.toDouble / adcB}%.1f")
  }

  test("ADC postings: append/replay, takedown at any nprobe, compaction — the persistence contracts hold for the compressed tier") {
    val root = graft.TestTmp.dir("ann-index-adc-grow")
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    AnnIndex.buildAdc(spark, root, half1, nlist = 4, m = 8, k = 32)
    assert(AnnIndex.append(spark, root, half2) > 0)
    assert(AnnIndex.append(spark, root, half2) === 0L, "replay must be a no-op")
    val queries = emb.filter(col("vec_id") < 10)
    val before = rows(AnnIndex.query(spark, root, queries, k = 8, nprobe = 2))
    assert(before.exists { case (_, vid, _, _) => vid % 2 == 1 },
      "appended vectors must be retrievable")

    val doomed = Seq(3L, 7L, 12L, 25L)
    assert(AnnIndex.delete(spark, root, doomed) === doomed.length)
    for (np <- 1 to 4) {
      val got = rows(AnnIndex.query(spark, root, queries, k = 8, nprobe = np))
      assert(!got.exists { case (_, vid, _, _) => doomed.contains(vid) },
        s"deleted vec_id surfaced at nprobe=$np")
      val gotR = rows(AnnIndex.queryRerank(
        spark, root, queries, k = 8, nprobe = np, corpus = emb))
      assert(!gotR.exists { case (_, vid, _, _) => doomed.contains(vid) },
        s"deleted vec_id surfaced through re-rank at nprobe=$np")
    }
    assert(AnnIndex.delete(spark, root, doomed) === 0L, "delete replay must be a no-op")
    val after = rows(AnnIndex.query(spark, root, queries, k = 8, nprobe = 2))
    AnnIndex.compact(spark, root)
    assert(rows(AnnIndex.query(spark, root, queries, k = 8, nprobe = 2)) === after,
      "compaction changed ADC answers")
  }

  test("OPQ-ADC postings: frozen rotation round-trips, re-rank equals the raw tier exactly, persistence contracts re-pinned") {
    val base = graft.TestTmp.dir("ann-index-opq")
    val (rawRoot, opqRoot) = (s"$base/raw", s"$base/opq")
    AnnIndex.build(spark, rawRoot, emb, nlist = 4)
    AnnIndex.buildAdc(spark, opqRoot, emb, nlist = 4, m = 8, k = 32, opq = true)
    val queries = emb.filter(col("vec_id") < 10)

    // exact-parity pin (the Adc tier's contract, re-pinned under the
    // rotated layout): full probe + unbounded pool re-ranks the same
    // candidates by the same rounded exact cosine — the rotation is an
    // isometry and never reaches the re-rank's raw vectors at all
    val exactRaw = rows(AnnIndex.query(spark, rawRoot, queries, k = 5, nprobe = 4))
    val rerank = rows(AnnIndex.queryRerank(
      spark, opqRoot, queries, k = 5, nprobe = 4, corpus = emb, pool = 1000))
    assert(rerank === exactRaw,
      "full-probe full-pool OPQ-ADC re-rank must equal the raw tier exactly")

    // same assignment kernel → same cells as the raw index
    def stats(r: String) = AnnIndex.cellStats(spark, r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(stats(opqRoot) === stats(rawRoot))

    // persistence contracts under the rotated layout: grow from half,
    // replay no-op, takedown at every nprobe, compaction-stable
    val growRoot = s"$base/grow"
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    AnnIndex.buildAdc(spark, growRoot, half1, nlist = 4, m = 8, k = 32, opq = true)
    assert(AnnIndex.append(spark, growRoot, half2) > 0)
    assert(AnnIndex.append(spark, growRoot, half2) === 0L, "replay must be a no-op")
    val grown = rows(AnnIndex.query(spark, growRoot, queries, k = 8, nprobe = 2))
    assert(grown.exists { case (_, vid, _, _) => vid % 2 == 1 },
      "appended vectors must be retrievable under the OPQ layout")
    val doomed = Seq(3L, 12L)
    assert(AnnIndex.delete(spark, growRoot, doomed) === doomed.length)
    for (np <- 1 to 4) {
      val got = rows(AnnIndex.queryRerank(
        spark, growRoot, queries, k = 8, nprobe = np, corpus = emb))
      assert(!got.exists { case (_, vid, _, _) => doomed.contains(vid) },
        s"deleted vec_id surfaced through OPQ re-rank at nprobe=$np")
    }
    val after = rows(AnnIndex.query(spark, growRoot, queries, k = 8, nprobe = 2))
    AnnIndex.compact(spark, growRoot)
    assert(rows(AnnIndex.query(spark, growRoot, queries, k = 8, nprobe = 2)) === after,
      "compaction changed OPQ-ADC answers")

    // equal bytes: the rotation lives beside the codebooks, never in
    // the postings — the compression ratio is the plain-ADC tier's
    val adcRoot = s"$base/plainadc"
    AnnIndex.buildAdc(spark, adcRoot, emb, nlist = 4, m = 8, k = 32)
    val (ob, ab) = (AnnIndex.postingsBytes(spark, opqRoot),
      AnnIndex.postingsBytes(spark, adcRoot))
    assert(math.abs(ob - ab) * 20 < math.max(ob, ab),
      s"OPQ postings $ob B diverge from plain-ADC $ab B — rotation leaked into postings?")
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

  test("postings feed: appends bump the version, the poll returns exactly the delta, compaction forces a re-baseline") {
    val root = graft.TestTmp.dir("ann-index-feed")
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    AnnIndex.build(spark, root, half1, nlist = 4)
    val v1 = AnnIndex.postingsVersion(spark, root)
    assert(v1 === 1L)
    // a mirror bootstrapping from nothing drains the whole table
    val Some((pv1, boot)) = AnnIndex.newPostingsSince(spark, root, 0L)
    assert(pv1 === v1)
    val half1Ids = half1.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(boot.select("vec_id").collect().map(_.getLong(0)).toSet === half1Ids)

    AnnIndex.append(spark, root, half2)
    val v2 = AnnIndex.postingsVersion(spark, root)
    assert(v2 === v1 + 1)
    // the delta is the appended vectors ONLY — the mirror never
    // re-reads the bootstrapped half
    val Some((pv2, delta)) = AnnIndex.newPostingsSince(spark, root, v1)
    assert(pv2 === v2)
    assert(delta.select("vec_id").collect().map(_.getLong(0)).toSet ===
      half2.select("vec_id").collect().map(_.getLong(0)).toSet)
    // caught up: no new version, no rows
    assert(AnnIndex.newPostingsSince(spark, root, v2).isEmpty)

    // compaction re-homes every posting: a dir-level delta would
    // double-count, so the poll refuses and the mirror re-baselines
    AnnIndex.compact(spark, root)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.newPostingsSince(spark, root, v2)
    }
    assert(e.getMessage.contains("re-baseline"))
  }
}
