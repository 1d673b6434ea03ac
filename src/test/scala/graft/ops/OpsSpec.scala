package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Behavioral tests for the non-oracle (hash-based / approximate)
  * operators: MinHash-LSH near-dup recall, SimHash locality, LSH-ANN
  * recall vs the exact baseline, approx-distinct error bounds.
  */
class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("minhash LSH finds planted near-duplicates and ranks them by jaccard") {
    val base = "the quick brown fox jumps over the lazy dog again and again until done"
    val nearDup = base.replace("done", "finished") // 1-word edit
    val distinct = "completely unrelated content about spark query engines and shuffles"
    val docs = Seq(
      (1L, base), (2L, nearDup), (3L, distinct),
      (4L, "another piece of text that shares nothing with the first pair at all"))
      .toDF("doc_id", "text")
    val dups = DedupOps.minhashNearDups(docs, n = 3, k = 32, rowsPerBand = 4, threshold = 0.3)
      .collect()
    assert(dups.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      s"planted near-dup (1,2) not found: ${dups.mkString(",")}")
    assert(!dups.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L),
      "distinct doc should not pair")
  }

  test("minhash signature approximates jaccard") {
    // identical docs -> identical signatures -> all bands collide
    val docs = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val pairs = DedupOps.minhashNearDups(docs, threshold = 0.9).collect()
    assert(pairs.length == 1 && pairs(0).getDouble(2) == 1.0)
  }

  test("simhash: near-dups have small hamming distance, unrelated docs large") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "spark shuffles partition data across executors using hash partitioning schemes"))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      DedupOps.simhash64(DedupOps.shingles(col("text"), 2)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)),
      s"near-dup hamming ${hamming(sh(1L), sh(2L))} should be < unrelated ${hamming(sh(1L), sh(3L))}")
    assert(hamming(sh(1L), sh(2L)) <= 16)
  }

  test("bounded TopKAgg brute-force twin equals the window formulation exactly") {
    val emb = Tables.embeddings(spark, sf)
    def asRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    // same rounded-cosine ordering, same vec_id tie-break — only the
    // physical top-k (window sort vs bounded aggregate) differs
    assert(asRows(SimilarityOps.cosineTopKAgg(emb, col("vec_id") < 10, 7)) ===
      asRows(SimilarityOps.cosineTopK(emb, col("vec_id") < 10, 7)))
  }

  test("LSH ANN results are a subset of correct cosine scores; recall is reasonable") {
    val emb = Tables.embeddings(spark, sf)
    val exact = SimilarityOps.cosineTopK(emb, col("vec_id") < 10, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = SimilarityOps.annLsh(emb, col("vec_id") < 10, 3).collect()
    // every ANN hit must carry the true cosine for that pair (same math)
    val full = SimilarityOps.cosineTopK(emb, col("vec_id") < 10, 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(full.contains(key) && full(key) == r.getDouble(2))
    }
    // LSH with 8 bits on 500 vecs: expect at least some overlap with exact top-3
    val annKeys = ann.map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = exact.keys.count(annKeys.contains)
    assert(overlap >= 1, s"ANN found no exact-top-3 neighbors at all ($annKeys)")
  }

  test("connected components groups transitive near-dups; canonical selection keeps min id") {
    // planted: {1,2,3} chained near-dups (1~2, 2~3 but 1!~3 directly),
    // {10,11} a pair, {20} isolated
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.85), (10L, 11L, 0.7))
      .toDF("doc_a", "doc_b", "jaccard")
    // both paths must agree: driver union-find (small-graph) and the
    // iterative min-label propagation (forced via smallGraphMaxEdges=0)
    for (maxEdges <- Seq(1000000L, 0L)) {
      val comps = DedupOps.connectedComponents(pairs, smallGraphMaxEdges = maxEdges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L,
        s"chain must collapse transitively (maxEdges=$maxEdges): $comps")
      assert(comps(10L) == 10L && comps(11L) == 10L, s"maxEdges=$maxEdges")
    }

    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again until done"),
      (2L, "the quick brown fox jumps over the lazy dog again and again until finished"),
      (20L, "completely different text about query engines and columnar execution today"))
      .toDF("doc_id", "text")
    val groups = DedupOps.dedupGroups(docs, threshold = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(groups(1L) == (1L, true))
    assert(groups(2L)._1 == 1L && !groups(2L)._2, "near-dup collapses to canonical 1")
    assert(groups(20L) == (20L, true), "isolated doc is its own canonical")
  }

  test("approx_count_distinct within 10% of exact") {
    val e = Tables.events(spark, sf)
    val exact = e.groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = e.groupBy("event_type").agg(approx_count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n <= 0.1, s"$k: exact=$n approx=${approx(k)}")
    }
  }

  test("entry flagship returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
