package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The composed corpus-ingest pipeline end to end: quality screen →
  * persisted dedup gate → transactional appends, across micro-batches,
  * with full retry idempotence.
  */
class CorpusIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // all ≥10 words, mean word length in band, stopword ratio ≥ 0.03
  private val good1 = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val good1Dup = good1.replace("today", "tonight")
  private val good2 = "large scale data pipelines shuffle partition and aggregate billions of rows hourly for training"
  private val good3 = "completely unrelated text about cooking pasta with garlic olive oil and fresh basil leaves"
  private val junk = "a a a" // fails the n_words >= 10 rule

  private def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (id, t) => (id, t, "en", s"src${id % 3}") }
      .toDF("doc_id", "text", "lang", "source")

  private def corpusIds(root: String): Set[Long] =
    TxTable.read(spark, root).select("doc_id").collect().map(_.getLong(0)).toSet

  test("batches compose: quality rejects, dedup gates across batches, appends are atomic and idempotent") {
    val base = graft.TestTmp.dir("corpus-ingest")
    val (corpus, index) = (base + "/corpus", base + "/index")

    // batch 1: one junk doc, a near-dup pair, one unique
    val s1 = CorpusIngest.ingestBatch(spark, corpus, index,
      docs(1L -> good1, 2L -> good1Dup, 3L -> good2, 4L -> junk))
    assert(s1 == CorpusIngest.IngestStats(
      received = 4, dedupedInBatch = 0, rejectedQuality = 1, rejectedDup = 1,
      alreadyCommitted = 0, appended = 2), s1.toString)
    assert(s1.reconciles, s1.toString)
    assert(corpusIds(corpus) == Set(1L, 3L))

    // batch 2: a near-dup of a doc accepted in batch 1, plus a novel doc
    val s2 = CorpusIngest.ingestBatch(spark, corpus, index,
      docs(10L -> good1, 11L -> good3))
    assert(s2 == CorpusIngest.IngestStats(2, 0, 0, 1, 0, 1), s2.toString)
    assert(s2.reconciles, s2.toString)
    assert(corpusIds(corpus) == Set(1L, 3L, 11L))

    // full batch-2 replay (crash-retry): verdicts identical, corpus and
    // index unchanged, no new version published for a zero-row append.
    // Doc 11 now lands in alreadyCommitted — the replay still reconciles.
    val v = TxTable.latest(spark, corpus)._1
    val s2r = CorpusIngest.ingestBatch(spark, corpus, index,
      docs(10L -> good1, 11L -> good3))
    assert(s2r == CorpusIngest.IngestStats(2, 0, 0, 1, 1, 0), s2r.toString)
    assert(s2r.reconciles, s2r.toString)
    assert(corpusIds(corpus) == Set(1L, 3L, 11L))
    assert(TxTable.latest(spark, corpus)._1 == v, "zero-row replay must not publish")

    // the corpus table is time-travelable: version 1 = batch 1 only
    assert(TxTable.readAt(spark, corpus, 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("the same doc_id twice in ONE batch appends once, deterministically") {
    val base = graft.TestTmp.dir("corpus-intradup")
    val (corpus, index) = (base + "/corpus", base + "/index")
    // id 1 appears twice with different text: the lexicographically
    // smallest text wins (a deterministic pick, not partition order)
    val batch = docs(1L -> good2, 3L -> good3)
      .unionByName(docs(1L -> good1))
    val s = CorpusIngest.ingestBatch(spark, corpus, index, batch)
    assert(s == CorpusIngest.IngestStats(
      received = 3, dedupedInBatch = 1, rejectedQuality = 0, rejectedDup = 0,
      alreadyCommitted = 0, appended = 2), s.toString)
    assert(s.reconciles, s.toString)
    val got = TxTable.read(spark, corpus)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == good2, "deterministic winner: lexicographically lowest text")
    assert(TxTable.read(spark, corpus).count() == 2, "no duplicate rows for the repeated id")
  }

  test("the same pipeline runs through a checkpointed AvailableNow stream") {
    val base = graft.TestTmp.dir("corpus-stream")
    val (corpus, index, src) = (base + "/corpus", base + "/index", base + "/src")
    val batch = docs(1L -> good1, 2L -> good1Dup, 3L -> good2, 4L -> junk, 5L -> good3)
    batch.repartition(2).write.parquet(src)
    CorpusIngest.runAvailableNow(spark, src, batch.schema, corpus, index, base + "/ckpt")
    // survivors: 1 (or 2 — whichever id wins inside a batch is fixed by
    // doc_id order), 3, 5; junk rejected
    val got = corpusIds(corpus)
    assert(got == Set(1L, 3L, 5L), got.toString)
    val again = TxTable.read(spark, corpus).count()
    assert(again == 3)
  }
}
