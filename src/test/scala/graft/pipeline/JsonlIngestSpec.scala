package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The JSONL dead-letter ingest tier ([[CorpusIngest.ingestJsonlBatch]]
  * / [[CorpusIngest.runJsonlAvailableNow]]): malformed and structurally
  * deficient lines land in a quarantine TxTable with their original
  * bytes, good docs flow through the composed quality+dedup+append
  * path, the accounting reconciles line-for-line, and a full replay
  * duplicates nothing on either side.
  */
class JsonlIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // quality-passing texts (≥10 words, stopword ratio in band) — the
  // CorpusIngestSpec fixtures
  private val good1 = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val good2 = "large scale data pipelines shuffle partition and aggregate billions of rows hourly for training"
  private val junk = "a a a" // valid JSON, fails the n_words >= 10 quality rule

  private val malformed = "not json at all"
  private val missingId = s"""{"lang": "en", "source": "web", "text": "$good2"}"""

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/$name"), lines.mkString("", "\n", "\n"))
  }

  test("dead-letter split: quarantine carries original bytes + reason; corpus gets the survivors; accounting reconciles; replay is idempotent") {
    val base = graft.TestTmp.dir("jsonl-ingest")
    val (src, corpus, index, quarantine) =
      (s"$base/src", s"$base/corpus", s"$base/index", s"$base/quarantine")

    // 2 good docs (null source on doc 2 → coalesced, not quarantined),
    // 1 quality-reject, 1 malformed line (twice — n_seen must count),
    // 1 valid-JSON-missing-doc_id line
    writeLines(src, "a.jsonl", Seq(
      s"""{"doc_id": 1, "lang": "en", "source": "web", "text": "$good1"}""",
      s"""{"doc_id": 2, "lang": "en", "text": "$good2"}""",
      malformed,
      s"""{"doc_id": 4, "lang": "en", "source": "web", "text": "$junk"}"""))
    writeLines(src, "b.jsonl", Seq(malformed, missingId))

    CorpusIngest.runJsonlAvailableNow(
      spark, src, corpus, index, quarantine, s"$base/ck1")

    // corpus: exactly the two quality-passing, structurally complete docs
    val corpusRows = TxTable.read(spark, corpus)
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(corpusRows.keySet === Set(1L, 2L))
    assert(corpusRows(2L) === "unknown", "null source must coalesce, not quarantine")

    // quarantine: the malformed line once (n_seen=2) + the missing-id line,
    // original bytes preserved
    val q = TxTable.read(spark, quarantine)
      .select("raw_line", "reason", "n_seen").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(q.keySet === Set(malformed, missingId))
    assert(q(malformed) === (("malformed_json", 2L)))
    assert(q(missingId) === (("missing_required_field", 1L)))

    // line accounting: file lines == quarantined + parsed-ingest rows
    val fileLines = spark.read.text(src).count()
    val s = CorpusIngest.ingestJsonlBatch(
      spark, corpus, index, quarantine, spark.read.text(src))
    assert(s.reconciles, s.toString)
    assert(s.received === fileLines)

    // that second pass was ALSO a full replay: quarantine unchanged
    // (novel-key anti-join), corpus unchanged (docs land in
    // alreadyCommitted / rejectedDup, appended == 0)
    assert(s.quarantined === 3, "bad lines still ROUTED on replay")
    assert(TxTable.read(spark, quarantine).count() === 2, "but never re-appended")
    assert(s.ingest.appended === 0, s.toString)
    assert(TxTable.read(spark, corpus).select("doc_id").distinct().count() === 2)
  }

  test("tailing: a second checkpointed drain processes only new files; corpus and quarantine extend incrementally") {
    val base = graft.TestTmp.dir("jsonl-tail")
    val (src, corpus, index, quarantine, ck) =
      (s"$base/src", s"$base/corpus", s"$base/index", s"$base/quarantine", s"$base/ck")
    val freshText = "completely unrelated text about cooking pasta with garlic olive oil and fresh basil leaves"

    writeLines(src, "a.jsonl", Seq(
      s"""{"doc_id": 1, "lang": "en", "source": "web", "text": "$good1"}""",
      malformed))
    CorpusIngest.runJsonlAvailableNow(spark, src, corpus, index, quarantine, ck)
    assert(TxTable.read(spark, corpus).count() === 1)
    assert(TxTable.read(spark, quarantine).count() === 1)
    val v1 = (TxTable.latest(spark, corpus)._1, TxTable.latest(spark, quarantine)._1)

    // tail: new file arrives; SAME checkpoint — only the new file runs
    writeLines(src, "b.jsonl", Seq(
      s"""{"doc_id": 2, "lang": "en", "source": "web", "text": "$freshText"}""",
      "also not json"))
    CorpusIngest.runJsonlAvailableNow(spark, src, corpus, index, quarantine, ck)
    assert(TxTable.read(spark, corpus).select("doc_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(TxTable.read(spark, quarantine).select("raw_line").collect()
      .map(_.getString(0)).toSet === Set(malformed, "also not json"))
    // old rows were NOT re-ingested: doc 1 would have been a
    // rejectedDup/alreadyCommitted had a.jsonl re-run, but the
    // manifests advanced exactly once each — one new commit per table
    val v2 = (TxTable.latest(spark, corpus)._1, TxTable.latest(spark, quarantine)._1)
    assert(v2._1 === v1._1 + 1 && v2._2 === v1._2 + 1,
      s"exactly one incremental commit per table: $v1 -> $v2")
  }

  test("quarantine replay: fixed rows enter the corpus exactly once and retire; unfixable rows stay; crash-replay and re-replay converge") {
    val base = graft.TestTmp.dir("jsonl-replay")
    val (src, corpus, index, quarantine) =
      (s"$base/src", s"$base/corpus", s"$base/index", s"$base/quarantine")

    // the producer bug under replay: a rogue "XX" prefix corrupting
    // otherwise-valid lines. Three fixable lines (one later crash-
    // simulated, one quality-junk), plus two lines this fix cannot heal
    // distinct text — doc 1 already holds good1, and the near-dup index
    // would (correctly) reject a same-text replay as rejectedDup
    val good7 = "seven distinct operators compose in a resilient streaming corpus pipeline for the nightly run"
    val fx7 = s"""XX{"doc_id": 7, "lang": "en", "source": "web", "text": "$good7"}"""
    val fx8 = s"""XX{"doc_id": 8, "lang": "en", "source": "web", "text": "$good2"}"""
    val fx9 = s"""XX{"doc_id": 9, "lang": "en", "source": "web", "text": "$junk"}"""
    writeLines(src, "a.jsonl", Seq(
      s"""{"doc_id": 1, "lang": "en", "source": "web", "text": "$good1"}""",
      fx7, fx8, fx9, malformed, missingId))
    CorpusIngest.runJsonlAvailableNow(
      spark, src, corpus, index, quarantine, s"$base/ck")
    assert(TxTable.read(spark, quarantine).count() === 5)
    assert(TxTable.read(spark, corpus).count() === 1)

    // crash simulation: a previous replay died AFTER committing doc 8
    // to the corpus but BEFORE retiring its quarantine row
    CorpusIngest.ingestBatch(spark, corpus, index,
      Seq((8L, "en", "web", good2)).toDF("doc_id", "lang", "source", "text"))
    assert(TxTable.read(spark, corpus).count() === 2)

    val fix = (raw: org.apache.spark.sql.Column) => regexp_replace(raw, "^XX", "")
    val r1 = CorpusIngest.replayQuarantine(spark, corpus, index, quarantine, fix)
    assert(r1.reconciles, s"replay stats must reconcile: $r1")
    assert(r1.candidates === 5 && r1.retired === 3 && r1.stillBad === 2, s"$r1")
    assert(r1.ingest.received === 3)
    assert(r1.ingest.appended === 1, s"only doc 7 is new: $r1") // doc 7
    assert(r1.ingest.alreadyCommitted === 1, s"crash-committed doc 8 must not duplicate: $r1")
    assert(r1.ingest.rejectedQuality === 1, s"junk text retired but rejected by curation: $r1")

    // corpus: docs 1, 7, 8 exactly once each (doc 9 curated away)
    val docs = TxTable.read(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(docs === Seq(1L, 7L, 8L))
    // quarantine: only the two lines this fix cannot heal, bytes intact
    val left = TxTable.read(spark, quarantine).select("raw_line")
      .collect().map(_.getString(0)).toSet
    assert(left === Set(malformed, missingId))

    // a second identical replay is a full no-op on both tables
    val r2 = CorpusIngest.replayQuarantine(spark, corpus, index, quarantine, fix)
    assert(r2.reconciles && r2.candidates === 2 && r2.retired === 0 &&
      r2.ingest.received === 0, s"$r2")
    assert(TxTable.read(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 7L, 8L))
    assert(TxTable.read(spark, quarantine).count() === 2)
  }
}
