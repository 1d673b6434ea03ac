package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.CurationOps

/** The composed corpus-ingest service — the pieces of this library
  * wired into the pipeline a training-data team actually runs:
  *
  *   incoming docs
  *     → C4-style quality screen ([[graft.ops.CurationOps.withQuality]])
  *     → persisted incremental near-dup gate ([[DedupIndex]] — each
  *       batch compares against everything EVER accepted, not just
  *       itself)
  *     → blind-append into the corpus table ([[TxTable.appendCommit]] —
  *       O(increment), atomic, time-travelable)
  *
  * Retry-idempotent END TO END: the dedup index replays to identical
  * verdicts without duplicating bands (DedupIndex's contract), and the
  * corpus append anti-joins docs already committed, so a crash between
  * the index append and the corpus append — or a full batch re-run —
  * converges to the same corpus. The anti-join scans only the corpus
  * doc_id column (column-pruned); a production deployment would keep a
  * committed-ids bloom sidecar to skip even that.
  *
  * Rejected docs are not discarded silently: [[IngestStats]] carries
  * the why-counts (the reference's quality-gate severity reporting,
  * applied to curation).
  */
object CorpusIngest {

  /** Why-counts for one ingest batch. `received` counts RAW input rows
    * (before any dedup), and every received row lands in exactly one of
    * the other five buckets, so the six fields always reconcile:
    * received = dedupedInBatch + rejectedQuality + rejectedDup +
    * alreadyCommitted + appended. On a replay/resend the drops show up
    * as `alreadyCommitted` (or `rejectedDup` once the index knows the
    * bands) instead of silently vanishing from the arithmetic.
    */
  final case class IngestStats(
      received: Long, dedupedInBatch: Long, rejectedQuality: Long,
      rejectedDup: Long, alreadyCommitted: Long, appended: Long) {
    def reconciles: Boolean =
      received == dedupedInBatch + rejectedQuality + rejectedDup + alreadyCommitted + appended
  }

  /** Ingest one (micro-)batch: returns the why-counts after committing
    * survivors to `corpusRoot` (partitioned by `source`) and their
    * bands to `indexRoot`.
    */
  def ingestBatch(
      spark: SparkSession, corpusRoot: String, indexRoot: String,
      batch: DataFrame, params: DedupIndex.Params = DedupIndex.Params()): IngestStats = {
    // one row per doc_id BEFORE anything else: the within-increment gate
    // compares cand < doc_id, so two rows with the SAME id would both
    // pass it and append twice. Deterministic winner (lowest text) —
    // dropDuplicates would pick by partition order.
    val raw = batch.persist() // counted once raw, scanned once more for the window
    val received = raw.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("text")
    val unique = raw
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    val quality = CurationOps.withQuality(unique).persist()
    val uniqueCnt = quality.count()
    val passed = quality.filter(col("keep"))
      .select("doc_id", "text", "lang", "source")
    // verdicts drive three consumers (append set, dup count, accept
    // count) — persist, or each one re-runs the minhash+probe pipeline
    val verdicts = DedupIndex.ingest(spark, indexRoot, passed, params).persist()
    val acceptedIds = verdicts.filter(col("accepted")).select("doc_id")
    val accepted = passed.join(acceptedIds, Seq("doc_id"), "leftsemi")
    // corpus-side idempotence: never re-append a doc_id already
    // committed (covers batch replays AND resends in later batches)
    val novel =
      if (TxTable.latest(spark, corpusRoot)._1 > 0)
        accepted.join(
          TxTable.read(spark, corpusRoot).select("doc_id").distinct(),
          Seq("doc_id"), "left_anti")
      else accepted
    val toAppend = novel.persist()
    val appended = toAppend.count()
    if (appended > 0) TxTable.appendCommit(spark, corpusRoot, toAppend, "source")
    val nPassed = verdicts.count() // = passed rows, off the cached verdicts
    val nDup = verdicts.filter(!col("accepted")).count()
    raw.unpersist(); quality.unpersist(); verdicts.unpersist(); toAppend.unpersist()
    IngestStats(
      received = received,
      dedupedInBatch = received - uniqueCnt,
      rejectedQuality = uniqueCnt - nPassed,
      rejectedDup = nDup,
      // accepted by the index but anti-joined away by the corpus —
      // a replay or a later-batch resend of an already-committed doc
      alreadyCommitted = (nPassed - nDup) - appended,
      appended = appended)
  }

  /** File-source stream → per-batch composed ingest (AvailableNow). */
  def runAvailableNow(
      spark: SparkSession, sourceDir: String,
      sourceSchema: org.apache.spark.sql.types.StructType,
      corpusRoot: String, indexRoot: String, checkpointDir: String,
      params: DedupIndex.Params = DedupIndex.Params()): Unit = {
    val q = spark.readStream.schema(sourceSchema).parquet(sourceDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch.sparkSession, corpusRoot, indexRoot, batch, params)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
