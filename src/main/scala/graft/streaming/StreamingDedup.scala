package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.functions.HashFunctions

/** Streaming near-duplicate gate — the ingest-time complement of the
  * batch MinHash+LSH pipeline ([[graft.ops.DedupOps]]): a continuously
  * ingesting corpus drops near-duplicates against everything ALREADY
  * ACCEPTED, not just within the current batch.
  *
  * Shape: signatures and bucket keys are row-local column kernels
  * (same `minhash_sig` expression as batch); the only shuffle keys on
  * the PRIMARY band bucket, and `flatMapGroupsWithState` holds a
  * bounded signature list per bucket. [[nearDupVerdicts]] is the
  * single-probe (one band) gate; [[multiBandVerdicts]] +
  * [[foldVerdicts]] deliver full b-band LSH recall in ONE query with
  * ONE stateful stage — the doc fans into all b band buckets and the
  * OR over its band verdicts is batch-local, so no chained stateful
  * operators are needed. [[nearDupVerdictsTws]] runs the gate on
  * Spark 4's transformWithState (typed ListState, optional TTL).
  *
  * State is capped at `maxBucket` signatures per bucket (the batch
  * pipeline's boilerplate-skew cap, DedupOps): a bucket beyond the cap
  * still MATCHES against its stored signatures but stops admitting new
  * ones — bounded state at any scale, and the hottest (boilerplate)
  * buckets are precisely where the cap bites first.
  */
object StreamingDedup {

  final case class DocSig(doc_id: Long, bucket: Long, sig: Seq[Long])
  final case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])
  final case class Verdict(doc_id: Long, dup_of: Option[Long], est_jaccard: Double)

  /** Estimated Jaccard = fraction of agreeing signature positions. */
  private def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    var eq = 0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  /** Per-bucket state transition: docs are processed in doc_id order —
    * the group iterator arrives in SHUFFLE order (not source order), so
    * without the sort the within-batch survivor among mutual near-dups
    * would be nondeterministic across reruns, breaking this library's
    * determinism contract. The sort buffers the bucket's micro-batch
    * slice: within-batch working memory is O(bucket batch size) —
    * bound it operationally with trigger sizing (maxFilesPerTrigger /
    * maxOffsetsPerTrigger); what `maxBucket` bounds is the state
    * CARRIED ACROSS batches. Each doc compares against the stored
    * signatures; a best match at or above `threshold` marks it a
    * duplicate (ties: smallest stored id), otherwise it is accepted
    * and (capacity permitting) stored.
    */
  private[streaming] def gate(threshold: Double, maxBucket: Int)(
      bucket: Long,
      docs: Iterator[DocSig],
      state: GroupState[BucketState]): Iterator[Verdict] = {
    var st = state.getOption.getOrElse(BucketState(Nil, Nil))
    val out = Seq.newBuilder[Verdict]
    val sorted = docs.toArray
    scala.util.Sorting.quickSort(sorted)(Ordering.by(_.doc_id))
    sorted.foreach { d =>
      var bestId = -1L
      var bestEst = -1.0
      var i = 0
      while (i < st.ids.length) {
        val e = estJaccard(d.sig, st.sigs(i))
        if (e > bestEst || (e == bestEst && st.ids(i) < bestId)) {
          bestEst = e; bestId = st.ids(i)
        }
        i += 1
      }
      if (bestEst >= threshold) {
        out += Verdict(d.doc_id, Some(bestId), bestEst)
      } else {
        out += Verdict(d.doc_id, None, math.max(bestEst, 0.0))
        if (st.ids.length < maxBucket) {
          st = BucketState(st.ids :+ d.doc_id, st.sigs :+ d.sig)
        }
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** One stored signature in the transformWithState list state. */
  final case class StoredSig(id: Long, sig: Seq[Long])

  /** The same gate on Spark 4's `transformWithState` (the arbitrary-
    * state successor to `flatMapGroupsWithState`): per-bucket
    * signatures live in a typed [[ListState]] — appended
    * incrementally, NOT rewritten whole per batch like a GroupState
    * value — and an optional processing-time TTL ages whole buckets
    * out, the retention story the GroupState version cannot express
    * for list-shaped state without rewriting it on every event.
    * Semantics are identical to [[gate]] (same ordering, same cap
    * contract), which the spec asserts verdict-for-verdict.
    */
  private[streaming] final class DedupProcessor(
      threshold: Double, maxBucket: Int, ttl: TTLConfig)
    extends StatefulProcessor[Long, DocSig, Verdict] {

    @transient private var sigs: ListState[StoredSig] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sigs = getHandle.getListState[StoredSig]("sigs", Encoders.product[StoredSig], ttl)

    override def handleInputRows(
        bucket: Long,
        rows: Iterator[DocSig],
        timers: TimerValues): Iterator[Verdict] = {
      val stored = scala.collection.mutable.ArrayBuffer.empty[StoredSig]
      sigs.get().foreach(stored += _)
      val out = Seq.newBuilder[Verdict]
      val sorted = rows.toArray
      scala.util.Sorting.quickSort(sorted)(Ordering.by(_.doc_id))
      sorted.foreach { d =>
        var bestId = -1L
        var bestEst = -1.0
        stored.foreach { s =>
          val e = estJaccard(d.sig, s.sig)
          if (e > bestEst || (e == bestEst && s.id < bestId)) { bestEst = e; bestId = s.id }
        }
        if (bestEst >= threshold) {
          out += Verdict(d.doc_id, Some(bestId), bestEst)
        } else {
          out += Verdict(d.doc_id, None, math.max(bestEst, 0.0))
          if (stored.length < maxBucket) {
            val s = StoredSig(d.doc_id, d.sig)
            stored += s
            sigs.appendValue(s) // incremental append — no whole-list rewrite
          }
        }
      }
      out.result().iterator
    }
  }

  /** [[nearDupVerdicts]] on the transformWithState runtime. `ttl`
    * bounds bucket lifetime (processing time); default keeps state
    * forever, matching the GroupState variant. NOTE: a non-default ttl
    * forces processing-time mode, in which the runtime schedules
    * NO-DATA micro-batches to advance timers — the query never
    * quiesces, so drive it with a real trigger (or stop explicitly),
    * not `processAllAvailable`.
    */
  def nearDupVerdictsTws(
      docs: DataFrame,
      threshold: Double = 0.7,
      k: Int = 32,
      bandR: Int = 4,
      shingleN: Int = 3,
      maxBucket: Int = 64,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // transformWithState stores each state variable in its own column
    // family — only the RocksDB provider supports that; the default
    // HDFS-backed store fails at QUERY start, so fail at BUILD time
    // with the fix instead
    val provider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass", "HDFSBackedStateStoreProvider")
    require(provider.contains("RocksDB"),
      "transformWithState needs the RocksDB state store: set " +
        "spark.sql.streaming.stateStore.providerClass=" +
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider " +
        s"(current: $provider)")
    // a TTL'd state variable is only legal under processing-time mode
    // (StatefulProcessorHandleImpl.validateTTLConfig) — TimeMode.None
    // with a non-NONE ttl would throw at query start
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    signed(docs, k, bandR, shingleN)
      .groupByKey(_.bucket)
      .transformWithState(
        new DedupProcessor(threshold, maxBucket, ttl),
        timeMode, OutputMode.Append())
  }

  /** Shared signature/bucket computation for both state runtimes. */
  private def signed(docs: DataFrame, k: Int, bandR: Int, shingleN: Int): Dataset[DocSig] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("sig",
        HashFunctions.minhash_sig(HashFunctions.ngram_shingles(col("text"), shingleN), k))
      .withColumn("bucket", hash(slice(col("sig"), 1, bandR)).cast("long"))
      .select(col("doc_id"), col("bucket"), col("sig"))
      .as[DocSig]
  }

  /** Multi-band verdicts: every doc fans out to ALL `bands` band
    * buckets (band index salted into the bucket hash so band b's
    * buckets never collide with band b′'s), one [[DedupProcessor]]
    * gate runs per bucket, and [[foldVerdicts]] ORs each doc's band
    * verdicts. Classic LSH recall: a near-dup pair is caught if ANY
    * band agrees — band⁻¹ of the single-probe gate's misses survive
    * per extra band.
    *
    * Because a doc's b gate verdicts are all emitted in the SAME
    * micro-batch, the OR is batch-local — run [[foldVerdicts]] inside
    * `foreachBatch` (no second stateful operator, no watermark
    * plumbing). Admission is per-band-independent, so a duplicate can
    * still be admitted into the bands that did NOT match it; `dup_of`
    * chains may therefore need transitive resolution downstream —
    * the batch pipeline's connected components is the canonical
    * resolver (DedupOps.dedupGroups).
    */
  def multiBandVerdicts(
      docs: DataFrame,
      bands: Int = 4,
      threshold: Double = 0.7,
      k: Int = 32,
      bandR: Int = 4,
      shingleN: Int = 3,
      maxBucket: Int = 64): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(bands >= 1 && bands * bandR <= k,
      s"$bands bands × $bandR rows need a signature of ≥ ${bands * bandR} (k=$k)")
    // signature computed ONCE per doc, then exploded into the b bucket
    // keys — a b-way union would re-run the minhash kernel (and rescan
    // the source) once per band
    val buckets = array((0 until bands).map(b =>
      hash(lit(b), slice(col("sig"), b * bandR + 1, bandR)).cast("long")): _*)
    val banded = docs
      .withColumn("sig",
        HashFunctions.minhash_sig(HashFunctions.ngram_shingles(col("text"), shingleN), k))
      .select(col("doc_id"), explode(buckets).as("bucket"), col("sig"))
      .as[DocSig]
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(gate(threshold, maxBucket))
  }

  /** OR a doc's per-band verdicts (batch-local — see
    * [[multiBandVerdicts]]): dup if ANY band matched; among matching
    * bands keep the highest estimate, ties to the smallest dup_of.
    */
  def foldVerdicts(verdicts: DataFrame): DataFrame =
    verdicts
      .groupBy("doc_id")
      .agg(
        max(col("est_jaccard")).as("est_jaccard"),
        min_by(col("dup_of"), when(col("dup_of").isNotNull,
          struct((-col("est_jaccard")).as("k1"), col("dup_of").as("k2"))).otherwise(
          struct(lit(Double.MaxValue).as("k1"), lit(Long.MaxValue).as("k2")))).as("dup_of"))
      .select(col("doc_id"), col("dup_of"), col("est_jaccard"))

  /** docs (doc_id, text) → streaming verdicts. `k` signature length,
    * `bandR` rows in the primary band, `shingleN` word-shingle width.
    */
  def nearDupVerdicts(
      docs: DataFrame,
      threshold: Double = 0.7,
      k: Int = 32,
      bandR: Int = 4,
      shingleN: Int = 3,
      maxBucket: Int = 64): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    signed(docs, k, bandR, shingleN)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(gate(threshold, maxBucket))
  }
}
