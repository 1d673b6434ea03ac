package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.HashFunctions

/** Streaming near-duplicate gate — the ingest-time complement of the
  * batch MinHash+LSH pipeline ([[graft.ops.DedupOps]]): a continuously
  * ingesting corpus drops near-duplicates against everything ALREADY
  * ACCEPTED, not just within the current batch.
  *
  * Shape: signatures and bucket keys are row-local column kernels
  * (same `minhash_sig` expression as batch); the only shuffle keys on
  * the PRIMARY band bucket, and `flatMapGroupsWithState` holds a
  * bounded signature list per bucket. Single-probe LSH: one band, one
  * stateful stage — a deliberate recall/plumbing tradeoff. Production
  * recall runs b of these gates in parallel (one per band) and ORs the
  * verdicts, or backfills with the batch pipeline; multi-band in ONE
  * query needs chained stateful operators, which Structured Streaming
  * restricts in append mode.
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
    docs
      .withColumn("sig",
        HashFunctions.minhash_sig(HashFunctions.ngram_shingles(col("text"), shingleN), k))
      .withColumn("bucket", hash(slice(col("sig"), 1, bandR)).cast("long"))
      .select(col("doc_id"), col("bucket"), col("sig"))
      .as[DocSig]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(gate(threshold, maxBucket))
  }
}
