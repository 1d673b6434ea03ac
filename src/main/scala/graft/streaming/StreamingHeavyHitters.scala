package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.SpaceSaving

/** Streaming heavy hitters — the continuous twin of the batch
  * SpaceSaving aggregate ([[graft.functions.SpaceSavingAgg]]): a
  * vocabulary-frequency summary maintained ACROSS micro-batches, so an
  * ingest pipeline can watch its top tokens (or domains, or near-dup
  * cluster ids) drift live instead of recomputing a batch job.
  *
  * Shape: tokens shard by token hash, so each shard's SpaceSaving
  * summary covers a DISJOINT token subset — per-token estimates never
  * need cross-summary merging (which would compound error), and the
  * global top-k is just a sort over the ≤ nShards×capacity emitted
  * counters. State per shard is one capacity-bounded summary
  * (ValueState — rewritten per batch, but the summary is O(capacity),
  * never O(stream)). Only tokens shuffle, keyed by shard; the summary
  * never rides the wire.
  *
  * Determinism: each batch slice is pre-counted locally and inserted in
  * sorted-token order, so eviction order — and therefore the summary —
  * is a pure function of the batch MULTISET, not shuffle arrival order
  * (same contract as [[StreamingDedup.gate]]'s doc_id sort).
  *
  * Guarantees per shard (Metwally et al. '05): est ≥ true ≥ est − err,
  * err ≤ N_shard/capacity. With capacity ≥ shard vocabulary the summary
  * is exact (err ≡ 0) — the regime the parity spec pins against the
  * batch aggregate.
  */
object StreamingHeavyHitters {

  final case class Tok(shard: Int, token: String)
  final case class Counter(token: String, est: Long, err: Long)
  final case class ShardSummary(seq: Long, items: Seq[Counter])

  /** One emitted counter: `seq` is the shard's micro-batch revision —
    * readers keep each shard's max-seq rows ([[latestTopK]]).
    */
  final case class Emit(shard: Int, seq: Long, token: String, est: Long, err: Long)

  private[streaming] final class Processor(capacity: Int, k: Int)
    extends StatefulProcessor[Int, Tok, Emit] {

    @transient private var st: ValueState[ShardSummary] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ShardSummary](
        "summary", Encoders.product[ShardSummary], TTLConfig.NONE)

    override def handleInputRows(
        shard: Int, rows: Iterator[Tok], timers: TimerValues): Iterator[Emit] = {
      val prev = Option(st.get()).getOrElse(ShardSummary(0L, Nil))
      val ss = new SpaceSaving(capacity)
      prev.items.foreach(c => ss.putRaw(c.token, c.est, c.err))
      // batch-local pre-count, then sorted-token insertion: the summary
      // is a function of the batch multiset, not shuffle arrival order
      val cnt = scala.collection.mutable.HashMap.empty[String, Long]
      rows.foreach { t =>
        if (t.token != null) cnt.update(t.token, cnt.getOrElse(t.token, 0L) + 1L)
      }
      val toks = cnt.keys.toArray
      java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]])
      toks.foreach(tok => ss.add(tok, cnt(tok)))
      val items = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[Counter]
        val it = ss.counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          buf += Counter(e.getKey, e.getValue()(0), e.getValue()(1))
        }
        buf.sortBy(c => (-c.est, c.token)).toSeq
      }
      val seq = prev.seq + 1
      st.update(ShardSummary(seq, items))
      items.take(k).map(c => Emit(shard, seq, c.token, c.est, c.err)).iterator
    }
  }

  /** tokens (one string column `token`) → per-shard top-`k` counter
    * emissions, one revision per micro-batch. `nShards` × `capacity`
    * bounds total state; raise `nShards` for throughput (parallel
    * summaries), `capacity` for accuracy (err ≤ N_shard/capacity).
    */
  def topkStream(
      tokens: DataFrame,
      nShards: Int = 32,
      capacity: Int = 64,
      k: Int = 20): Dataset[Emit] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val provider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass", "HDFSBackedStateStoreProvider")
    require(provider.contains("RocksDB"),
      "transformWithState needs the RocksDB state store: set " +
        "spark.sql.streaming.stateStore.providerClass=" +
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider " +
        s"(current: $provider)")
    tokens
      .select(
        pmod(xxhash64(col("token")), lit(nShards.toLong)).cast("int").as("shard"),
        col("token"))
      .as[Tok]
      .groupByKey(_.shard)
      .transformWithState(new Processor(capacity, k), TimeMode.None(), OutputMode.Append())
  }

  /** Global top-`k` from a drained emission frame: each shard's latest
    * revision (max seq), sorted est desc / token asc. Because shards
    * partition the token space, this is exactly the top-k of the union
    * summary — no cross-summary merge error.
    */
  def latestTopK(emitted: DataFrame, k: Int): DataFrame = {
    val latest = emitted.groupBy("shard").agg(max("seq").as("seq"))
    emitted.join(broadcast(latest), Seq("shard", "seq"))
      .orderBy(desc("est"), asc("token"))
      .limit(k)
      .select("token", "est", "err")
  }
}
