package graft.streaming

import org.apache.spark.sql.DataFrame

/** Watermarked stream-stream interval join — the Structured Streaming
  * operator class the rest of the streaming tier deliberately avoided
  * (StreamingPipeline's daily aggregate notes an unbounded stream-stream
  * join "would hold every row forever"; this is the BOUNDED form that
  * doesn't).
  *
  * Semantics: [[graft.ops.FunnelOps.viewPurchasePairs]] — purchases
  * within (v_ts, v_ts + 1 hour] by the same user — applied to two
  * watermarked streams. Reference behavior anchor: the oracle-checked
  * batch twin `q_interval_join` runs the IDENTICAL join function, so
  * stream/batch parity is a function-level guarantee, spec-checked in
  * StreamingJoinSpec.
  *
  * State bound (why this survives an unbounded stream): with watermarks
  * on BOTH event-time columns and a two-sided time-range condition,
  * Spark derives per-side state watermarks — a buffered view row is
  * evicted once the watermark passes v_ts + 1 hour (no future purchase
  * can join it), a buffered purchase once it passes p_ts. State is
  * therefore O(events per watermark window), not O(stream length).
  * Inner join: late rows (beyond the watermark) are dropped, matching
  * the documented append-mode contract; the spec pins that behavior.
  */
object StreamingJoin {

  /** Join two streams shaped (view_id, v_user, v_ts) and
    * (purchase_id, p_user, p_ts). `delay` is the max expected
    * out-of-orderness per side (the watermark delay).
    */
  def viewPurchaseStream(
      views: DataFrame,
      purchases: DataFrame,
      delay: String = "2 hours",
      joinType: String = "inner"): DataFrame =
    graft.ops.FunnelOps.viewPurchasePairs(
      views.withWatermark("v_ts", delay),
      purchases.withWatermark("p_ts", delay),
      joinType)
}
