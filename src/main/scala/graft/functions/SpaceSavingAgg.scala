package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitters sketch (Metwally et al. '05) as a typed
  * Spark `Aggregator` — the custom-AGGREGATE tier of the extension
  * story, beside the scalar expressions and the plan nodes: partials
  * build per partition map-side, only capacity-bounded summaries ride
  * the shuffle (never the token stream), and the merge is the
  * conservative mergeable-summaries combine (Agarwal et al. '12 —
  * an absent key in the other summary contributes that summary's
  * minimum counter as both estimate and error).
  *
  * Guarantees: est ≥ true ≥ est − err, err ≤ N/capacity. While NO
  * summary has evicted (distinct keys ≤ capacity) the sketch is EXACT
  * (err = 0) and merge order cannot matter — that regime is the DuckDB
  * oracle for `q_heavy_hitters`; the approximate regime is
  * spec-bounded instead (HeavyHitterSpec).
  */
final class SpaceSaving(val capacity: Int) extends Serializable {
  require(capacity > 0, "capacity must be positive")

  // token -> [est, err]
  val counters = new java.util.HashMap[String, Array[Long]]()

  /** Minimum counter value; the upper bound for any untracked key.
    * 0 while the summary has spare capacity (nothing evicted yet).
    */
  def minEst: Long =
    if (counters.size < capacity) 0L
    else {
      var m = Long.MaxValue
      val it = counters.values().iterator()
      while (it.hasNext) m = math.min(m, it.next()(0))
      m
    }

  def add(token: String, inc: Long = 1L): Unit = {
    val cur = counters.get(token)
    if (cur != null) cur(0) += inc
    else if (counters.size < capacity) counters.put(token, Array(inc, 0L))
    else {
      // evict the minimum counter (ties: largest key, so the SMALLEST
      // key survives deterministically); inherit its count as error
      var minK: String = null
      var minV = Long.MaxValue
      val it = counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue()(0)
        if (v < minV || (v == minV && (minK == null || e.getKey.compareTo(minK) > 0))) {
          minV = v; minK = e.getKey
        }
      }
      counters.remove(minK)
      counters.put(token, Array(minV + inc, minV))
    }
  }

  /** Conservative merge, then truncate back to capacity keeping the
    * largest estimates (ties: smaller key wins, deterministically).
    */
  def merge(o: SpaceSaving): SpaceSaving = {
    val mThis = minEst
    val mOther = o.minEst
    val keys = new java.util.HashSet[String](counters.keySet())
    keys.addAll(o.counters.keySet())
    val merged = new java.util.HashMap[String, Array[Long]]()
    val it = keys.iterator()
    while (it.hasNext) {
      val k = it.next()
      val a = counters.get(k)
      val b = o.counters.get(k)
      val est = (if (a != null) a(0) else mThis) + (if (b != null) b(0) else mOther)
      val err = (if (a != null) a(1) else mThis) + (if (b != null) b(1) else mOther)
      merged.put(k, Array(est, err))
    }
    val out = new SpaceSaving(capacity)
    if (merged.size <= capacity) out.counters.putAll(merged)
    else {
      val top = new java.util.ArrayList[java.util.Map.Entry[String, Array[Long]]](merged.entrySet())
      top.sort { (x, y) =>
        val c = java.lang.Long.compare(y.getValue()(0), x.getValue()(0))
        if (c != 0) c else x.getKey.compareTo(y.getKey)
      }
      var i = 0
      while (i < capacity) {
        val e = top.get(i)
        out.counters.put(e.getKey, e.getValue)
        i += 1
      }
    }
    out
  }
}

final case class HeavyHitter(token: String, est: Long, err: Long)
final case class HeavyHitters(items: Seq[HeavyHitter])

/** Top-`k` heavy hitters over a token column via a `capacity`-bounded
  * SpaceSaving summary. Output is sorted (est desc, token asc).
  */
final class SpaceSavingAgg(capacity: Int, k: Int)
    extends Aggregator[String, SpaceSaving, HeavyHitters] {

  override def zero: SpaceSaving = new SpaceSaving(capacity)

  override def reduce(b: SpaceSaving, token: String): SpaceSaving = {
    if (token != null) b.add(token)
    b
  }

  override def merge(x: SpaceSaving, y: SpaceSaving): SpaceSaving = x.merge(y)

  override def finish(s: SpaceSaving): HeavyHitters = {
    val items = new scala.collection.mutable.ArrayBuffer[HeavyHitter](s.counters.size)
    val it = s.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      items += HeavyHitter(e.getKey, e.getValue()(0), e.getValue()(1))
    }
    HeavyHitters(
      items.sortBy(h => (-h.est, h.token)).take(k).toSeq)
  }

  override def bufferEncoder: Encoder[SpaceSaving] = Encoders.javaSerialization[SpaceSaving]
  override def outputEncoder: Encoder[HeavyHitters] = Encoders.product[HeavyHitters]
}
