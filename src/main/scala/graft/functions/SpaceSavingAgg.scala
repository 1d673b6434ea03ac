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
  // est -> tokens at that estimate: O(log cap) eviction and O(1) min
  // instead of a full counter scan per eviction (the update path is
  // map-side per ROW — a linear scan there is O(N·capacity) on
  // heavy-tailed streams where most rows are untracked keys)
  private val byCount = new java.util.TreeMap[Long, java.util.TreeSet[String]]()

  private def indexAdd(token: String, est: Long): Unit = {
    var set = byCount.get(est)
    if (set == null) { set = new java.util.TreeSet[String](); byCount.put(est, set) }
    set.add(token); ()
  }

  private def indexRemove(token: String, est: Long): Unit = {
    val set = byCount.get(est)
    set.remove(token)
    if (set.isEmpty) byCount.remove(est)
    ()
  }

  /** Insert/overwrite a counter, maintaining the index (merge path;
    * also the state-rehydration path of the streaming processor).
    */
  private[graft] def putRaw(token: String, est: Long, err: Long): Unit = {
    val old = counters.put(token, Array(est, err))
    if (old != null) indexRemove(token, old(0))
    indexAdd(token, est)
  }

  /** Minimum counter value; the upper bound for any untracked key.
    * 0 while the summary has spare capacity (nothing evicted yet).
    */
  def minEst: Long =
    if (counters.size < capacity) 0L else byCount.firstKey()

  def add(token: String, inc: Long = 1L): Unit = {
    val cur = counters.get(token)
    if (cur != null) {
      indexRemove(token, cur(0))
      cur(0) += inc
      indexAdd(token, cur(0))
    } else if (counters.size < capacity) {
      counters.put(token, Array(inc, 0L))
      indexAdd(token, inc)
    } else {
      // evict the minimum counter (ties: largest key, so the SMALLEST
      // key survives deterministically); inherit its count as error
      val minV = byCount.firstKey()
      val minSet = byCount.firstEntry().getValue
      val minK = minSet.last()
      counters.remove(minK)
      indexRemove(minK, minV)
      counters.put(token, Array(minV + inc, minV))
      indexAdd(token, minV + inc)
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
    if (merged.size <= capacity) {
      merged.forEach((k, v) => out.putRaw(k, v(0), v(1)))
    } else {
      val top = new java.util.ArrayList[java.util.Map.Entry[String, Array[Long]]](merged.entrySet())
      top.sort { (x, y) =>
        val c = java.lang.Long.compare(y.getValue()(0), x.getValue()(0))
        if (c != 0) c else x.getKey.compareTo(y.getKey)
      }
      var i = 0
      while (i < capacity) {
        val e = top.get(i)
        out.putRaw(e.getKey, e.getValue()(0), e.getValue()(1))
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
