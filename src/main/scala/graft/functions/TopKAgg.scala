package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-key top-k as a BOUNDED typed aggregate: each map-side partial
  * holds at most 2k entries (amortized sort-and-truncate), so per-key
  * top-k never sorts whole partitions the way the
  * `row_number().over(Window)` formulation does — the window plan
  * sorts EVERY row of every partition to keep k of them; this
  * aggregate moves only O(k) per key per partition through the
  * shuffle, with map-side partial merge like any built-in aggregate.
  *
  * Ordering: value DESC, then id ASC — a total order, so the result
  * is deterministic and DuckDB-oracle-able (`q_topk_per_key` checks
  * it against the exact `row_number() <= k` formulation).
  */
final case class TopKEntry(value: Double, id: Long)
final case class TopKList(items: Seq[TopKEntry])

final class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[TopKEntry], TopKList] {
  require(k > 0, "k must be positive")

  private def trim(b: Seq[TopKEntry]): Seq[TopKEntry] =
    b.sortBy(e => (-e.value, e.id)).take(k)

  override def zero: Seq[TopKEntry] = Vector.empty

  override def reduce(b: Seq[TopKEntry], a: (Double, Long)): Seq[TopKEntry] = {
    val appended = b :+ TopKEntry(a._1, a._2)
    // amortized: only compact when the buffer doubles past k
    if (appended.length > 2 * k) trim(appended) else appended
  }

  override def merge(x: Seq[TopKEntry], y: Seq[TopKEntry]): Seq[TopKEntry] =
    trim(x ++ y)

  override def finish(b: Seq[TopKEntry]): TopKList = TopKList(trim(b))

  override def bufferEncoder: Encoder[Seq[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[TopKList] = Encoders.product[TopKList]
}
