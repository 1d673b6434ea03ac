package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SEMANTIC dedup gate — SemDeDup's cell-then-threshold
  * screen ([[graft.ops.SemDedupOps]], Abbas et al. 2023) applied at
  * INGEST time, the embedding-space sibling of the MinHash gate in
  * [[StreamingDedup]]: an arriving vector is dropped when an already-
  * ACCEPTED vector in its cluster cell sits at or above the cosine
  * threshold, so embedding near-duplicates never enter the corpus
  * instead of being swept in a later batch pass.
  *
  * Shape mirrors the text gate exactly: normalization and cell
  * assignment are row-local against BROADCAST centroids (k×dim
  * doubles — a model, never data); the only shuffle keys on the cell
  * id; `flatMapGroupsWithState` holds a capped list of accepted unit
  * vectors per cell. Cells play the role LSH band buckets play for
  * text: they bound the comparison set, so per-vector work is
  * O(min(cell occupancy, maxCell)) — never corpus-wide.
  *
  * Survivor semantics are the GATE's (first-come-first-kept, compare
  * against accepted only): a dropped vector is NOT stored, so a chain
  * a~b, b~c with a≁c keeps a AND c — each accepted vector is a live
  * ε-ball representative, the paper's keep-one-per-ball reading. The
  * batch [[graft.ops.SemDedupOps.semanticDedup]] instead marks ANY
  * vector with an earlier above-threshold neighbor (kept or not);
  * the spec pins the streaming gate verdict-for-verdict against an
  * independent sequential reference of THIS gate's semantics, plus
  * checkpointed-restart parity.
  *
  * Match rule within a cell: the SMALLEST accepted id at or above the
  * threshold (the batch operator's min-earlier convention), with the
  * cosine to that match reported. State cap: a full cell still
  * MATCHES against its stored vectors but stops admitting new ones —
  * bounded state at any scale.
  */
object StreamingSemDedup {

  final case class VecCell(vec_id: Long, cell: Int, unit: Seq[Double])
  final case class CellState(ids: Seq[Long], units: Seq[Seq[Double]])
  final case class SemVerdict(vec_id: Long, cell: Int, dup_of: Option[Long], cosine: Double)

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Per-cell state transition. Docs sort by vec_id first: the group
    * iterator arrives in shuffle order, and without the sort the
    * within-batch survivor among mutual near-dups would be
    * nondeterministic across reruns (same contract as the text gate).
    */
  private[streaming] def gate(threshold: Double, maxCell: Int)(
      cell: Int,
      vecs: Iterator[VecCell],
      state: GroupState[CellState]): Iterator[SemVerdict] = {
    var st = state.getOption.getOrElse(CellState(Nil, Nil))
    val out = Seq.newBuilder[SemVerdict]
    val sorted = vecs.toArray
    scala.util.Sorting.quickSort(sorted)(Ordering.by(_.vec_id))
    sorted.foreach { v =>
      // smallest stored id at/above threshold — ids are appended in
      // acceptance order but accepted ids are not monotone across
      // batches' interleavings, so scan all and take the min id
      var matchId = -1L
      var matchCos = 0.0
      var best = 0.0
      var i = 0
      while (i < st.ids.length) {
        val c = dot(v.unit, st.units(i))
        if (c >= threshold && (matchId < 0 || st.ids(i) < matchId)) {
          matchId = st.ids(i); matchCos = c
        }
        if (c > best) best = c
        i += 1
      }
      if (matchId >= 0) {
        out += SemVerdict(v.vec_id, cell, Some(matchId), math.rint(matchCos * 1e6) / 1e6)
      } else {
        out += SemVerdict(v.vec_id, cell, None, math.rint(best * 1e6) / 1e6)
        if (st.ids.length < maxCell) {
          st = CellState(st.ids :+ v.vec_id, st.units :+ v.unit)
        }
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** (vec_id, embedding) stream → per-vector verdicts. `centroids` is
    * the broadcastable cell model (fixed stand-ins or a
    * [[graft.ops.KMeans]] fit — training happens OUTSIDE the stream, on
    * a batch sample, exactly like the IVF serving split). Zero-norm
    * vectors are dropped: they have no direction, so no cosine verdict
    * exists for them (the batch operator excludes them identically).
    */
  def semanticVerdicts(
      vecs: DataFrame,
      centroids: Array[Array[Double]],
      threshold: Double = 0.8,
      maxCell: Int = 1024): Dataset[SemVerdict] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // unit-normalize the centroids once, driver-side: with unit rows
    // AND unit centroids argmax dot == argmax cosine == argmin L2
    val unitCents = centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n > 0) c.map(_ / n) else c
    }
    val bc = spark.sparkContext.broadcast(unitCents)
    vecs
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val cents = bc.value
        it.flatMap { case (id, e) =>
          val arr = e.toArray
          var s = 0.0; var i = 0
          while (i < arr.length) { s += arr(i) * arr(i); i += 1 }
          val norm = math.sqrt(s)
          if (norm <= 0) None
          else {
            val u = arr.map(_ / norm)
            // argmax cosine over broadcast cells, ties → lowest cell id
            var bestC = 0; var bestD = Double.MinValue
            var c = 0
            while (c < cents.length) {
              val d = dot(u.toSeq, cents(c).toSeq)
              if (d > bestD) { bestD = d; bestC = c }
              c += 1
            }
            Some(VecCell(id, bestC, u.toSeq))
          }
        }
      }
      .groupByKey(_.cell)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(gate(threshold, maxCell))
  }
}
