package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Adversarial-scale demo for the ITERATIVE connected-components path:
  * a dup CHAIN (0–1–2–…–n−1) is the worst case min-label propagation
  * admits — one giant component whose diameter equals the node count,
  * so the label needs a full n rounds to reach the far end (real
  * near-dup graphs are shallow; this is the pathological regime the
  * 100 TB contract has to survive anyway).
  *
  * The property under test is NOT just convergence: each round must
  * cost the SAME driver+executor work. Without the per-round lineage
  * cut in [[DedupOps.connectedComponents]], round i's logical plan
  * nests all i−1 predecessors — caching short-circuits execution but
  * analysis still walks the whole nested tree, so per-round time grows
  * linearly and total time quadratically in the diameter.
  */
class CcScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("a diameter-32 dup chain converges to one giant component with flat per-round cost") {
    val n = 32
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // smallGraphMaxEdges = 0 forces the iterative scale path (the driver
    // union-find would absorb a 31-edge graph trivially otherwise)
    val got = DedupOps.connectedComponents(pairs, maxIters = n + 8, smallGraphMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == n, s"every chain node labeled, got ${got.length}")
    assert(got.forall(_._2 == 0L),
      s"giant component: every node reaches min id 0 — ${got.filter(_._2 != 0L).take(5).toSeq}")

    val ms = DedupOps.lastIterationMillis
    // min-label travels one hop per round: full propagation needs ~n−1
    // rounds plus one no-change round to detect the fixpoint
    assert(ms.length >= n - 1, s"expected ≈$n rounds for a diameter-$n chain, got ${ms.length}")
    // Flatness is asserted on the LOAD-INSENSITIVE proxy: per-round RDD
    // lineage depth. With the per-round localCheckpoint cut every round
    // from the second on builds on a truncated DAG of identical shape
    // (round 1 still nests the un-checkpointed initial labels), so the
    // depth is exactly constant; remove the cut and each round's DAG
    // nests its predecessor, so the depth climbs monotonically — the
    // quadratic regime this test exists to catch. Wall-clock stays
    // info-only: this host's ambient load drifts up to ~70%, and a GC
    // or co-tenant burst concentrated in the last rounds failed the
    // old 3×-median timing guard without any code regression.
    val depths = DedupOps.lastIterationLineageDepth
    info(s"per-round ms (${ms.length} rounds): ${ms.mkString(",")}")
    info(s"per-round lineage depth: ${depths.mkString(",")}")
    val steady = depths.drop(1)
    assert(steady.nonEmpty && steady.distinct.size == 1,
      s"per-round lineage depth must be constant after round 1 (the checkpoint " +
        s"cut truncates each round's DAG) — got $depths")
  }

  test("chain + clique mix: components and labels exact on the iterative path") {
    // a 12-chain (100…111), a 4-clique (200…203), one isolated pair
    val chain = (100L to 110L).map(i => (i, i + 1))
    val clique = for { a <- 200L to 203L; b <- (a + 1) to 203L } yield (a, b)
    val pair = Seq((300L, 301L))
    val pairs = (chain ++ clique ++ pair).toDF("doc_a", "doc_b")
    val got = DedupOps.connectedComponents(pairs, maxIters = 20, smallGraphMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((100L to 111L).forall(got(_) == 100L), "chain labels")
    assert((200L to 203L).forall(got(_) == 200L), "clique labels")
    assert(got(300L) == 300L && got(301L) == 300L, "pair labels")
  }
}
