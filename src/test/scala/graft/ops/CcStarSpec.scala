package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Large-star/small-star connected components: label parity with the
  * union-find and min-label paths, and the O(log n)-rounds claim on the
  * adversarial chain where min-label needs O(diameter).
  */
class CcStarSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("diameter-64 chain: one giant component in O(log n) rounds, not O(diameter)") {
    val n = 64
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = labels(DedupOps.connectedComponentsStar(pairs))
    assert(got.size == n && got.values.forall(_ == 0L), "all 64 nodes labeled 0")
    val rounds = DedupOps.lastStarRounds
    info(s"star rounds for diameter-$n chain: $rounds")
    assert(rounds <= 14, s"two-phase must converge in O(log n)=~${2 * 6} rounds, took $rounds")
    assert(rounds < n - 1, s"strictly beats min-label's diameter bound ($rounds vs ${n - 1})")
  }

  test("chain + clique + pair: labels identical to the union-find path") {
    val chain = (100L to 110L).map(i => (i, i + 1))
    val clique = for { a <- 200L to 203L; b <- (a + 1) to 203L } yield (a, b)
    val pair = Seq((300L, 301L))
    val pairs = (chain ++ clique ++ pair).toDF("doc_a", "doc_b")
    val star = labels(DedupOps.connectedComponentsStar(pairs))
    val uf = labels(DedupOps.connectedComponents(pairs)) // small-graph union-find path
    assert(star == uf, "star labels == union-find labels")
  }

  test("pseudo-random graph: parity with both existing paths") {
    // deterministic scramble: node i links to a hash-derived partner
    def h(i: Long): Long = {
      val x = i * 0x9E3779B97F4A7C15L
      math.floorMod(x ^ (x >>> 32), 200L)
    }
    val pairs = (0L until 200L).map(i => (i, h(i))).filter(p => p._1 != p._2)
      .toDF("doc_a", "doc_b")
    val star = labels(DedupOps.connectedComponentsStar(pairs))
    val uf = labels(DedupOps.connectedComponents(pairs))
    val iter = labels(DedupOps.connectedComponents(pairs, maxIters = 210, smallGraphMaxEdges = 0L))
    assert(star == uf, "star == union-find")
    assert(star == iter, "star == iterative min-label")
  }
}
