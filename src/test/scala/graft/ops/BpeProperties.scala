package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants of the BPE merge rewrite (the step every
  * training iteration and every tokenization applies, including the
  * subtle a==b self-merge and overlapping-run cases).
  */
class BpeProperties extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var executed = 0
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { a =>
        executed += 1
        try f(a) catch {
          case e: Throwable => fail(s"failed for sample #$i: $a — ${e.getMessage}")
        }
      }
    }
    assert(executed >= n / 2, s"only $executed/$n samples generated — property is vacuous")
  }

  private val symGen = Gen.oneOf("a", "b", "c", "ab", "bc")
  private val caseGen = for {
    syms <- Gen.listOf(symGen)
    a <- symGen
    b <- symGen
  } yield (syms, a, b)

  test("mergePair preserves concatenated content") {
    forAllN(caseGen) { case (syms, a, b) =>
      assert(BpeTrain.mergePair(syms, a, b).mkString == syms.mkString)
    }
  }

  test("mergePair leaves no mergeable adjacent pair EXCEPT inside a self-merge run remainder") {
    forAllN(caseGen) { case (syms, a, b) =>
      val out = BpeTrain.mergePair(syms, a, b)
      out.sliding(2).filter(_.length == 2).zipWithIndex.foreach { case (Seq(x, y), i) =>
        // for a != b: no (a, b) may remain. For a == b the leftmost-first
        // scan consumes runs pairwise; a merged token followed by a
        // leftover single CAN look like (aa, a) but never (a, a).
        if (a != b) assert(!(x == a && y == b), s"pair left at $i in $out")
        else assert(!(x == a && y == b) || syms.isEmpty,
          s"self-pair ($a,$b) left at $i in $out from $syms")
      }
    }
  }

  test("mergePair is idempotent once the pair is gone, and a no-op when the pair never occurs") {
    forAllN(caseGen) { case (syms, a, b) =>
      val once = BpeTrain.mergePair(syms, a, b)
      // note: merging can CREATE a new (a,b) adjacency only when the
      // merged token equals a or b (e.g. a=="x", b=="xx"); the classic
      // algorithm re-applies per iteration anyway — idempotence is only
      // claimed when the output contains no (a, b) adjacency
      val hasPair = once.sliding(2).exists(p => p.length == 2 && p(0) == a && p(1) == b)
      if (!hasPair) assert(BpeTrain.mergePair(once, a, b) == once)
      if (!syms.sliding(2).exists(p => p.length == 2 && p(0) == a && p(1) == b))
        assert(once == syms)
    }
  }

  test("encodeWord then stripping markers round-trips the word") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val mergesGen = Gen.listOfN(5,
      for (a <- Gen.oneOf("a", "b", "ab"); b <- Gen.oneOf("a", "b", "c")) yield (a, b))
    forAllN(wordGen.flatMap(w => mergesGen.map(m => (w, m)))) { case (w, merges) =>
      assert(BpeTrain.encodeWord(w, merges).mkString.stripSuffix("</w>") == w)
    }
  }
}
